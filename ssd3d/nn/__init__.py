from ssd3d.nn.layers import BatchNorm, PointConv, SharedMLP
from ssd3d.nn.modules import (
    PointnetSAModuleMSG,
    VoteLayer,
    PointnetFPModule,
    PointnetSAModuleGlobal,
)

__all__ = [
    "BatchNorm",
    "PointConv",
    "SharedMLP",
    "PointnetSAModuleMSG",
    "VoteLayer",
    "PointnetFPModule",
    "PointnetSAModuleGlobal",
]
