from ssd3d.models.backbone import PointBackbone
from ssd3d.models.heads import DetectionHead, IoUHead
from ssd3d.models.single_stage import SingleStageDetector, build_detector

__all__ = [
    "PointBackbone",
    "DetectionHead",
    "IoUHead",
    "SingleStageDetector",
    "build_detector",
]
