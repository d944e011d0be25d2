from ssd3d.config.config import (
    Config,
    get_default_cfg,
    load_cfg,
    merge_cfg_from_file,
    merge_cfg_from_list,
)

__all__ = [
    "Config",
    "get_default_cfg",
    "load_cfg",
    "merge_cfg_from_file",
    "merge_cfg_from_list",
]
