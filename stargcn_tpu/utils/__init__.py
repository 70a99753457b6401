"""Cross-cutting utilities: config, logging, metrics."""

from stargcn_tpu.utils.config import (
    EasyDict,
    cfg_from_file,
    default_cfg,
    merge_cfg,
    load_latest_cfg,
    save_cfg_dir,
    save_cfg_file,
)
from stargcn_tpu.utils.logging import MetricLogger, logging_config

__all__ = [
    "EasyDict",
    "default_cfg",
    "cfg_from_file",
    "merge_cfg",
    "save_cfg_file",
    "load_latest_cfg",
    "save_cfg_dir",
    "MetricLogger",
    "logging_config",
]
