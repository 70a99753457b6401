"""Training loop, losses, schedules, checkpointing."""

from stargcn_tpu.train.loop import Trainer, build_model_config

__all__ = ["Trainer", "build_model_config"]
