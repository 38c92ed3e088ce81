from fall_multimodal_tpu.configs.config import (
    Config,
    DataConfig,
    GraphConfig,
    ModelConfig,
    OptimConfig,
    SchedulerConfig,
    TrainConfig,
    load_config,
    preset_path,
)

__all__ = [
    "Config",
    "DataConfig",
    "GraphConfig",
    "ModelConfig",
    "OptimConfig",
    "SchedulerConfig",
    "TrainConfig",
    "load_config",
    "preset_path",
]
