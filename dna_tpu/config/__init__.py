from dna_tpu.config.core import (
    DataConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    SchedulerConfig,
    TaskConfig,
    TrainConfig,
    apply_overrides,
    pretty,
    to_dict,
)

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "MeshConfig",
    "ModelConfig",
    "OptimizerConfig",
    "SchedulerConfig",
    "TaskConfig",
    "TrainConfig",
    "apply_overrides",
    "pretty",
    "to_dict",
]
