from dssm_tpu.config.configs import (  # noqa: F401
    DataConfig,
    IOConfig,
    LossConfig,
    MeshConfig,
    PRESETS,
    RunConfig,
    TowerConfig,
    TrainConfig,
    apply_overrides,
    get_preset,
    validate,
)
