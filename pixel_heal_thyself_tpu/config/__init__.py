"""Typed configuration system.

Preserves the reference's config surface (`-cn ci/dev/stag/prod`, dotted CLI
overrides, a YAML tree with defaults-lists and `${...}` interpolation — see
reference `config/default.yaml`, `pht/config/base.py`) without depending on
Hydra/OmegaConf, which this image does not ship.
"""

from pixel_heal_thyself_tpu.config.loader import compose, register_resolver
from pixel_heal_thyself_tpu.config.schema import (
    AFGSAModelConfig,
    BaseModelConfig,
    Config,
    ConfigRegistry,
    DataConfig,
    DiscriminatorConfig,
    ImagesConfig,
    LoggingConfig,
    LossesConfig,
    MambaModelConfig,
    ParallelConfig,
    PatchesConfig,
    PathConfig,
    SelfAttentionConfig,
    TrainerConfig,
)

__all__ = [
    "AFGSAModelConfig",
    "BaseModelConfig",
    "Config",
    "ConfigRegistry",
    "DataConfig",
    "DiscriminatorConfig",
    "ImagesConfig",
    "LoggingConfig",
    "LossesConfig",
    "MambaModelConfig",
    "ParallelConfig",
    "PatchesConfig",
    "PathConfig",
    "SelfAttentionConfig",
    "TrainerConfig",
    "compose",
    "register_resolver",
]
