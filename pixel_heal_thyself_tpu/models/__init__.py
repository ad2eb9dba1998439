"""Model zoo: AFGSA windowed-attention denoiser, Mamba2-SSD denoiser,
VGG-style and multi-scale patch discriminators."""

from pixel_heal_thyself_tpu.models.afgsa import AFGSA, AFGSANet, FiLM, TransformerBlock
from pixel_heal_thyself_tpu.models.discriminators import (
    DiscriminatorVGG,
    MultiScaleDiscriminator,
    PatchDiscriminator,
)

__all__ = [
    "AFGSA",
    "AFGSANet",
    "DiscriminatorVGG",
    "FiLM",
    "MultiScaleDiscriminator",
    "PatchDiscriminator",
    "TransformerBlock",
]
