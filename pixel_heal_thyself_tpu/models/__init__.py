"""Model zoo: AFGSA windowed-attention denoiser, Mamba2-SSD denoiser,
VGG-style and multi-scale patch discriminators."""

from pixel_heal_thyself_tpu.models.afgsa import AFGSA, AFGSANet, FiLM, TransformerBlock
from pixel_heal_thyself_tpu.models.discriminators import (
    DiscriminatorVGG,
    DiscriminatorVGG128,
    MultiScaleDiscriminator,
    PatchDiscriminator,
    PatchGANDiscriminator,
)

__all__ = [
    "AFGSA",
    "AFGSANet",
    "DiscriminatorVGG",
    "DiscriminatorVGG128",
    "FiLM",
    "MultiScaleDiscriminator",
    "PatchDiscriminator",
    "PatchGANDiscriminator",
    "TransformerBlock",
]
