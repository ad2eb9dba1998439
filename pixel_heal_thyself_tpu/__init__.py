"""pixel_heal_thyself_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of PHT.

A deep-learning denoiser framework for volumetric path-traced HDR images.
Trains a GAN: a generator (AFGSA windowed-attention denoiser, or a Mamba2
state-space denoiser) against a VGG-style or multi-scale patch discriminator
on noisy/ground-truth EXR pairs with auxiliary feature buffers
(normal, depth, albedo).

Capability parity target: goodbadwolf/pixel_heal_thyself
(see /root/reference; e.g. `pht/__init__.py`, `README.md`), re-designed
TPU-first: NHWC layouts, one jitted GAN train step, Pallas kernels for the
block-halo attention and SSD scan, jax.sharding meshes for scale-out.
"""

__version__ = "0.1.0"
