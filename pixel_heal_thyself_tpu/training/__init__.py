"""Training runtime: jitted GAN step, optimizers, trainer loop, checkpoints."""
