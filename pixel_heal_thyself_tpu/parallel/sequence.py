"""Sequence-sharded Mamba full-frame inference (Ulysses/ring analog).

No reference analog: the reference denoises full frames offline on one GPU
(implied by `/root/reference/tools/runs_inference_analysis.py:25,34-46`) and
its Mamba scan is a single-device CUDA kernel. TPU-native: the frame's rows
— which are contiguous strips of the global raster-scan token sequence —
are sharded over a mesh axis; inside `shard_map` every subcomputation is
made exactly equal to the unsharded model:

- 2-D convolutions exchange row halos with neighbor devices over ICI
  (`ops/padding.make_row_halo_pad` injected into every ConvBlock);
- the positional encoding is sliced from the global table at the shard's
  row offset;
- the Mamba causal conv1d receives the previous shard's tail tokens;
- the SSD scan chains its [b, h, n, p] state across devices via per-shard
  affine state summaries (`ops/ssd.ssd_sharded`).

So, unlike the halo-and-crop AFGSA spatial path (`parallel/spatial.py`,
which is exact only because attention's receptive field is bounded), this
path is exact for the *unbounded* receptive field of the global scan —
golden-tested against the unsharded model in tests/test_parallel_trainer.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_seq_sharded_apply(model, params, mesh: Mesh, axis: str = "data"):
    """Build a jitted rows/sequence-sharded full-frame apply for a
    `MambaDenoiserNet`.

    `model` is the unsharded module (its hyperparameters are cloned with
    `seq_axis=axis`); `params` its variables. Returns
    `apply(noisy, aux) -> out` over [B, H, W, C*] frames with H divisible
    by the axis size. Build once per (model, mesh) and reuse across frames
    — rebuilding per call would miss the jit cache.
    """
    n = mesh.shape[axis]
    sharded_model = model.clone(seq_axis=axis)

    def per_shard(noisy_s, aux_s):
        return sharded_model.apply(params, noisy_s, aux_s)

    spec = P(None, axis, None, None)
    fn = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=spec,
        ),
    )

    def apply(noisy, aux):
        if noisy.shape[1] % n:
            raise ValueError(
                f"H={noisy.shape[1]} not divisible by mesh axis size {n}",
            )
        sharding = NamedSharding(mesh, spec)
        return fn(
            jax.device_put(noisy, sharding), jax.device_put(aux, sharding),
        )

    return apply
