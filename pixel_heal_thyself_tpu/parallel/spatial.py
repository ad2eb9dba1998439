"""Spatially-sharded full-frame inference (context-parallel analog).

No reference analog (the reference tiles frames offline on one GPU;
SURVEY.md §5 long-context). TPU-native: the frame's rows are sharded over
the 'data' mesh axis; each device exchanges `margin` rows of halo with its
neighbors over ICI via `lax.ppermute` inside `shard_map`, applies the
denoiser to its strip + halo, and crops. The collective rides the mesh —
no host gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_apply_rows(apply_fn, mesh: Mesh, margin: int):
    """Build a jitted rows-sharded frame apply (see `sharded_apply_rows`).

    Build once and reuse across frames: constructing the shard_map (and
    its closures) per call would miss the jit cache and re-trace the full
    model for every frame.
    """
    axis = "data"
    n = mesh.shape[axis]
    if margin < 1:
        raise ValueError(
            f"margin={margin} must be >= 1: the halo exchange ships "
            "`margin` edge rows per neighbor (and x[:, -margin:] would "
            "select the whole strip at 0)",
        )

    def exchange_halo(x):
        # neighbor edge strips: up neighbor's bottom rows, down neighbor's
        # top rows. At the frame boundary the halo replicates the frame's
        # edge row — the same np.pad(mode="edge") semantics the sequential
        # tiled path uses (inference.extract_tiles), so both full-frame
        # paths agree at the borders.
        top_edge = x[:, :margin]
        bot_edge = x[:, -margin:]
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_up = jax.lax.ppermute(bot_edge, axis, fwd)  # row strip above ours
        from_down = jax.lax.ppermute(top_edge, axis, bwd)
        idx = jax.lax.axis_index(axis)
        rep_top = jnp.repeat(x[:, :1], margin, axis=1)
        rep_bot = jnp.repeat(x[:, -1:], margin, axis=1)
        from_up = jnp.where(idx == 0, rep_top, from_up)
        from_down = jnp.where(idx == n - 1, rep_bot, from_down)
        return jnp.concatenate([from_up, x, from_down], axis=1)

    def per_shard(noisy_s, aux_s):
        noisy_h = exchange_halo(noisy_s)
        aux_h = exchange_halo(aux_s)
        out = apply_fn(noisy_h, aux_h)
        return out[:, margin:-margin]

    spec = P(None, axis, None, None)
    fn = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=spec,
        ),
    )

    def apply(noisy: jnp.ndarray, aux: jnp.ndarray) -> jnp.ndarray:
        if noisy.shape[1] % n:
            raise ValueError(
                f"H={noisy.shape[1]} not divisible by mesh axis {n}",
            )
        sharding = NamedSharding(mesh, spec)
        return fn(
            jax.device_put(noisy, sharding), jax.device_put(aux, sharding),
        )

    return apply


def sharded_apply_rows(
    apply_fn,
    mesh: Mesh,
    margin: int,
    noisy: jnp.ndarray,
    aux: jnp.ndarray,
) -> jnp.ndarray:
    """Apply `apply_fn(noisy, aux) -> out` to a full frame with rows
    sharded over the 'data' axis and halo exchange between neighbors.

    noisy/aux: [B, H, W, C*]; H must divide evenly by the axis size and
    the per-device strip plus 2·margin must satisfy the model's
    divisibility constraints (margin a multiple of the attention block).
    One-shot convenience over `make_sharded_apply_rows` — loops over
    frames should build the callable once instead.
    """
    return make_sharded_apply_rows(apply_fn, mesh, margin)(noisy, aux)
