"""Mesh construction and sharding specs (jax.sharding / GSPMD).

Design: a 2-D ('data', 'model') mesh. Batches shard over 'data' (the
primary scaling axis for patch training — SURVEY.md §2.10); parameters are
replicated over 'data' and may shard output channels over 'model'
(tensor parallelism; XLA GSPMD inserts the collectives). Gradient psum
over 'data' is inserted by XLA from the sharding annotations — the
TPU-native replacement for DDP/NCCL allreduce.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_axis: int = -1,
    model_axis: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh; data_axis=-1 uses all devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis == -1:
        data_axis = max(1, n // model_axis)
    used = data_axis * model_axis
    if used > n:
        raise ValueError(
            f"mesh {data_axis}x{model_axis} needs {used} devices, have {n}",
        )
    grid = np.asarray(devices[:used]).reshape(data_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def make_param_shardings(params, mesh: Mesh):
    """Tensor-parallel parameter shardings.

    Conv kernels (HWIO) and dense kernels shard their output-channel dim
    over 'model' when divisible; everything else replicates. With
    model_axis=1 this degenerates to full replication (pure DP).
    """
    model_size = mesh.shape["model"]

    def spec_for(p):
        if model_size > 1 and p.ndim >= 2 and p.shape[-1] % model_size == 0:
            return NamedSharding(mesh, P(*([None] * (p.ndim - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def tree_replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda _: replicated(mesh), tree)


def auto_data_axis(n_devices: int, model_axis: int, batch_size: int) -> int:
    """Largest DP degree that divides the global batch and fits the mesh.

    `ParallelConfig.data_axis=-1` resolves through this: an 8-chip host with
    batch 8 trains 8-way DP out of the box; a batch-2 CI run on the same
    host degrades to 2-way instead of failing the divisibility check.
    """
    cap = max(1, n_devices // max(1, model_axis))
    best = 1
    for cand in range(1, cap + 1):
        if batch_size % cand == 0:
            best = cand
    return best


def opt_state_shardings(opt_state, params, mesh: Mesh):
    """Sharding specs for an optax state: moment tensors shard like their
    parameters (same shapes → same output-channel rule); step counters and
    other non-array leaves replicate."""
    del params  # moments mirror param shapes; the per-leaf rule suffices

    def spec_for(x):
        if hasattr(x, "ndim"):
            return make_param_shardings({"p": x}, mesh)["p"]
        return replicated(mesh)

    return jax.tree.map(spec_for, opt_state)


def place_state(state, mesh: Mesh, shard_params: bool = True):
    """device_put a TrainState onto the mesh: params per
    `make_param_shardings` (TP channel sharding when model_axis>1),
    optimizer moments to match, everything else replicated."""
    if shard_params:
        pshard = make_param_shardings(state.params, mesh)
    else:
        pshard = tree_replicated(state.params, mesh)
    return state.replace(
        params=jax.device_put(state.params, pshard),
        opt_state=jax.device_put(
            state.opt_state, opt_state_shardings(state.opt_state, state.params, mesh),
        ),
        extra_vars=jax.device_put(
            state.extra_vars, tree_replicated(state.extra_vars, mesh),
        ),
        step=jax.device_put(state.step, replicated(mesh)),
    )
