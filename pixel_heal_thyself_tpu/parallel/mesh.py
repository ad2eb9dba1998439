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
