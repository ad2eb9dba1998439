"""Scale-out: device meshes, sharding rules, spatially-sharded inference.

No reference analog — the reference is strictly single-process/single-GPU
(SURVEY.md §2.10). This package is the TPU-native scaling layer: data
parallelism over a ('data',) mesh axis, tensor parallelism over ('model',)
for conv channels / attention heads, and spatial sharding with halo
exchange for full-frame inference.
"""

from pixel_heal_thyself_tpu.parallel.mesh import (
    auto_data_axis,
    batch_sharding,
    make_mesh,
    make_param_shardings,
    opt_state_shardings,
    place_state,
    replicated,
)

__all__ = [
    "auto_data_axis",
    "batch_sharding",
    "make_mesh",
    "make_param_shardings",
    "opt_state_shardings",
    "place_state",
    "replicated",
]
