"""Orbax checkpointing: params + optimizer state + step, with working resume.

The reference saved only `state_dict()`s of G and D per epoch
(`pht/models/base_trainer.py:487-533`) and its resume path referenced a
missing config field (`base_trainer.py:341-347`, SURVEY.md §5) — never
saving optimizer/scheduler state. Here the full train state round-trips:
generator and discriminator params, both Adam states, spectral-norm
vectors, step counters, and the epoch.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from pixel_heal_thyself_tpu.training.train_step import TrainState


def _writer() -> ocp.Checkpointer:
    """A PyTreeCheckpointer whose coordination involves ONLY the calling
    process. The trainer gates every run-dir write on `is_main`
    (trainer.py:_validate_and_save) — but Orbax's default save path ends
    in a `sync_global_processes` barrier over ALL processes, so a
    process-0-only save deadlocks the pod slice (process 1 finishes
    validation, exits, and the shutdown barrier kills everyone).
    `active_processes={index}` scopes those barriers to the caller; the
    on-disk OCDBT format is identical to PyTreeCheckpointer's."""
    idx = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(use_ocdbt=True, use_zarr3=False),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=idx, active_processes={idx},
        ),
    )


def _to_pytree(gstate: TrainState, dstate: TrainState, epoch: int) -> dict:
    return {
        "g": {
            "params": gstate.params,
            "opt_state": gstate.opt_state,
            "extra_vars": gstate.extra_vars,
            "step": gstate.step,
        },
        "d": {
            "params": dstate.params,
            "opt_state": dstate.opt_state,
            "extra_vars": dstate.extra_vars,
            "step": dstate.step,
        },
        "epoch": np.asarray(epoch, np.int32),
    }


def save_checkpoint(path: str | Path, gstate: TrainState, dstate: TrainState, epoch: int) -> None:
    path = Path(path).resolve()
    with _writer() as ckptr:
        ckptr.save(
            path,
            jax.tree.map(np.asarray, _to_pytree(gstate, dstate, epoch)),
            force=True,
        )


def restore_checkpoint(
    path: str | Path,
    gstate: TrainState,
    dstate: TrainState,
) -> tuple[TrainState, TrainState, int]:
    """Restore into the shapes/dtypes of freshly-initialized states."""
    path = Path(path).resolve()
    template = jax.tree.map(np.asarray, _to_pytree(gstate, dstate, 0))
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    g = restored["g"]
    d = restored["d"]
    gstate = gstate.replace(
        params=g["params"],
        opt_state=g["opt_state"],
        extra_vars=g["extra_vars"],
        step=np.asarray(g["step"]),
    )
    dstate = dstate.replace(
        params=d["params"],
        opt_state=d["opt_state"],
        extra_vars=d["extra_vars"],
        step=np.asarray(d["step"]),
    )
    return gstate, dstate, int(restored["epoch"])


def save_params(path: str | Path, params: Any) -> None:
    """Params-only export (deploy/inference artifact)."""
    with _writer() as ckptr:
        ckptr.save(Path(path).resolve(), jax.tree.map(np.asarray, params), force=True)


def restore_params(path: str | Path, template: Any = None) -> Any:
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve(), item=template)
