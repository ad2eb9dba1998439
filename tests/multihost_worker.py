"""Worker process for the multi-host CPU smoke (tests/test_multihost.py).

Runs a short DP training-step sequence over a 4-way 'data' mesh and prints
the loss trajectory as JSON. Launched either as a single process owning 4
virtual CPU devices, or as 2 coordinated processes owning 2 each — the
losses must match, proving the jax.distributed bootstrap, the per-host
disjoint batch loading, and the cross-process global-array assembly.

Usage: python tests/multihost_worker.py PROC_ID NPROC LOCAL_DEVICES H5 PORT
"""

import json
import os
import sys


def main() -> None:
    proc_id, nproc, local_devices = (int(a) for a in sys.argv[1:4])
    h5_path, port = sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        os.environ["PHT_COORDINATOR"] = f"127.0.0.1:{port}"
        os.environ["PHT_NUM_PROCESSES"] = str(nproc)
        os.environ["PHT_PROCESS_ID"] = str(proc_id)

    from pixel_heal_thyself_tpu.parallel.distributed import (
        host_batch_bounds,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp

    from pixel_heal_thyself_tpu.config import LossesConfig
    from pixel_heal_thyself_tpu.data.dataset import PatchDataset, PrefetchLoader
    from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
    from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
    from pixel_heal_thyself_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        place_state,
        replicated,
    )
    from pixel_heal_thyself_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    patch, batch = 16, 4
    mesh = make_mesh(data_axis=4, model_axis=1)
    g_model = AFGSANet(base_ch=16, enc_ch=16, num_sa=1, num_gcp=0, num_heads=2)
    d_model = DiscriminatorVGG(input_size=patch, base_nf=8)
    g_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=3)
    d_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=3)
    noisy0 = jnp.zeros((batch, patch, patch, 3))
    aux0 = jnp.zeros((batch, patch, patch, 7))
    gstate = init_train_state(g_model, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
    dstate = init_train_state(d_model, d_tx, jax.random.PRNGKey(1), noisy0)
    gstate = place_state(gstate, mesh)
    dstate = place_state(dstate, mesh)
    rng = jax.device_put(jax.random.PRNGKey(7), replicated(mesh))

    bounds = host_batch_bounds(batch) if jax.process_count() > 1 else None
    loader = PrefetchLoader(
        PatchDataset(h5_path),
        batch_size=batch,
        shuffle=True,
        seed=11,
        drop_last=True,
        device=batch_sharding(mesh),
        host_bounds=bounds,
    )

    step_fn = make_train_step(g_model, d_model, LossesConfig(), False, g_tx, d_tx)
    losses = []
    with mesh:
        for b in loader:
            gstate, dstate, metrics = step_fn(gstate, dstate, b, rng)
            losses.append(
                [float(metrics["g_loss"]), float(metrics["d_loss"])],
            )
    print("RESULT " + json.dumps({"proc": proc_id, "losses": losses}))


if __name__ == "__main__":
    main()
