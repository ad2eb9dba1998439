"""Worker process for the pod-slice trainer smoke (tests/test_multihost.py).

Unlike multihost_worker.py (a hand-rolled step loop), this runs the REAL
`AFGSATrainer.train()` — so one launch exercises together: the
jax.distributed bootstrap, the main-process-only dataset build plus the
build barrier, `host_batch_bounds` disjoint per-host loading, mesh
placement, the sharded train step, and process-0-only checkpoint/
train_loss.txt/evaluation.txt writes (VERDICT r3 #6 — the 2-process ×
4-device topology the DP design claims to serve).

Usage: python tests/multihost_trainer_worker.py PROC_ID NPROC LOCAL_DEVICES WORKDIR PORT
"""

import json
import os
import sys


def main() -> None:
    proc_id, nproc, local_devices = (int(a) for a in sys.argv[1:4])
    workdir, port = sys.argv[4], sys.argv[5]

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

    # both processes share one cwd: the run dir, the synthetic images dir,
    # and the patch stores are the same files — exactly the pod-slice
    # shared-filesystem layout the trainer's is_main gating serves
    os.chdir(workdir)

    from pixel_heal_thyself_tpu.config import Config, compose
    from pixel_heal_thyself_tpu.config.run_dirs import register_run_dirs_resolver
    from pixel_heal_thyself_tpu.training.trainer import AFGSATrainer

    register_run_dirs_resolver()
    cfg = Config.from_tree(
        compose(
            "ci",
            [
                "trainer.epochs=1",
                "trainer.batch_size=8",
                "data.patches.num_patches=16",
                "data.images.synthetic_size=96",
                "model.feature_map_channels=32",
                "+model.enc_channels=32",
                "model.afgsa.self_attention.num_layers=1",
                "model.num_gradient_checkpoints=0",
                "run_num=0",
            ],
        ),
    )
    trainer = AFGSATrainer(cfg)
    assert jax.device_count() == 8, jax.device_count()
    assert trainer.mesh.shape["data"] * trainer.mesh.shape["model"] == 8
    trainer.train()
    print(
        "RESULT "
        + json.dumps(
            {
                "proc": proc_id,
                "is_main": trainer.is_main,
                "output_dir": cfg.paths.output_dir,
            },
        ),
    )


if __name__ == "__main__":
    main()
