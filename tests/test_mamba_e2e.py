"""Mamba variant end-to-end: train via CLI path, then tiled inference
(the positional encoding must adapt to tile shapes ≠ patch size)."""

import pytest

from pixel_heal_thyself_tpu.config import Config, compose
from pixel_heal_thyself_tpu.config.run_dirs import (
    register_run_dirs_resolver,
    reset_run_dirs_cache,
)

register_run_dirs_resolver()

_MODEL_OVERRIDES = [
    "model=mamba",
    "model.feature_map_channels=16",
    "model.mamba.num_layers=1",
    "model.mamba.expansion=2",
    "model.mamba.headdim=8",
    "model.mamba.d_state=8",
]


@pytest.mark.slow
def test_mamba_train_and_tiled_inference(tmp_cwd):
    from pixel_heal_thyself_tpu.inference import run_inference
    from pixel_heal_thyself_tpu.train import main

    main(
        ["-cn", "ci", *_MODEL_OVERRIDES,
         "trainer.epochs=1", "data.patches.num_patches=8",
         "data.images.synthetic_size=96", "run_num=0"],
    )
    ckpt = tmp_cwd / "outputs/runs/mamba_p32_n8_r1.0/run000/model_epoch1/state"
    assert ckpt.is_dir()

    reset_run_dirs_cache()
    cfg = Config.from_tree(
        compose(
            "ci",
            [*_MODEL_OVERRIDES, "run_num=0", f"trainer.model_path={ckpt}"],
        ),
    )
    results = run_inference(
        cfg, cfg.data.images.dir, str(tmp_cwd / "mamba_infer"),
        tile=32, margin=16, batch_tiles=4,
    )
    assert len(results) == 4
    assert all(r["psnr"] > 0 for r in results)
    assert len(list((tmp_cwd / "mamba_infer").glob("*_evaluation.txt"))) == 4
