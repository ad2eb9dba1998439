"""End-to-end CI smoke: `-cn ci` trains on synthetic data and emits the
reference-format artifacts; checkpoints resume (SURVEY.md §4 test plan)."""

import re

import numpy as np
import pytest

from pixel_heal_thyself_tpu.config import Config, compose
from pixel_heal_thyself_tpu.config.run_dirs import register_run_dirs_resolver
from pixel_heal_thyself_tpu.metrics import (
    calculate_psnr,
    calculate_rmse,
    calculate_ssim,
)
from pixel_heal_thyself_tpu.utils.images import tensor2img

register_run_dirs_resolver()


class TestMetricsQuirks:
    def test_psnr_zero_mse_returns_zero(self):
        a = np.full((8, 8, 3), 128, np.uint8)
        assert calculate_psnr(a, a) == 0.0  # reference quirk (metric.py:21)

    def test_psnr_batch_sums(self):
        a = np.zeros((2, 8, 8, 3)); b = np.full((2, 8, 8, 3), 10.0)
        single = calculate_psnr(a[0], b[0])
        assert np.isclose(calculate_psnr(a, b), 2 * single)

    def test_ssim_identical(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 255, (32, 32, 3))
        assert calculate_ssim(a, a) == pytest.approx(1.0)

    def test_rmse_is_relative_mse(self):
        a = np.full((4, 4, 3), 2.0); b = np.full((4, 4, 3), 1.0)
        assert calculate_rmse(a, b) == pytest.approx(0.5 * 1.0 / 1.01)

    def test_tensor2img_negative_safe(self):
        img = tensor2img(np.array([[[-0.5, 0.0, 1.0]]]), post_spec=False)
        assert img.dtype == np.uint8
        assert img[0, 0, 0] == 0  # negatives clamp, no NaN cast


def test_val_batch_size_invariance(tmp_path, monkeypatch):
    """Batched validation (trainer.val_batch_size) yields byte-identical
    evaluation.txt lines and the same panel set as the reference's batch-1
    loop — the metrics batch-sum and panels key on global sample index."""
    import os

    from pixel_heal_thyself_tpu.training import trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod.checkpoints, "save_checkpoint", lambda *a, **k: None,
    )
    rng = np.random.default_rng(3)
    n, h = 7, 16
    noisy = rng.random((n, h, h, 3)).astype(np.float32) * 2.0
    gt = rng.random((n, h, h, 3)).astype(np.float32) * 2.0

    def loader(bs):
        for i in range(0, n, bs):
            yield {"noisy": noisy[i : i + bs], "gt": gt[i : i + bs]}

    def eval_fn(params, batch):
        return batch["noisy"] * 0.9, batch["noisy"], batch["gt"]

    t = trainer_mod.BaseTrainer.__new__(trainer_mod.BaseTrainer)
    t.is_main = True
    gstate = type("S", (), {"params": None})()
    results = {}
    for bs in (1, 3):
        root = tmp_path / f"bs{bs}"
        root.mkdir()
        t._validate_and_save(
            0, gstate, None, eval_fn, loader(bs), n, str(root), 3,
        )
        results[bs] = (
            (root / "evaluation.txt").read_text(),
            sorted(os.listdir(root / "model_epoch1")),
        )
    assert results[1] == results[3]
    assert results[1][1] == ["0.png", "3.png", "6.png"]


@pytest.mark.slow
def test_ci_train_end_to_end(tmp_cwd):
    """The minimum end-to-end slice (SURVEY.md §7 stage 5)."""
    from pixel_heal_thyself_tpu.training.trainer import AFGSATrainer

    overrides = [
        "trainer.epochs=1",
        "data.patches.num_patches=16",
        "data.images.synthetic_size=96",
        "model.feature_map_channels=32",
        "model.afgsa.self_attention.num_layers=1",
        "run_num=0",
    ]
    cfg = Config.from_tree(compose("ci", overrides))
    trainer = AFGSATrainer(cfg)
    trainer.train()

    out = tmp_cwd / "outputs/runs/afgsa_p32_n16_r1.0/run000"
    train_loss = (out / "train_loss.txt").read_text()
    assert re.match(r"Epoch: 1 \tG loss: [-\d.]+ \tD Loss: [-\d.]+\n", train_loss)
    evaluation = (out / "evaluation.txt").read_text()
    m = re.match(
        r"Validation: 1 \tAvg MRSE: ([\d.]+) \tAvg PSNR: ([\d.]+) \tAvg 1-SSIM: ([-\d.]+)\n",
        evaluation,
    )
    assert m, evaluation
    assert (out / "model_epoch1" / "0.png").exists()
    assert (out / "model_epoch1" / "state").is_dir()

    # resume from the checkpoint (the reference's resume was broken);
    # the resume leg drives the Grain feed, so it needs grain installed
    from pixel_heal_thyself_tpu.config.run_dirs import reset_run_dirs_cache
    from pixel_heal_thyself_tpu.data.grain_loader import HAVE_GRAIN

    if not HAVE_GRAIN:  # pragma: no cover - grain is in the dev images
        pytest.skip("grain not installed; resume leg uses data.loader=grain")

    reset_run_dirs_cache()
    cfg2 = Config.from_tree(
        compose(
            "ci",
            overrides[:-1]
            + [
                "run_num=1",
                "trainer.epochs=2",
                "trainer.load_model=true",
                f"trainer.model_path={out / 'model_epoch1' / 'state'}",
                "data.loader=grain",  # resume leg drives the Grain feed
            ],
        ),
    )
    trainer2 = AFGSATrainer(cfg2)
    trainer2.train()  # starts at epoch 1 (second epoch) without error
    out2 = tmp_cwd / "outputs/runs/afgsa_p32_n16_r1.0/run001"
    assert "Epoch: 2" in (out2 / "train_loss.txt").read_text()
