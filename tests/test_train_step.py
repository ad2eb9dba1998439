"""GAN train step tests: one compiled step updates both nets, loss drops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_heal_thyself_tpu.config import LossesConfig
from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
from pixel_heal_thyself_tpu.models.discriminators import (
    DiscriminatorVGG,
    MultiScaleDiscriminator,
)
from pixel_heal_thyself_tpu.training.train_step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    multistep_milestone_epochs,
    multistep_schedule,
)


def _tiny_setup(use_multiscale=False, patch=16):
    g_model = AFGSANet(base_ch=16, enc_ch=16, num_sa=1, num_gcp=0, num_heads=2)
    if use_multiscale:
        d_model = MultiScaleDiscriminator(patch_size=patch)
    else:
        d_model = DiscriminatorVGG(input_size=patch, base_nf=8)
    rng = jax.random.PRNGKey(0)
    noisy = jnp.zeros((2, patch, patch, 3))
    aux = jnp.zeros((2, patch, patch, 7))
    g_tx = make_optimizer(1e-3, [2], 0.5, steps_per_epoch=10)
    d_tx = make_optimizer(1e-3, [2], 0.5, steps_per_epoch=10)
    gstate = init_train_state(g_model, g_tx, rng, noisy, aux)
    dstate = init_train_state(d_model, d_tx, jax.random.PRNGKey(1), noisy)
    return g_model, d_model, gstate, dstate, g_tx, d_tx


def _batch(patch=16, seed=0):
    rng = np.random.default_rng(seed)
    gt_lin = rng.uniform(0.0, 2.0, (2, patch, patch, 3)).astype(np.float32)
    noisy_lin = np.clip(gt_lin + rng.normal(scale=0.3, size=gt_lin.shape), 0, None).astype(np.float32)
    aux = rng.uniform(-1, 1, (2, patch, patch, 7)).astype(np.float32)
    return {"noisy": jnp.asarray(noisy_lin), "gt": jnp.asarray(gt_lin), "aux": jnp.asarray(aux)}


class TestMultiStepSchedule:
    def test_milestones_match_torch_semantics(self):
        # epochs=12, lr_milestone=3 → decay active from epochs 2, 5, 8
        assert multistep_milestone_epochs(12, 3) == [2, 5, 8]

    def test_schedule_values(self):
        sched = multistep_schedule(1e-4, [2, 5, 8], 0.5, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1e-4)
        assert float(sched(19)) == pytest.approx(1e-4)
        assert float(sched(20)) == pytest.approx(5e-5)   # epoch 2 starts
        assert float(sched(49)) == pytest.approx(5e-5)
        assert float(sched(50)) == pytest.approx(2.5e-5)  # epoch 5
        assert float(sched(80)) == pytest.approx(1.25e-5)  # epoch 8

    def test_no_milestones(self):
        sched = multistep_schedule(1e-4, [], 0.5, 10)
        assert float(sched(1000)) == pytest.approx(1e-4)


class TestTrainStepWGAN:
    def test_single_step_updates_both(self):
        g_model, d_model, gstate, dstate, g_tx, d_tx = _tiny_setup()
        step = make_train_step(g_model, d_model, LossesConfig(), False, g_tx, d_tx)
        g0 = jax.tree.map(np.asarray, gstate.params)
        d0 = jax.tree.map(np.asarray, dstate.params)
        gstate, dstate, metrics = step(gstate, dstate, _batch(), jax.random.PRNGKey(42))
        assert np.isfinite(float(metrics["g_loss"]))
        assert np.isfinite(float(metrics["d_loss"]))
        g_changed = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(jax.tree.map(np.asarray, gstate.params)))
        )
        d_changed = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(jax.tree.map(np.asarray, dstate.params)))
        )
        assert g_changed and d_changed
        assert int(gstate.step) == 1 and int(dstate.step) == 1

    def test_l1_decreases_over_steps(self):
        g_model, d_model, gstate, dstate, g_tx, d_tx = _tiny_setup()
        step = make_train_step(g_model, d_model, LossesConfig(), False, g_tx, d_tx)
        batch = _batch()
        first = None
        for i in range(8):
            gstate, dstate, metrics = step(gstate, dstate, batch, jax.random.PRNGKey(0))
            if first is None:
                first = float(metrics["g_l1"])
        assert float(metrics["g_l1"]) < first

    def test_deterministic_given_same_rng(self):
        g_model, d_model, g1, d1, g_tx, d_tx = _tiny_setup()
        _, _, g2, d2, _, _ = _tiny_setup()
        step = make_train_step(g_model, d_model, LossesConfig(), False, g_tx, d_tx)
        b = _batch()
        g1, d1, m1 = step(g1, d1, b, jax.random.PRNGKey(5))
        g2, d2, m2 = step(g2, d2, b, jax.random.PRNGKey(5))
        assert float(m1["g_loss"]) == float(m2["g_loss"])
        assert float(m1["d_loss"]) == float(m2["d_loss"])


class TestTrainStepMultiscale:
    def test_multiscale_step_runs_and_updates_spectral(self):
        g_model, d_model, gstate, dstate, g_tx, d_tx = _tiny_setup(use_multiscale=True)
        assert "spectral" in dstate.extra_vars
        u_before = jax.tree.map(np.asarray, dstate.extra_vars["spectral"])
        step = make_train_step(g_model, d_model, LossesConfig(), True, g_tx, d_tx)
        gstate, dstate, metrics = step(gstate, dstate, _batch(), jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["d_loss"]))
        u_after = jax.tree.map(np.asarray, dstate.extra_vars["spectral"])
        changed = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(u_before), jax.tree.leaves(u_after))
        )
        assert changed


def test_ssim_loss_path_compiles():
    g_model, d_model, gstate, dstate, g_tx, d_tx = _tiny_setup(patch=32)
    # rebuild tiny models at 32 (vgg depth depends on input size)
    cfg = LossesConfig(use_ssim_loss=True)
    step = make_train_step(g_model, d_model, cfg, False, g_tx, d_tx)
    gstate, dstate, metrics = step(gstate, dstate, _batch(patch=32), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["g_loss"]))


def test_eval_step_keeps_gt_linear():
    g_model, d_model, gstate, dstate, *_ = _tiny_setup()
    ev = make_eval_step(g_model)
    b = _batch()
    out, noisy, gt = ev(gstate.params, b)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(b["gt"]))  # untouched
    np.testing.assert_allclose(np.asarray(noisy), np.log1p(np.asarray(b["noisy"])), rtol=1e-6)
    assert out.shape == b["gt"].shape
