"""The jitted alternating GAN train step (WGAN-GP / RaHinge multiscale).

Behavioral spec: reference `pht/models/base_trainer.py:369-457` — per batch:
host preprocessing (here fused on device, `ops/transforms.py`), G forward,
D update (WGAN: (fake+real)/2 + 10·GP with double-backward through D;
multiscale: relativistic-average hinge), then G update against the
*updated* D (0.005·GAN + 1.0·L1 (+ optional MS-SSIM/LPIPS)). Optimizers are
Adam(1e-4, β=(0.9,0.999), eps=1e-8) with a MultiStepLR-equivalent schedule
(reference `base_trainer.py:156-211`: decay ×0.5 entering epochs
i·lr_milestone−1+1).

TPU-first: the whole thing — both forwards, the grad-of-grad for GP, and
both optax updates — is one compiled XLA program with donated state, so
the chip never round-trips to the host inside a step.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pixel_heal_thyself_tpu.losses import (
    gan_loss,
    gradient_penalty,
    l1_loss,
    ra_hinge_gan_loss,
    ssim_loss,
)
from pixel_heal_thyself_tpu.ops.transforms import prepare_batch


class TrainState(flax.struct.PyTreeNode):
    """Functional train state for one network."""

    params: Any
    opt_state: Any
    extra_vars: dict
    step: jnp.ndarray


def multistep_milestone_epochs(epochs: int, lr_milestone: int) -> list[int]:
    """Epoch indices at which the lr halves — torch MultiStepLR parity.

    Reference `base_trainer.py:177-181` builds milestones
    [i·lr_milestone − 1 for i in 1..epochs//lr_milestone), and torch's
    scheduler makes the decayed lr active from the epoch with that index.
    """
    return [
        i * lr_milestone - 1 for i in range(1, max(1, epochs // lr_milestone))
    ]


def multistep_schedule(
    base_lr: float,
    milestone_epochs: list[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    bounds = jnp.asarray(
        [m * steps_per_epoch for m in milestone_epochs], jnp.int32,
    )

    def schedule(count):
        n = jnp.sum(count >= bounds) if len(milestone_epochs) else 0
        return base_lr * gamma**n

    return schedule


def make_optimizer(
    lr: float,
    milestone_epochs: list[int],
    gamma: float,
    steps_per_epoch: int,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    sched = multistep_schedule(lr, milestone_epochs, gamma, steps_per_epoch)
    return optax.adam(sched, b1=betas[0], b2=betas[1], eps=eps)


def init_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    *sample_inputs,
) -> TrainState:
    variables = model.init(rng, *sample_inputs)
    params = variables.pop("params") if "params" in variables else variables
    extra = dict(variables)  # e.g. {'spectral': ...} for SN discriminators
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        extra_vars=extra,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    g_model,
    d_model,
    losses_cfg,
    use_multiscale: bool,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    lpips_params=None,
) -> Callable:
    """Build the jitted alternating G/D update."""

    gan_w = float(losses_cfg.gan_loss_w)
    l1_w = float(losses_cfg.l1_loss_w)
    gp_w = float(losses_cfg.gp_loss_w)
    use_ssim = bool(losses_cfg.use_ssim_loss)
    ssim_w = float(losses_cfg.ssim_loss_w)
    use_lpips = bool(losses_cfg.use_lpips_loss) and lpips_params is not None
    lpips_w = float(losses_cfg.lpips_loss_w)

    def d_apply(params, extra, x, mutable=False):
        variables = {"params": params, **extra}
        if mutable and extra:
            return d_model.apply(variables, x, mutable=list(extra.keys()))
        return d_model.apply(variables, x), extra

    def train_step(gstate: TrainState, dstate: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, gstate.step)
        noisy, gt, aux = prepare_batch(batch["noisy"], batch["gt"], batch["aux"])

        # one generator forward serves both the D step (detached) and the
        # G step (via the saved vjp) — the reference reuses the same torch
        # graph the same way (base_trainer.py:388-415)
        output, g_vjp = jax.vjp(
            lambda p: g_model.apply({"params": p}, noisy, aux), gstate.params,
        )
        output_sg = jax.lax.stop_gradient(output)

        # ---- discriminator update -------------------------------------
        def d_loss_fn(dparams):
            extra = dstate.extra_vars
            if use_multiscale:
                pred_fake, new_extra = d_apply(dparams, extra, output_sg, mutable=True)
                pred_real, _ = d_apply(dparams, extra, gt)
                dl = ra_hinge_gan_loss(pred_real, pred_fake)
            else:
                pred_fake, _ = d_apply(dparams, extra, output_sg)
                pred_real, _ = d_apply(dparams, extra, gt)
                loss_real = gan_loss(pred_real, True, "wgan")
                loss_fake = gan_loss(pred_fake, False, "wgan")
                gp = gradient_penalty(
                    lambda x: d_apply(dparams, extra, x)[0],
                    gt,
                    output_sg,
                    rng,
                )
                dl = (loss_fake + loss_real) / 2.0 + gp_w * gp
                new_extra = extra
            return dl, new_extra

        (d_loss, new_d_extra), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True,
        )(dstate.params)
        d_updates, d_opt_state = d_tx.update(d_grads, dstate.opt_state, dstate.params)
        d_params = optax.apply_updates(dstate.params, d_updates)
        dstate = dstate.replace(
            params=d_params,
            opt_state=d_opt_state,
            extra_vars=new_d_extra,
            step=dstate.step + 1,
        )

        # ---- generator update (against the updated D) ------------------
        def g_loss_fn(out):
            if use_multiscale:
                pred_g_fake, _ = d_apply(d_params, new_d_extra, out)
                pred_d_real_ng, _ = d_apply(d_params, new_d_extra, gt)
                pred_d_real_ng = jax.lax.stop_gradient(
                    jax.tree.map(jnp.asarray, pred_d_real_ng),
                )
                # reference base_trainer.py:417-420 feeds
                # (pred_g_fake, no-grad real preds) into RaHinge
                loss_g = ra_hinge_gan_loss(pred_g_fake, pred_d_real_ng)
            else:
                pred_g_fake, _ = d_apply(d_params, new_d_extra, out)
                loss_g = gan_loss(pred_g_fake, True, "wgan")
            loss_l1 = l1_loss(out, gt)
            total = gan_w * loss_g + l1_w * loss_l1
            if use_ssim:
                total = total + ssim_w * ssim_loss(out, gt)
            if use_lpips:
                from pixel_heal_thyself_tpu.models.lpips import (
                    lpips_distance,
                    to_lpips_range,
                )

                total = total + lpips_w * jnp.mean(
                    lpips_distance(
                        lpips_params, to_lpips_range(out), to_lpips_range(gt),
                    ),
                )
            return total, (loss_g, loss_l1)

        (g_loss, (loss_g_gan, loss_g_l1)), d_out = jax.value_and_grad(
            g_loss_fn, has_aux=True,
        )(output)
        (g_grads,) = g_vjp(d_out)
        g_updates, g_opt_state = g_tx.update(g_grads, gstate.opt_state, gstate.params)
        gstate = gstate.replace(
            params=optax.apply_updates(gstate.params, g_updates),
            opt_state=g_opt_state,
            step=gstate.step + 1,
        )

        metrics = {
            "g_loss": g_loss,
            "d_loss": d_loss,
            "g_gan": loss_g_gan,
            "g_l1": loss_g_l1,
        }
        return gstate, dstate, metrics

    from pixel_heal_thyself_tpu.utils.xla_options import env_compiler_options

    return jax.jit(
        train_step,
        donate_argnums=(0, 1),
        compiler_options=env_compiler_options(),
    )


def make_eval_step(g_model) -> Callable:
    """Jitted validation forward: gt stays linear (reference :536-547)."""

    def eval_step(gparams, batch):
        noisy, gt, aux = prepare_batch(
            batch["noisy"], batch["gt"], batch["aux"], log_gt=False,
        )
        output = g_model.apply({"params": gparams}, noisy, aux)
        return output, noisy, gt

    return jax.jit(eval_step)
