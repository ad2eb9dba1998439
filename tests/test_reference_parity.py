"""END-TO-END numerical parity vs the torch reference semantics.

Everything before this test pinned *modules* (attention, ConvBlock, BN, GP,
schedule) against torch oracles. This test pins the *composition*: a tiny
but architecturally faithful AFGSA GAN (multi-scale encoders, block-halo
attention with rel-pos embeddings, DiscriminatorVGG with BatchNorm,
WGAN-GP with double backward, both Adam optimizers with the MultiStepLR
schedule, the reference's exact batch preprocessing) is trained for
several steps in BOTH frameworks from identical weights, batches, and GP
interpolation draws, and the loss trajectories + final parameters are
compared.

Torch side: an independent reimplementation of the reference training
semantics (`/root/reference/pht/models/base_trainer.py:369-457`,
`losses.py:12-57,103-172`, `afgsa/model.py:401-733`), NCHW like the
reference. JAX side: the production `make_train_step` + `AFGSANet` +
`DiscriminatorVGG`, fp32, HIGHEST matmul precision (CPU default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from pixel_heal_thyself_tpu.config import LossesConfig
from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
from pixel_heal_thyself_tpu.training.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
    multistep_milestone_epochs,
)

try:  # pytest prepend import mode puts tests/ on sys.path
    from test_attention import torch_oracle
except ImportError:  # pragma: no cover - direct execution
    import importlib.util
    import pathlib

    _spec = importlib.util.spec_from_file_location(
        "test_attention", pathlib.Path(__file__).parent / "test_attention.py",
    )
    _mod = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    torch_oracle = _mod.torch_oracle

# tiny-but-faithful geometry
PATCH = 16
BATCH = 2
CH = 16          # base_ch == enc_ch
HEADS = 2
BLOCK = 8
HALO = 3
WINDOW = BLOCK + 2 * HALO
NUM_SA = 2
D_NF = 8
LR = 1e-4
GAMMA = 0.5
EPOCHS = 4
LR_MILESTONE = 2
STEPS_PER_EPOCH = 2
N_STEPS = 6
PAD_MODE = "replicate"  # deterministic-mode default (base_trainer.py:334)

_t = torch.from_numpy
_RASTER = np.arange(BLOCK * BLOCK)


def _np(a):
    return np.asarray(a, np.float32)


# ---------------------------------------------------------------------------
# torch mirror modules (NCHW, reference layer semantics)


class TConvBlock(nn.Module):
    def __init__(self, cin, cout, k, pad=0, pad_mode="zeros", act="relu",
                 stride=1, bn=False):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=pad,
                              padding_mode=pad_mode if pad else "zeros")
        self.bn = nn.BatchNorm2d(cout) if bn else None
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        if self.act == "relu":
            x = F.relu(x)
        elif self.act == "leakyrelu":
            x = F.leaky_relu(x, 0.2)
        return x

    def copy_from_flax(self, p):
        with torch.no_grad():
            self.conv.weight.copy_(_t(_np(p["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)))
            self.conv.bias.copy_(_t(_np(p["Conv_0"]["bias"])))
            if self.bn is not None:
                self.bn.weight.copy_(_t(_np(p["BatchNorm2d_0"]["scale"])))
                self.bn.bias.copy_(_t(_np(p["BatchNorm2d_0"]["bias"])))


class TAFGSA(nn.Module):
    def __init__(self, ch):
        super().__init__()
        head_ch = ch // HEADS
        self.fuse = TConvBlock(2 * ch, ch, 1, act="relu")
        self.q_conv = nn.Conv2d(ch, ch, 1, bias=False)
        self.k_conv = nn.Conv2d(ch, ch, 1, bias=False)
        self.v_conv = nn.Conv2d(ch, ch, 1, bias=False)
        self.rel_h = nn.Parameter(torch.zeros(WINDOW, head_ch // 2))
        self.rel_w = nn.Parameter(torch.zeros(WINDOW, head_ch // 2))

    def forward(self, noisy, aux):
        naux = self.fuse(torch.cat([noisy, aux], dim=1))
        q = self.q_conv(naux)
        k = self.k_conv(naux)
        v = self.v_conv(noisy)
        return torch_oracle(
            q, k, v, self.rel_h, self.rel_w, BLOCK, HALO, HEADS, _RASTER,
        )

    def copy_from_flax(self, p):
        self.fuse.copy_from_flax(p["ConvBlock_0"])
        with torch.no_grad():
            for name in ("q_conv", "k_conv", "v_conv"):
                getattr(self, name).weight.copy_(
                    _t(_np(p[name]["kernel"]).transpose(3, 2, 0, 1)),
                )
            self.rel_h.copy_(_t(_np(p["rel_h"])))
            self.rel_w.copy_(_t(_np(p["rel_w"])))


class TTransformerBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.attention = TAFGSA(ch)
        self.ff1 = TConvBlock(ch, ch, 3, pad=1, pad_mode=PAD_MODE, act="relu")
        self.ff2 = TConvBlock(ch, ch, 3, pad=1, pad_mode=PAD_MODE, act="relu")

    def forward(self, noisy, aux):
        noisy = noisy + self.attention(noisy, aux)
        ff = self.ff2(self.ff1(noisy))
        return noisy + ff, aux

    def copy_from_flax(self, p):
        self.attention.copy_from_flax(p["attention"])
        self.ff1.copy_from_flax(p["ConvBlock_0"])
        self.ff2.copy_from_flax(p["ConvBlock_1"])


class TAFGSANet(nn.Module):
    def __init__(self):
        super().__init__()
        ch = CH
        self.n1 = TConvBlock(3, ch, 1, act="relu")
        self.n3 = TConvBlock(3, ch, 3, 1, PAD_MODE, "relu")
        self.n5 = TConvBlock(3, ch, 5, 2, PAD_MODE, "relu")
        self.nmap = TConvBlock(3 * ch, ch, 1, act="relu")
        self.a1 = TConvBlock(7, ch, 1, act="leakyrelu")
        self.a3 = TConvBlock(7, ch, 3, 1, PAD_MODE, "leakyrelu")
        self.a5 = TConvBlock(7, ch, 5, 2, PAD_MODE, "leakyrelu")
        self.aenc1 = TConvBlock(3 * ch, ch, 1, act="leakyrelu")
        self.aenc2 = TConvBlock(ch, ch, 1, act="leakyrelu")
        self.blocks = nn.ModuleList([TTransformerBlock(ch) for _ in range(NUM_SA)])
        self.dec1 = TConvBlock(ch, ch, 3, 1, PAD_MODE, "relu")
        self.dec2 = TConvBlock(ch, ch, 3, 1, PAD_MODE, "relu")
        self.dec3 = TConvBlock(ch, 3, 3, 1, "zeros", None)

    def forward(self, x, aux):
        out = self.nmap(torch.cat([self.n1(x), self.n3(x), self.n5(x)], dim=1))
        a = self.aenc2(
            self.aenc1(torch.cat([self.a1(aux), self.a3(aux), self.a5(aux)], dim=1)),
        )
        for blk in self.blocks:
            out, a = blk(out, a)
        out = self.dec3(self.dec2(self.dec1(out)))
        return out + x

    def copy_from_flax(self, params):
        order = ["n1", "n3", "n5", "nmap", "a1", "a3", "a5", "aenc1", "aenc2"]
        for i, name in enumerate(order):
            getattr(self, name).copy_from_flax(params[f"ConvBlock_{i}"])
        for j, blk in enumerate(self.blocks):
            blk.copy_from_flax(params[f"TransformerBlock_{j}"])
        for j, name in enumerate(["dec1", "dec2", "dec3"]):
            getattr(self, name).copy_from_flax(params[f"ConvBlock_{9 + j}"])


class TDiscVGG(nn.Module):
    def __init__(self):
        super().__init__()
        stages = int(np.log2(PATCH / 4))
        layers = [TConvBlock(3, D_NF, 3, 1, "zeros", "leakyrelu")]
        nf = D_NF
        for i in range(stages):
            nxt = min(D_NF * (2 ** (i + 1)), D_NF * 8)
            layers.append(TConvBlock(nf, nxt, 3, 1, "zeros", "leakyrelu", bn=True))
            layers.append(
                TConvBlock(nxt, nxt, 4, 1, "zeros", "leakyrelu", stride=2, bn=True),
            )
            nf = nxt
        self.features = nn.ModuleList(layers)
        self.final_ch = nf
        self.final_sp = PATCH // (2 ** stages)
        flat = nf * self.final_sp ** 2
        self.fc1 = nn.Linear(flat, 100)
        self.fc2 = nn.Linear(100, 1)

    def forward(self, x):
        for layer in self.features:
            x = layer(x)
        # flatten in the flax (NHWC) order so the copied fc weights match
        x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        x = F.leaky_relu(self.fc1(x), 0.2)
        return self.fc2(x)

    def copy_from_flax(self, params):
        for i, layer in enumerate(self.features):
            layer.copy_from_flax(params[f"ConvBlock_{i}"])
        with torch.no_grad():
            self.fc1.weight.copy_(_t(_np(params["Dense_0"]["kernel"]).T))
            self.fc1.bias.copy_(_t(_np(params["Dense_0"]["bias"])))
            self.fc2.weight.copy_(_t(_np(params["Dense_1"]["kernel"]).T))
            self.fc2.bias.copy_(_t(_np(params["Dense_1"]["bias"])))


# ---------------------------------------------------------------------------


def _gp_torch(d_model, real, fake, alpha):
    """Reference GradientPenaltyLoss.forward (losses.py:27-57) with an
    injected interpolation draw."""
    interp = (alpha * fake.detach() + (1 - alpha) * real).requires_grad_(True)
    pred = d_model(interp)
    grad = torch.autograd.grad(
        outputs=pred, inputs=interp,
        grad_outputs=torch.ones_like(pred),
        create_graph=True, retain_graph=True, only_inputs=True,
    )[0]
    grad = grad.reshape(grad.shape[0], -1)
    return ((grad.norm(2, dim=1) - 1) ** 2).mean()


def _make_batches(rng_np, n):
    out = []
    for _ in range(n):
        out.append(
            {
                "noisy": np.abs(
                    rng_np.standard_normal((BATCH, PATCH, PATCH, 3)),
                ).astype(np.float32),
                "gt": np.abs(
                    rng_np.standard_normal((BATCH, PATCH, PATCH, 3)),
                ).astype(np.float32),
                "aux": rng_np.uniform(-1, 1, (BATCH, PATCH, PATCH, 7)).astype(
                    np.float32,
                ),
            },
        )
    return out


def _prep_torch(batch):
    """Reference per-batch host preprocessing (base_trainer.py:373-383)."""
    aux = batch["aux"].copy()
    aux[..., :3] = np.clip((aux[..., :3] + 1.0) * 0.5, 0.0, 1.0)
    noisy = np.log1p(batch["noisy"])
    gt = np.log1p(batch["gt"])
    perm = (0, 3, 1, 2)
    return (
        _t(noisy.transpose(perm)),
        _t(gt.transpose(perm)),
        _t(aux.transpose(perm)),
    )


def test_full_train_step_trajectory_matches_torch_reference():
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        losses_cfg = LossesConfig()
        assert losses_cfg.gan_loss_w == 0.005 and losses_cfg.gp_loss_w == 10.0

        g_model = AFGSANet(
            base_ch=CH, enc_ch=CH, num_sa=NUM_SA, num_gcp=0,
            num_heads=HEADS, block_size=BLOCK, halo_size=HALO,
            padding_mode=PAD_MODE,
        )
        d_model = DiscriminatorVGG(input_size=PATCH, base_nf=D_NF)

        milestones = multistep_milestone_epochs(EPOCHS, LR_MILESTONE)
        g_tx = make_optimizer(LR, milestones, GAMMA, STEPS_PER_EPOCH)
        d_tx = make_optimizer(LR, milestones, GAMMA, STEPS_PER_EPOCH)

        noisy0 = jnp.zeros((BATCH, PATCH, PATCH, 3))
        aux0 = jnp.zeros((BATCH, PATCH, PATCH, 7))
        gstate = init_train_state(g_model, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
        dstate = init_train_state(d_model, d_tx, jax.random.PRNGKey(1), noisy0)
        step_fn = make_train_step(g_model, d_model, losses_cfg, False, g_tx, d_tx)

        # ---- torch twins initialized from the SAME weights ----
        torch.manual_seed(0)
        tg = TAFGSANet()
        tg.copy_from_flax(gstate.params)
        td = TDiscVGG()
        td.copy_from_flax(dstate.params)

        # same-weights forward parity before any training
        batches = _make_batches(np.random.default_rng(11), N_STEPS)
        tn, tgt, tax = _prep_torch(batches[0])
        with torch.no_grad():
            t_out0 = tg(tn, tax).permute(0, 2, 3, 1).numpy()
        from pixel_heal_thyself_tpu.ops.transforms import prepare_batch

        jn, jgt, jax_aux = prepare_batch(
            jnp.asarray(batches[0]["noisy"]),
            jnp.asarray(batches[0]["gt"]),
            jnp.asarray(batches[0]["aux"]),
        )
        j_out0 = np.asarray(g_model.apply({"params": gstate.params}, jn, jax_aux))
        np.testing.assert_allclose(j_out0, t_out0, atol=5e-5, rtol=1e-4)

        opt_g = torch.optim.Adam(tg.parameters(), lr=LR, betas=(0.9, 0.999), eps=1e-8)
        opt_d = torch.optim.Adam(td.parameters(), lr=LR, betas=(0.9, 0.999), eps=1e-8)
        sched_g = torch.optim.lr_scheduler.MultiStepLR(opt_g, milestones, GAMMA)
        sched_d = torch.optim.lr_scheduler.MultiStepLR(opt_d, milestones, GAMMA)

        base_rng = jax.random.PRNGKey(7)
        jax_metrics, torch_metrics = [], []
        for step_i in range(N_STEPS):
            batch = batches[step_i]

            # -- JAX step
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            gstate, dstate, metrics = step_fn(gstate, dstate, jb, base_rng)
            jax_metrics.append(
                {k: float(metrics[k]) for k in ("g_loss", "d_loss", "g_l1", "g_gan")},
            )

            # -- torch step (reference base_trainer.py:369-457 semantics)
            # the jitted step folds the per-step GP draw as
            # uniform(fold_in(rng, gstate.step)); replicate the exact draw
            step_rng = jax.random.fold_in(base_rng, jnp.int32(step_i))
            alpha_np = np.asarray(
                jax.random.uniform(step_rng, (BATCH, 1, 1, 1), jnp.float32),
            )
            tn, tgt, tax = _prep_torch(batch)
            output = tg(tn, tax)

            opt_d.zero_grad()
            pred_d_fake = td(output.detach())
            pred_d_real = td(tgt)
            loss_d_real = -pred_d_real.mean()
            loss_d_fake = pred_d_fake.mean()
            loss_gp = _gp_torch(td, tgt, output, _t(alpha_np))
            d_loss = (loss_d_fake + loss_d_real) / 2 + losses_cfg.gp_loss_w * loss_gp
            d_loss.backward()
            opt_d.step()

            opt_g.zero_grad()
            pred_g_fake = td(output)
            loss_g_fake = -pred_g_fake.mean()
            loss_l1 = F.l1_loss(output, tgt)
            g_loss = (
                losses_cfg.gan_loss_w * loss_g_fake
                + losses_cfg.l1_loss_w * loss_l1
            )
            g_loss.backward()
            opt_g.step()
            torch_metrics.append(
                {
                    "g_loss": float(g_loss), "d_loss": float(d_loss),
                    "g_l1": float(loss_l1), "g_gan": float(loss_g_fake),
                },
            )
            if (step_i + 1) % STEPS_PER_EPOCH == 0:
                sched_g.step()
                sched_d.step()

        # trajectory agreement: tight at step 0, loosening as fp32
        # rounding (different conv algorithms) compounds through Adam
        worst_rel = 0.0
        for i, (jm, tm) in enumerate(zip(jax_metrics, torch_metrics)):
            tol = 1e-4 * (10 ** min(i, 2))
            for key in ("g_loss", "d_loss", "g_l1"):
                rel = abs(jm[key] - tm[key]) / max(1.0, abs(tm[key]))
                worst_rel = max(worst_rel, rel)
                assert rel <= tol, (
                    f"step {i} {key}: jax={jm[key]:.6g} torch={tm[key]:.6g}",
                )
        # measured deltas for PARITY.md (visible under pytest -s)
        print(
            f"\n[parity] worst loss delta over {N_STEPS} steps: {worst_rel:.3g} rel"
            f"; final-weight max |Δ|: conv "
            f"{np.max(np.abs(_np(gstate.params['ConvBlock_0']['Conv_0']['kernel']) - tg.n1.conv.weight.detach().numpy().transpose(2, 3, 1, 0))):.3g}"
            f", rel_h "
            f"{np.max(np.abs(_np(gstate.params['TransformerBlock_0']['attention']['rel_h']) - tg.blocks[0].attention.rel_h.detach().numpy())):.3g}",
        )

        # final-parameter agreement (spot: first encoder conv + rel emb)
        w_j = _np(gstate.params["ConvBlock_0"]["Conv_0"]["kernel"])
        w_t = tg.n1.conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(w_j, w_t, atol=5e-4)
        rh_j = _np(gstate.params["TransformerBlock_0"]["attention"]["rel_h"])
        rh_t = tg.blocks[0].attention.rel_h.detach().numpy()
        np.testing.assert_allclose(rh_j, rh_t, atol=5e-4)
    finally:
        jax.config.update("jax_default_matmul_precision", None)
