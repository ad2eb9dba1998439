"""Goldens for the fused AFGSA TransformerBlock megakernel (ops/block_mega.py).

Interpret-mode (CPU) comparison against the exact XLA chain the kernel
replaces — n_aux 1×1 ConvBlock → q/k/v projections →
block_halo_attention_xla → residual → two 3×3 padded ConvBlocks →
residual (models/afgsa.py TransformerBlock, reference
`pht/models/afgsa/model.py:519-542`) — in the bf16 compute dtype for all
three torch padding modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_heal_thyself_tpu.ops.attention import (
    block_halo_attention_xla,
)
from pixel_heal_thyself_tpu.ops.bias import bias_add
from pixel_heal_thyself_tpu.ops.block_mega import (
    pad_w_halo,
    supports_shapes,
    transformer_block_mega_padded,
    unpad_w_halo,
)
from pixel_heal_thyself_tpu.ops.curves import CurveOrder, make_curve_indices
from pixel_heal_thyself_tpu.ops.padding import pad2d

BS, HALO, HEADS = 8, 3, 4


def _conv3x3(x, w, b, mode, dtype):
    xp = pad2d(x, 1, mode)
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), w.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    return jnp.maximum(bias_add(y, b.astype(dtype)), 0.0)


def _ref_block(noisy, aux, p, mode, dtype=jnp.bfloat16):
    x = noisy.astype(dtype)
    a = aux.astype(dtype)
    ncat = jnp.concatenate([x, a], axis=-1)
    n_aux = jnp.maximum(
        bias_add(
            jnp.dot(ncat, p["wcat"][0, 0].astype(dtype),
                    preferred_element_type=dtype),
            p["bcat"].astype(dtype),
        ),
        0.0,
    )
    q = jnp.dot(n_aux, p["wq"][0, 0].astype(dtype), preferred_element_type=dtype)
    k = jnp.dot(n_aux, p["wk"][0, 0].astype(dtype), preferred_element_type=dtype)
    v = jnp.dot(x, p["wv"][0, 0].astype(dtype), preferred_element_type=dtype)
    order = jnp.asarray(make_curve_indices(BS, CurveOrder.RASTER))
    attn = block_halo_attention_xla(
        q, k, v, p["rel_h"], p["rel_w"], order, order,
        block_size=BS, halo_size=HALO, num_heads=HEADS,
    )
    x1 = x + attn
    f = _conv3x3(x1, p["w1"], p["b1"], mode, dtype)
    f = _conv3x3(f, p["w2"], p["b2"], mode, dtype)
    return x1 + f


def _make(seed, b, h, w, c):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    hd = c // HEADS
    window = BS + 2 * HALO
    p = {
        "wcat": (rng.standard_normal((1, 1, 2 * c, c)) * (2 * c) ** -0.5).astype(f32),
        "bcat": (rng.standard_normal(c) * 0.1).astype(f32),
        "wq": (rng.standard_normal((1, 1, c, c)) * c**-0.5).astype(f32),
        "wk": (rng.standard_normal((1, 1, c, c)) * c**-0.5).astype(f32),
        "wv": (rng.standard_normal((1, 1, c, c)) * c**-0.5).astype(f32),
        "rel_h": rng.standard_normal((window, hd // 2)).astype(f32),
        "rel_w": rng.standard_normal((window, hd // 2)).astype(f32),
        "w1": (rng.standard_normal((3, 3, c, c)) * (9 * c) ** -0.5).astype(f32),
        "b1": (rng.standard_normal(c) * 0.1).astype(f32),
        "w2": (rng.standard_normal((3, 3, c, c)) * (9 * c) ** -0.5).astype(f32),
        "b2": (rng.standard_normal(c) * 0.1).astype(f32),
    }
    noisy = rng.standard_normal((b, h, w, c)).astype(f32)
    aux = rng.standard_normal((b, h, w, c)).astype(f32)
    return noisy, aux, p


def _run_mega(noisy, aux, p, mode, dtype=jnp.bfloat16):
    xp = pad_w_halo(noisy.astype(dtype), HALO)
    ap = pad_w_halo(aux.astype(dtype), HALO)
    op = transformer_block_mega_padded(
        xp, ap, p["wcat"], p["bcat"], p["wq"], p["wk"], p["wv"],
        p["rel_h"], p["rel_w"], p["w1"], p["b1"], p["w2"], p["b2"],
        block_size=BS, halo_size=HALO, num_heads=HEADS,
        padding_mode=mode, interpret=True,
    )
    return unpad_w_halo(op, noisy.shape[2], HALO)


@pytest.mark.parametrize("mode", ["reflect", "replicate", "zeros"])
def test_block_mega_matches_xla_chain(mode):
    b, h, w, c = 2, 32, 32, 256
    noisy, aux, p = _make(11, b, h, w, c)
    assert supports_shapes(b, h, w, c)
    ref = np.asarray(_ref_block(jnp.asarray(noisy), jnp.asarray(aux), p, mode),
                     np.float32)
    got = np.asarray(_run_mega(jnp.asarray(noisy), jnp.asarray(aux), p, mode),
                     np.float32)
    scale = np.abs(ref).max()
    dev = np.abs(got - ref).max() / scale
    assert dev < 3e-2, f"mode={mode}: rel dev {dev:.3e}"
    # tighter aggregate bound: bf16 noise, not a structural mismatch
    rms = np.sqrt(((got - ref) ** 2).mean()) / scale
    assert rms < 4e-3, f"mode={mode}: rel rms {rms:.3e}"


def test_block_mega_rectangular_and_margins():
    """Non-square frame + the padded-layout contract: margin columns of
    the output are exactly zero (the next block's n_aux/v masking relies
    on it)."""
    b, h, w, c = 1, 32, 48, 256
    noisy, aux, p = _make(5, b, h, w, c)
    xp = pad_w_halo(jnp.asarray(noisy, jnp.bfloat16), HALO)
    ap = pad_w_halo(jnp.asarray(aux, jnp.bfloat16), HALO)
    op = transformer_block_mega_padded(
        xp, ap, p["wcat"], p["bcat"], p["wq"], p["wk"], p["wv"],
        p["rel_h"], p["rel_w"], p["w1"], p["b1"], p["w2"], p["b2"],
        padding_mode="reflect", interpret=True,
    )
    op = np.asarray(op, np.float32)
    assert np.all(op[:, :, :HALO] == 0.0)
    assert np.all(op[:, :, HALO + w :] == 0.0)
    ref = np.asarray(
        _ref_block(jnp.asarray(noisy), jnp.asarray(aux), p, "reflect"),
        np.float32,
    )
    got = op[:, :, HALO : HALO + w]
    dev = np.abs(got - ref).max() / np.abs(ref).max()
    assert dev < 3e-2, f"rel dev {dev:.3e}"


def test_block_mega_chains():
    """Two chained padded blocks equal two chained XLA blocks — the
    padded-form chaining contract AFGSANet uses."""
    b, h, w, c = 1, 32, 32, 256
    noisy, aux, p = _make(7, b, h, w, c)
    _, _, p2 = _make(8, b, h, w, c)
    ref = _ref_block(jnp.asarray(noisy), jnp.asarray(aux), p, "reflect")
    ref = np.asarray(
        _ref_block(ref, jnp.asarray(aux), p2, "reflect"), np.float32,
    )
    xp = pad_w_halo(jnp.asarray(noisy, jnp.bfloat16), HALO)
    ap = pad_w_halo(jnp.asarray(aux, jnp.bfloat16), HALO)
    kw = dict(padding_mode="reflect", interpret=True)
    mid = transformer_block_mega_padded(
        xp, ap, p["wcat"], p["bcat"], p["wq"], p["wk"], p["wv"],
        p["rel_h"], p["rel_w"], p["w1"], p["b1"], p["w2"], p["b2"], **kw,
    )
    out = transformer_block_mega_padded(
        mid, ap, p2["wcat"], p2["bcat"], p2["wq"], p2["wk"], p2["wv"],
        p2["rel_h"], p2["rel_w"], p2["w1"], p2["b1"], p2["w2"], p2["b2"], **kw,
    )
    got = np.asarray(unpad_w_halo(out, w, HALO), np.float32)
    scale = np.abs(ref).max()
    dev = np.abs(got - ref).max() / scale
    assert dev < 5e-2, f"rel dev {dev:.3e}"


def test_supports_shapes_gates():
    assert supports_shapes(8, 128, 128, 256)
    assert not supports_shapes(8, 128, 128, 256, dtype=jnp.float32)
    assert not supports_shapes(8, 120, 128, 256)  # H % 16
    assert not supports_shapes(8, 128, 124, 256)  # W % block
    assert not supports_shapes(8, 128, 128, 192)  # C % 128
    assert not supports_shapes(8, 512, 512, 256)  # VMEM budget


def _loss_mega(noisy, aux, p, mode):
    xp = pad_w_halo(noisy.astype(jnp.bfloat16), HALO)
    ap = pad_w_halo(aux.astype(jnp.bfloat16), HALO)

    def f(xp_, ap_, pt):
        out = transformer_block_mega_padded(
            xp_, ap_, pt["wcat"], pt["bcat"], pt["wq"], pt["wk"], pt["wv"],
            pt["rel_h"], pt["rel_w"], pt["w1"], pt["b1"], pt["w2"], pt["b2"],
            padding_mode=mode, interpret=True,
        )
        w = noisy.shape[2]
        return jnp.sum(
            unpad_w_halo(out, w, HALO).astype(jnp.float32) ** 2 * _WEIGHTS[: w],
        )

    return f, (xp, ap, p)


_WEIGHTS = None  # set per-test: a fixed random weighting of the output


def _loss_ref(noisy, aux, p, mode):
    def f(x_, a_, pt):
        out = _ref_block(x_, a_, pt, mode)
        return jnp.sum(out.astype(jnp.float32) ** 2 * _WEIGHTS[: noisy.shape[2]])

    return f, (jnp.asarray(noisy), jnp.asarray(aux), p)


@pytest.mark.parametrize("mode", ["reflect", "replicate", "zeros"])
def test_block_mega_gradients(mode):
    """Every gradient (both images + all 11 params) of a scalar loss
    through the fused block matches the XLA chain's autodiff.

    Bounds are rms-centric: in bf16 the two computations round the conv
    tap-sums in different orders, so pre-activations within one ulp of
    zero can land on opposite sides of the ReLU boundary — each flip
    moves a full-size do·input contribution into a handful of dW
    elements. Verified numeric, not structural: the same comparison in
    f32 collapses ~100× (w1 1.3e-1 → 1.4e-3 max dev)."""
    global _WEIGHTS
    b, h, w, c = 2, 32, 32, 256
    noisy, aux, p = _make(3, b, h, w, c)
    rngw = np.random.default_rng(99)
    _WEIGHTS = jnp.asarray(rngw.standard_normal((w, c)).astype(np.float32))

    fm, (xp, ap, pm) = _loss_mega(jnp.asarray(noisy), jnp.asarray(aux), p, mode)
    fr, (x_, a_, pr) = _loss_ref(noisy, aux, p, mode)

    gm = jax.grad(fm, argnums=(0, 1, 2))(xp, ap, pm)
    gr = jax.grad(fr, argnums=(0, 1, 2))(x_, a_, pr)

    # image grads: compare the unpadded interior (the ref takes unpadded
    # inputs, so its grads are already interior-only); mega margins must
    # be exactly zero
    for gmi, gri, name in ((gm[0], gr[0], "dnoisy"), (gm[1], gr[1], "daux")):
        gmi = np.asarray(gmi, np.float32)
        assert np.all(gmi[:, :, :HALO] == 0), name
        assert np.all(gmi[:, :, HALO + w :] == 0), name
        got = gmi[:, :, HALO : HALO + w]
        ref = np.asarray(gri, np.float32)
        scale = np.abs(ref).max() + 1e-12
        dev = np.abs(got - ref).max() / scale
        assert dev < 1e-1, f"{name}[{mode}]: rel dev {dev:.3e}"
        rms = np.sqrt(((got - ref) ** 2).mean()) / scale
        assert rms < 8e-3, f"{name}[{mode}]: rel rms {rms:.3e}"

    for key in sorted(p):
        got = np.asarray(gm[2][key], np.float32)
        ref = np.asarray(gr[2][key], np.float32)
        scale = np.abs(ref).max() + 1e-12
        rms = np.sqrt(((got - ref) ** 2).mean()) / scale
        assert rms < 2.5e-2, f"d{key}[{mode}]: rel rms {rms:.3e}"
        # aggregate fingerprint: total gradient mass agrees
        fdev = abs(np.abs(got).sum() - np.abs(ref).sum()) / (
            np.abs(ref).sum() + 1e-12
        )
        assert fdev < 2e-2, f"d{key}[{mode}]: fingerprint dev {fdev:.3e}"


def test_model_integration_param_tree_and_forward():
    """AFGSANet(use_block_kernel=True) declares the byte-identical param
    tree (checkpoint compatibility) and matches the literal model's
    forward on the same params."""
    from functools import partial as _partial

    from pixel_heal_thyself_tpu.models.afgsa import AFGSANet

    kw = dict(num_sa=2, num_gcp=1, dtype=jnp.bfloat16)
    net0 = AFGSANet(**kw)
    net1 = AFGSANet(use_block_kernel=True, mega_interpret=True, **kw)

    rng = np.random.default_rng(21)
    x = jnp.asarray(np.abs(rng.standard_normal((1, 32, 32, 3))), jnp.float32)
    aux = jnp.asarray(rng.standard_normal((1, 32, 32, 7)), jnp.float32)

    p0 = net0.init(jax.random.PRNGKey(0), x, aux)
    p1_shapes = jax.eval_shape(_partial(net1.init, jax.random.PRNGKey(0)), x, aux)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(
        p1_shapes,
    )
    same_shapes = jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape and a.dtype == b.dtype, p0, p1_shapes,
    )
    assert all(jax.tree_util.tree_leaves(same_shapes))

    out0 = np.asarray(net0.apply(p0, x, aux), np.float32)
    out1 = np.asarray(net1.apply(p0, x, aux), np.float32)
    scale = np.abs(out0).max()
    dev = np.abs(out1 - out0).max() / scale
    assert dev < 3e-2, f"rel dev {dev:.3e}"
