"""pad2d forward/gradient parity vs stock jnp.pad autodiff.

pad2d carries a custom VJP (ops/padding.py) that folds border-strip
gradients with slice+concat passes; these tests pin it against jnp.pad's
autodiff for every mode/pad the models use (reflect/replicate p∈{1,2},
zeros), including gradient flow through both spatial axes and corners.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_heal_thyself_tpu.ops.padding import pad2d

_WIDTHS = lambda p: ((0, 0), (p, p), (p, p), (0, 0))  # noqa: E731


@pytest.mark.parametrize(
    "mode,jmode,pad",
    [
        ("reflect", "reflect", 1),
        ("reflect", "reflect", 2),
        ("replicate", "edge", 1),
        ("replicate", "edge", 2),
        ("zeros", "constant", 2),
    ],
)
def test_pad2d_matches_jnp_pad(mode, jmode, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 3)), jnp.float32)

    got = pad2d(x, pad, mode)
    if jmode == "constant":
        want = jnp.pad(x, _WIDTHS(pad), mode="constant")
    else:
        want = jnp.pad(x, _WIDTHS(pad), mode=jmode)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # gradients: weight the padded output so every position contributes
    # a distinct cotangent (catches mis-folded borders/corners)
    w = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)

    def loss_custom(a):
        return jnp.sum(pad2d(a, pad, mode) * w)

    def loss_ref(a):
        if jmode == "constant":
            return jnp.sum(jnp.pad(a, _WIDTHS(pad), mode="constant") * w)
        return jnp.sum(jnp.pad(a, _WIDTHS(pad), mode=jmode) * w)

    g_got = jax.grad(loss_custom)(x)
    g_want = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), atol=1e-5, rtol=1e-5,
    )


def test_pad2d_small_input_fallback():
    """Inputs too small for the strip fold fall back to jnp.pad autodiff."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 3, 3, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 7, 7, 2)), jnp.float32)
    g_got = jax.grad(lambda a: jnp.sum(pad2d(a, 2, "reflect") * w))(x)
    g_want = jax.grad(
        lambda a: jnp.sum(jnp.pad(a, _WIDTHS(2), mode="reflect") * w),
    )(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-5)
