"""End-to-end validation of tools/import_torch_checkpoint.py against the
ACTUAL reference torch modules.

Unlike tests/test_reference_parity.py (which re-implements the reference in
simplified torch for train-step trajectory comparison), this imports the
reference's own `AFGSANet` / `DiscriminatorVGG` / `MambaDenoiserNet`
classes from the reference tree, random-initializes them, round-trips
their `state_dict()` through the converter, and asserts that this
framework's models produce the same forward outputs — proving a user's
trained `G.pt`/`D.pt` (reference `base_trainer.py:532-533`) load here
correctly.

The reference's `mamba_ssm.Mamba2` CUDA dependency is absent in this
environment, so the Mamba leg injects a fake `mamba_ssm` module whose
`Mamba2` is the golden torch oracle from tests/test_mamba_oracle.py
(published mamba_ssm parameter layout) — the state_dict key names and
shapes are exactly the real package's.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "pht")),
    reason="reference tree not available",
)

_ref_cache: dict = {}


def _reference_modules():
    """Import the reference model modules once, with the missing
    hilbertcurve dependency stubbed and the reference logger's stderr
    hijack undone (pht/logger.py:23 redirects sys.stderr on import)."""
    if _ref_cache:
        return _ref_cache
    saved_stderr = sys.stderr
    if "hilbertcurve" not in sys.modules:
        hc = types.ModuleType("hilbertcurve")
        hcc = types.ModuleType("hilbertcurve.hilbertcurve")

        class HilbertCurve:  # only reached for curve_order=hilbert
            def __init__(self, *a, **k):
                raise RuntimeError("hilbertcurve stub")

        hcc.HilbertCurve = HilbertCurve
        hc.hilbertcurve = hcc
        sys.modules["hilbertcurve"] = hc
        sys.modules["hilbertcurve.hilbertcurve"] = hcc
    if "mamba_ssm" not in sys.modules:
        from tests.test_mamba_oracle import TorchMamba2

        class Mamba2Compat(TorchMamba2):
            """TorchMamba2 exposed under mamba_ssm's exact state_dict
            layout: `norm.weight` (a submodule) instead of the oracle's
            flat `norm_weight` parameter. Same tensor object, so the
            inherited forward still reads `self.norm_weight`."""

            def __init__(self, d_model, d_state=64, d_conv=4, expand=2,
                         headdim=64, **_):
                super().__init__(d_model, d_state, d_conv, expand, headdim)
                w = self._parameters.pop("norm_weight")
                self.norm = torch.nn.Module()
                self.norm.weight = w
                # unregistered alias for the inherited forward
                object.__setattr__(self, "norm_weight", w)

        fake = types.ModuleType("mamba_ssm")
        fake.Mamba2 = Mamba2Compat
        sys.modules["mamba_ssm"] = fake
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        from pht.models.afgsa.model import AFGSANet as RefAFGSANet
        from pht.models.afgsa.model import DiscriminatorVGG as RefDiscriminatorVGG
        from pht.models.mamba.model import MambaDenoiserNet as RefMambaNet
        from pht.models.mamba.model import PositionalEncoding2D as RefPosEnc
    finally:
        sys.stderr = saved_stderr  # undo pht.logger's StreamToLogger hijack
        import logging

        logging.captureWarnings(False)  # pht.logger turns this on at import
        logging.getLogger("pht").handlers.clear()
        logging.getLogger("pht").propagate = False
    _ref_cache.update(
        afgsa=RefAFGSANet,
        dvgg=RefDiscriminatorVGG,
        mamba=RefMambaNet,
        posenc=RefPosEnc,
    )
    return _ref_cache


def _state_dict_np(model):
    return {
        k: np.asarray(v.detach().cpu().numpy(), np.float32)
        for k, v in model.state_dict().items()
    }


@pytest.mark.parametrize("use_film", [False, True])
def test_afgsa_generator_import_matches_reference_forward(use_film):
    import jax
    import jax.numpy as jnp

    from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
    from tools.import_torch_checkpoint import convert_afgsa_generator

    ref = _reference_modules()
    torch.manual_seed(0)
    # num_gcp=1 covers the CheckpointTransformerBlock naming split
    rmodel = ref["afgsa"](
        3, 7, 64, num_sa=2, block_size=8, halo_size=3, num_heads=4,
        num_gcp=1, padding_mode="zeros", use_film=use_film,
    ).eval()

    rng = np.random.default_rng(5)
    noisy = np.abs(rng.standard_normal((1, 16, 16, 3))).astype(np.float32)
    aux = rng.standard_normal((1, 16, 16, 7)).astype(np.float32)
    with torch.no_grad():
        want = (
            rmodel(
                torch.from_numpy(noisy.transpose(0, 3, 1, 2)),
                torch.from_numpy(aux.transpose(0, 3, 1, 2)),
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    params = convert_afgsa_generator(
        _state_dict_np(rmodel), num_gcp=1, use_film=use_film,
    )
    model = AFGSANet(
        base_ch=64, enc_ch=256, num_sa=2, num_gcp=1, num_heads=4,
        padding_mode="zeros", use_film=use_film, use_pallas=False,
    )
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(noisy), jnp.asarray(aux)),
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_discriminator_vgg_import_matches_reference_forward():
    import jax.numpy as jnp

    from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
    from tools.import_torch_checkpoint import convert_discriminator_vgg

    ref = _reference_modules()
    torch.manual_seed(1)
    rmodel = ref["dvgg"](3, 16, 32).train()  # train(): per-batch BN stats

    rng = np.random.default_rng(6)
    x = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = rmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    params = convert_discriminator_vgg(_state_dict_np(rmodel))
    model = DiscriminatorVGG(in_nc=3, base_nf=16, input_size=32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_mamba_generator_import_matches_reference_forward():
    import jax.numpy as jnp

    from pixel_heal_thyself_tpu.models.mamba import MambaDenoiserNet
    from tools.import_torch_checkpoint import convert_mamba_generator

    ref = _reference_modules()
    torch.manual_seed(2)
    h = w = 8
    # ch=64, expand=2 -> d_inner=128, mamba_ssm default headdim 64 -> 2 heads
    rmodel = ref["mamba"](
        input_channels=3,
        aux_input_channels=7,
        base_ch=64,
        pos_encoder=ref["posenc"](64, h, w),
        num_blocks=2,
        d_state=16,
        d_conv=4,
        expansion=2,
        num_gcp=1,
        padding_mode="zeros",
    ).eval()

    rng = np.random.default_rng(7)
    noisy = np.abs(rng.standard_normal((1, h, w, 3))).astype(np.float32)
    aux = rng.standard_normal((1, h, w, 7)).astype(np.float32)
    with torch.no_grad():
        want = (
            rmodel(
                torch.from_numpy(noisy.transpose(0, 3, 1, 2)),
                torch.from_numpy(aux.transpose(0, 3, 1, 2)),
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    params = convert_mamba_generator(_state_dict_np(rmodel), num_gcp=1)
    model = MambaDenoiserNet(
        base_ch=64, enc_ch=256, num_blocks=2, d_state=16, headdim=64,
        expansion=2, num_gcp=1, height=h, width=w, padding_mode="zeros",
    )
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(noisy), jnp.asarray(aux)),
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_unmapped_keys_raise():
    from tools.import_torch_checkpoint import convert_discriminator_vgg

    with pytest.raises(KeyError, match="unmapped"):
        convert_discriminator_vgg(
            {
                "features.0.0.weight": np.zeros((4, 3, 3, 3), np.float32),
                "features.0.0.bias": np.zeros((4,), np.float32),
                "classifier.0.weight": np.zeros((100, 64), np.float32),
                "classifier.0.bias": np.zeros((100,), np.float32),
                "classifier.2.weight": np.zeros((1, 100), np.float32),
                "classifier.2.bias": np.zeros((1,), np.float32),
                "mystery.weight": np.zeros((1,), np.float32),
            },
        )
