"""LPIPS math tests (random weights — pretrained npz gated offline)."""

import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.models.lpips import (
    _TAP_CHANNELS,
    _VGG16_CONVS,
    load_lpips_params,
    lpips_distance,
    random_lpips_params,
    to_lpips_range,
)


def write_converter_format_npz(path, rng) -> None:
    """Synthesize an npz with exactly the keys/shapes/layouts that
    tools/convert_lpips_weights.py emits (torchvision OIHW state-dict
    entries + lpips lin heads [1, C, 1, 1])."""
    out = {}
    in_ch = 3
    for conv_idx, out_ch in _VGG16_CONVS:
        out[f"features.{conv_idx}.weight"] = rng.standard_normal(
            (out_ch, in_ch, 3, 3),
        ).astype(np.float32)
        out[f"features.{conv_idx}.bias"] = rng.standard_normal(out_ch).astype(
            np.float32,
        )
        in_ch = out_ch
    for k, c in enumerate(_TAP_CHANNELS):
        out[f"lin{k}.weight"] = rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32)
    np.savez(path, **out)


class TestConvertedWeightChannel:
    def test_converter_npz_loads_and_runs(self, tmp_path):
        """The offline-weight channel is plug-and-play: an npz in the
        converter's exact format loads into the same pytree structure as
        random_lpips_params and computes a finite distance — so dropping
        in a real torchvision/lpips conversion needs no code change."""
        rng = np.random.default_rng(0)
        path = tmp_path / "lpips_vgg.npz"
        write_converter_format_npz(path, rng)

        params = load_lpips_params(path)
        ref = random_lpips_params(0)
        assert len(params["convs"]) == len(ref["convs"])
        for (w, b), (wr, br) in zip(params["convs"], ref["convs"]):
            assert w.shape == wr.shape and b.shape == br.shape
        for lw, lr in zip(params["lins"], ref["lins"]):
            assert lw.shape == lr.shape

        x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
        d = np.asarray(lpips_distance(params, x, y))
        assert np.isfinite(d).all() and (d > 0).all()
        np.testing.assert_allclose(
            np.asarray(lpips_distance(params, x, x)), 0.0, atol=1e-6,
        )


class TestConverterToolMapping:
    """Execute tools/convert_lpips_weights.py `main()` itself against stub
    torchvision/lpips modules built from REAL torch layers (same module
    structure the tool reads: `vgg.features.state_dict()` with torchvision
    Sequential indices, `lpips.LPIPS().lin<k>.model[1].weight` Parameters),
    then prove the npz → load_lpips_params → lpips_distance chain matches a
    direct torch evaluation of those very modules. This pins the tool's
    tensor mapping (feature indices, OIHW→HWIO, lin reshape), leaving only
    the artifact download as an ops step (reference base_trainer.py:441-448)."""

    @staticmethod
    def _build_torch_vgg16_features(seed: int):
        import torch
        import torch.nn as nn

        torch.manual_seed(seed)
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers: list = []
        in_ch = 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=False))
                in_ch = v
        return nn.Sequential(*layers)

    def test_converter_main_end_to_end(self, tmp_path, monkeypatch):
        import sys
        import types

        import torch
        import torch.nn as nn

        features = self._build_torch_vgg16_features(0)
        # sanity: torchvision index layout matches the loader's table
        for conv_idx, out_ch in _VGG16_CONVS:
            assert isinstance(features[conv_idx], nn.Conv2d)
            assert features[conv_idx].out_channels == out_ch

        class _FakeVGG:
            pass

        fake_vgg = _FakeVGG()
        fake_vgg.features = features

        tv_models = types.ModuleType("torchvision.models")
        tv_models.vgg16 = lambda weights=None: fake_vgg
        tv_models.VGG16_Weights = types.SimpleNamespace(IMAGENET1K_V1="v1")
        tv = types.ModuleType("torchvision")
        tv.models = tv_models

        torch.manual_seed(1)
        lin_convs = [nn.Conv2d(c, 1, 1, bias=False) for c in _TAP_CHANNELS]
        for lc in lin_convs:
            with torch.no_grad():
                lc.weight.abs_()  # lpips lin weights are non-negative
            assert lc.weight.requires_grad  # live Parameter, like real lpips

        class _FakeLPIPS:
            def __init__(self, net="vgg"):
                assert net == "vgg"
                for k, lc in enumerate(lin_convs):
                    setattr(
                        self, f"lin{k}",
                        types.SimpleNamespace(model=[nn.Dropout(), lc]),
                    )

        lp = types.ModuleType("lpips")
        lp.LPIPS = _FakeLPIPS
        monkeypatch.setitem(sys.modules, "torchvision", tv)
        monkeypatch.setitem(sys.modules, "torchvision.models", tv_models)
        monkeypatch.setitem(sys.modules, "lpips", lp)

        import os

        tools_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        )
        sys.path.insert(0, tools_dir)
        try:
            import convert_lpips_weights
        finally:
            sys.path.remove(tools_dir)
        npz = tmp_path / "lpips_vgg.npz"
        convert_lpips_weights.main([str(npz)])
        assert npz.exists()

        params = load_lpips_params(npz)

        # torch-side oracle: run the SAME modules with the lpips formula
        from pixel_heal_thyself_tpu.models import lpips as L

        rng = np.random.default_rng(5)
        x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        got = np.asarray(lpips_distance(params, jnp.asarray(x), jnp.asarray(y)))

        shift = torch.tensor(L._SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(L._SCALE).view(1, 3, 1, 1)
        tap_idx = {3, 8, 15, 22, 29}

        def vgg_taps(img):
            h = (img - shift) / scale
            taps = []
            for i, layer in enumerate(features):
                h = layer(h)
                if i in tap_idx:
                    taps.append(h)
            return taps

        def unit_norm(t):
            return t / (torch.sqrt(torch.sum(t**2, dim=1, keepdim=True)) + 1e-10)

        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
            ty = torch.from_numpy(y.transpose(0, 3, 1, 2))
            want = torch.zeros(2)
            for fa, fb, lc in zip(vgg_taps(tx), vgg_taps(ty), lin_convs):
                d = (unit_norm(fa) - unit_norm(fb)) ** 2
                want = want + lc(d).mean((1, 2, 3))

        np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=1e-5)


class TestLpips:
    def test_zero_for_identical(self):
        params = random_lpips_params(0)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32),
        )
        d = lpips_distance(params, x, x)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    def test_positive_and_monotone_ish(self):
        params = random_lpips_params(0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
        small = x + 0.01 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        big = x + 0.5 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        d_small = float(lpips_distance(params, x, small)[0])
        d_big = float(lpips_distance(params, x, big)[0])
        assert 0 < d_small < d_big

    def test_to_lpips_range(self):
        x_log = jnp.log1p(jnp.asarray([[0.0, 1.0, 3.0]]))
        out = np.asarray(to_lpips_range(x_log))
        assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0
        assert out[0, 0] == -1.0  # zero radiance → -1

    def test_matches_torch_lpips_oracle(self):
        """Pin the LPIPS forward semantics against an independent torch
        port of the `lpips` package's published math (scaling layer,
        VGG16 features, taps after relu{1_2,2_2,3_3,4_3,5_3},
        channel-unit-normalize, squared diff, 1x1 lin, spatial mean, sum
        over taps) with shared random weights. With this green, a real
        converted weight npz (tools/convert_lpips_weights.py) is
        plug-and-play."""
        import torch

        from pixel_heal_thyself_tpu.models import lpips as L

        params = random_lpips_params(3)
        rng = np.random.default_rng(2)
        x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        got = np.asarray(lpips_distance(params, jnp.asarray(x), jnp.asarray(y)))

        shift = torch.tensor(L._SHIFT).view(1, 3, 1, 1).double()
        scale = torch.tensor(L._SCALE).view(1, 3, 1, 1).double()
        convs = [
            (
                torch.from_numpy(
                    np.asarray(w).transpose(3, 2, 0, 1).copy(),
                ).double(),
                torch.from_numpy(np.asarray(b).copy()).double(),
            )
            for w, b in params["convs"]
        ]
        lins = [torch.from_numpy(np.asarray(lw).copy()).double() for lw in params["lins"]]

        def vgg_taps(img):  # img: NCHW in [-1, 1]
            h = (img - shift) / scale
            taps = []
            for i, ((conv_idx, _), (w, b)) in enumerate(zip(L._VGG16_CONVS, convs)):
                if conv_idx in L._POOL_BEFORE:
                    h = torch.nn.functional.max_pool2d(h, 2)
                h = torch.nn.functional.relu(
                    torch.nn.functional.conv2d(h, w, b, padding=1),
                )
                if conv_idx + 1 in L._TAP_AFTER:
                    taps.append(h)
            return taps

        def unit_norm(t):  # lpips.normalize_tensor
            return t / (torch.sqrt(torch.sum(t**2, dim=1, keepdim=True)) + 1e-10)

        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2)).double()
            ty = torch.from_numpy(y.transpose(0, 3, 1, 2)).double()
            want = torch.zeros(2, dtype=torch.float64)
            for fa, fb, lw in zip(vgg_taps(tx), vgg_taps(ty), lins):
                d = (unit_norm(fa) - unit_norm(fb)) ** 2
                want = want + (d * lw.view(1, -1, 1, 1)).sum(1).mean((1, 2))

        np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=1e-5)

    def test_trains_with_lpips_loss(self):
        import jax

        from pixel_heal_thyself_tpu.config import LossesConfig
        from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
        from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
        from pixel_heal_thyself_tpu.training.train_step import (
            init_train_state,
            make_optimizer,
            make_train_step,
        )

        g_model = AFGSANet(base_ch=16, enc_ch=16, num_sa=1, num_gcp=0, num_heads=2)
        d_model = DiscriminatorVGG(input_size=32, base_nf=8)
        tx = make_optimizer(1e-3, [2], 0.5, 10)
        noisy = jnp.zeros((1, 32, 32, 3))
        aux = jnp.zeros((1, 32, 32, 7))
        gstate = init_train_state(g_model, tx, jax.random.PRNGKey(0), noisy, aux)
        dstate = init_train_state(d_model, tx, jax.random.PRNGKey(1), noisy)
        cfg = LossesConfig(use_lpips_loss=True, lpips_weights_path="random")
        step = make_train_step(
            g_model, d_model, cfg, False, tx, tx,
            lpips_params=random_lpips_params(0),
        )
        rng = np.random.default_rng(0)
        batch = {
            "noisy": jnp.asarray(rng.uniform(0, 2, (1, 32, 32, 3)), jnp.float32),
            "gt": jnp.asarray(rng.uniform(0, 2, (1, 32, 32, 3)), jnp.float32),
            "aux": jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 7)), jnp.float32),
        }
        gstate, dstate, metrics = step(gstate, dstate, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["g_loss"]))


class TestTurnkeyConversion:
    """tools/convert_lpips_weights.py --verify / --from-files (VERDICT r3
    #7): the ops handoff where the only human step is the download."""

    def _write_fake_artifacts(self, tmp_path, rng):
        import torch

        from tools.convert_lpips_weights import MANIFEST

        vgg_sd = {
            name: torch.from_numpy(
                rng.standard_normal(shape).astype(np.float32),
            )
            for name, shape in MANIFEST["vgg16"]["tensors"].items()
        }
        # real torchvision artifacts carry classifier.* too — must be ignored
        vgg_sd["classifier.0.weight"] = torch.zeros(4096, 25088)
        lin_sd = {
            name: torch.from_numpy(
                rng.uniform(0, 1, shape).astype(np.float32),
            )
            for name, shape in MANIFEST["lpips_vgg_lin"]["tensors"].items()
        }
        vgg_path = tmp_path / "vgg16-test.pth"
        lin_path = tmp_path / "vgg.pth"
        torch.save(vgg_sd, vgg_path)
        torch.save(lin_sd, lin_path)
        return vgg_path, lin_path

    def test_verify_accepts_documented_layouts(self, tmp_path, capsys):
        from tools.convert_lpips_weights import verify

        rng = np.random.default_rng(0)
        vgg_path, lin_path = self._write_fake_artifacts(tmp_path, rng)
        assert verify(str(vgg_path)) == 0
        assert "vgg16" in capsys.readouterr().out
        assert verify(str(lin_path)) == 0
        assert "lpips_vgg_lin" in capsys.readouterr().out

    def test_verify_rejects_wrong_shape_and_unknown_layout(self, tmp_path, capsys):
        import torch

        from tools.convert_lpips_weights import MANIFEST, verify

        rng = np.random.default_rng(1)
        bad = {
            name: torch.from_numpy(
                rng.standard_normal(shape).astype(np.float32),
            )
            for name, shape in MANIFEST["lpips_vgg_lin"]["tensors"].items()
        }
        bad["lin0.model.1.weight"] = torch.zeros(1, 65, 1, 1)  # wrong C
        p = tmp_path / "bad.pth"
        torch.save(bad, p)
        assert verify(str(p)) == 1
        assert "shape" in capsys.readouterr().out

        unknown = {"something.weight": torch.zeros(3, 3)}
        p2 = tmp_path / "unknown.pth"
        torch.save(unknown, p2)
        assert verify(str(p2)) == 1
        assert "no documented artifact" in capsys.readouterr().out

    def test_from_files_roundtrip(self, tmp_path):
        """--from-files conversion (torch-cpu only, no torchvision/lpips
        packages) emits the exact npz layout load_lpips_params consumes,
        and the resulting params compute a finite distance."""
        import jax

        from tools.convert_lpips_weights import convert_from_files, verify

        rng = np.random.default_rng(2)
        vgg_path, lin_path = self._write_fake_artifacts(tmp_path, rng)
        out = tmp_path / "lpips_vgg.npz"
        convert_from_files(str(vgg_path), str(lin_path), str(out))
        assert verify(str(out)) == 0

        params = load_lpips_params(out)
        x = jnp.asarray(
            np.random.default_rng(3).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
        )
        y = x + 0.1
        d = np.asarray(jax.jit(lpips_distance)(params, x, y))
        assert np.isfinite(d).all() and (d > 0).all()
