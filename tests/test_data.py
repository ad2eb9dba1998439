"""Data pipeline tests: EXR codec, importance sampling, h5 store, loader."""

from random import Random

import numpy as np
import pytest

from pixel_heal_thyself_tpu.data.exr import (
    read_exr,
    read_exr_channels,
    write_exr,
    write_exr_groups,
)
from pixel_heal_thyself_tpu.data.hdf5 import Hdf5Constructor
from pixel_heal_thyself_tpu.data.dataset import PatchDataset, PrefetchLoader
from pixel_heal_thyself_tpu.data.preprocessing import (
    get_cropped_patches,
    get_importance_map,
    get_region_list,
    get_variance_map,
    importance_sampling,
    preprocess_data,
    prune_patches,
    sample_patches_dart_throwing,
    scale_exr_img,
    split_patches,
)
from pixel_heal_thyself_tpu.data.synthetic import generate_dataset, generate_scene


class TestExrCodec:
    @pytest.mark.parametrize("comp", ["none", "zips", "zip"])
    @pytest.mark.parametrize("ptype", ["half", "float"])
    def test_roundtrip(self, tmp_path, comp, ptype):
        rng = np.random.default_rng(0)
        h, w = 37, 53  # odd sizes exercise partial ZIP chunks
        chans = {
            "R": rng.uniform(0, 10, (h, w)).astype(np.float32),
            "G": rng.uniform(0, 10, (h, w)).astype(np.float32),
            "normal.X": rng.uniform(-1, 1, (h, w)).astype(np.float32),
        }
        p = tmp_path / "t.exr"
        write_exr(p, chans, compression=comp, pixel_type=ptype)
        back = read_exr_channels(p)
        dt = np.float16 if ptype == "half" else np.float32
        for k, v in chans.items():
            np.testing.assert_array_equal(back[k], v.astype(dt).astype(np.float32))

    def test_zip_path_actually_compresses(self, tmp_path):
        # smooth data → zlib wins → the decompression path is exercised
        h, w = 64, 64
        smooth = np.tile(np.linspace(0, 1, w, dtype=np.float32), (h, 1))
        p = tmp_path / "s.exr"
        write_exr(p, {"Y": smooth}, compression="zip", pixel_type="float")
        raw_bytes = h * w * 4
        assert p.stat().st_size < raw_bytes  # compressed on disk
        np.testing.assert_array_equal(read_exr_channels(p)["Y"], smooth)

    def test_group_read(self, tmp_path):
        rng = np.random.default_rng(1)
        groups = {
            "default": rng.uniform(0, 5, (16, 16, 3)).astype(np.float32),
            "normal": rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
            "depth": rng.uniform(0, 9, (16, 16, 1)).astype(np.float32),
            "albedo": rng.uniform(0, 1, (16, 16, 3)).astype(np.float32),
        }
        p = tmp_path / "g.exr"
        write_exr_groups(p, groups, pixel_type="float")
        back = read_exr(p)
        assert set(back) == set(groups)
        for k in groups:
            np.testing.assert_array_equal(back[k], groups[k])

    def test_rgb_order_not_alphabetical(self, tmp_path):
        """'default' channels come back R,G,B even though the file stores
        channels alphabetically (B,G,R)."""
        r = np.full((4, 4), 1.0, np.float32)
        g = np.full((4, 4), 2.0, np.float32)
        b = np.full((4, 4), 3.0, np.float32)
        p = tmp_path / "rgb.exr"
        write_exr(p, {"R": r, "G": g, "B": b}, pixel_type="float")
        img = read_exr(p)["default"]
        assert img[0, 0].tolist() == [1.0, 2.0, 3.0]


class TestInspect:
    """EXR describe/display helpers (reference util.py:17-68)."""

    def _write_sample(self, tmp_path):
        rng = np.random.default_rng(3)
        groups = {
            "default": rng.uniform(0, 5, (8, 8, 3)).astype(np.float32),
            "normal": rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32),
            "depth": rng.uniform(0, 9, (8, 8, 1)).astype(np.float32),
        }
        p = tmp_path / "s.exr"
        write_exr_groups(p, groups, pixel_type="float")
        return p, groups

    def test_describe(self, tmp_path):
        from pixel_heal_thyself_tpu.data.inspect import describe_exr

        p, _ = self._write_sample(tmp_path)
        text = describe_exr(str(p))
        assert "Width: 8" in text and "Height: 8" in text
        for name in ("R", "G", "B", "normal.R", "depth.Z"):
            assert name in text
        assert "Default channels: 3" in text

    def test_describe_is_header_only(self, tmp_path, monkeypatch):
        # describing a frame must not decompress the payload (the helper
        # exists to inspect production-size EXRs cheaply)
        from pixel_heal_thyself_tpu.data import inspect as inspect_mod

        p, _ = self._write_sample(tmp_path)

        def boom(*a, **k):
            raise AssertionError("describe_exr must not call read_exr")

        monkeypatch.setattr(inspect_mod, "read_exr", boom)
        text = inspect_mod.describe_exr(str(p))
        assert "Default channels: 3" in text

    def test_display_normalization(self, tmp_path):
        from pixel_heal_thyself_tpu.data.inspect import process_channel_display

        rng = np.random.default_rng(4)
        # radiance: clip + gamma
        rad = rng.uniform(0, 5, (6, 6, 3)).astype(np.float32)
        out = process_channel_display(rad, "default")
        np.testing.assert_allclose(
            out, np.clip(rad, 0, 1) ** 0.45454545, rtol=1e-6,
        )
        # normals: unit-normalized + abs
        nrm = rng.uniform(-1, 1, (6, 6, 3)).astype(np.float32)
        out = process_channel_display(nrm, "normal")
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5,
        )
        assert (out >= 0).all()
        # depth: max-normalize, 1-channel squeezed to 2-D
        dep = rng.uniform(0, 9, (6, 6, 1)).astype(np.float32)
        out = process_channel_display(dep, "depth")
        assert out.shape == (6, 6)
        assert np.isclose(out.max(), 1.0)
        # zero depth map stays zero (no div-by-zero)
        out = process_channel_display(np.zeros((4, 4, 1), np.float32), "depth")
        assert (out == 0).all()

    def test_show_channel_saves_png(self, tmp_path):
        from pixel_heal_thyself_tpu.data.inspect import (
            show_exr_channel,
            show_exr_info,
        )

        p, groups = self._write_sample(tmp_path)
        show_exr_info(str(p))  # logs, shouldn't raise
        png = tmp_path / "out.png"
        disp = show_exr_channel(str(p), "default", save_path=str(png))
        assert png.exists() and png.stat().st_size > 0
        assert disp.shape == groups["default"].shape
        with pytest.raises(KeyError):
            show_exr_channel(str(p), "nope", save_path=str(png))


class TestPreprocessing:
    def test_scale_exr_img(self):
        x = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
        s = scale_exr_img({"a": x}, 0.5)["a"]
        assert s.shape == (2, 2, 1)
        assert s[0, 0, 0] == np.mean([0, 1, 4, 5])

    def test_variance_map_properties(self):
        rng = np.random.default_rng(0)
        flat = np.ones((32, 32, 3), np.float32)
        noisy = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        v_flat = get_variance_map(flat, 8)
        v_noisy = get_variance_map(noisy, 8)
        assert v_flat.max() <= v_noisy.mean() + 1e-5
        assert 0 <= v_noisy.min() and v_noisy.max() <= 1.0

    def test_dart_throwing_bounds_and_determinism(self):
        r1 = sample_patches_dart_throwing((128, 128), 32, 20, Random(7))
        r2 = sample_patches_dart_throwing((128, 128), 32, 20, Random(7))
        np.testing.assert_array_equal(r1, r2)
        assert (r1[:, 0] <= 128 - 32 - 1).all() and (r1[:, 0] >= 0).all()
        assert (r1[:, 1] <= 128 - 32 - 1).all()
        # min-distance property should hold for most pairs (radius shrinks)
        assert len(np.unique(r1, axis=0)) == 20

    def test_region_list_boustrophedon(self):
        regions = get_region_list((8, 12), 4)
        assert regions[0] == (0, 4, 0, 4)
        assert regions[1] == (4, 8, 0, 4)
        assert regions[2] == (8, 12, 0, 4)
        # second row reversed
        assert regions[3] == (8, 12, 4, 8)

    def test_split_patches(self):
        pts = np.array([[1, 1], [5, 5], [2, 3]])
        cur, rem = split_patches(pts, (0, 3, 0, 3))
        assert len(cur) == 2 and len(rem) == 1

    def test_prune_respects_importance(self):
        imp = np.zeros((64, 64), np.float32)
        imp[:, :32] = 1.0  # only left half important
        pts = np.array([[8, 8], [40, 8], [8, 40], [40, 40], [16, 16]])
        kept = prune_patches((64, 64), pts, 8, imp, Random(0))
        assert all(x < 32 for x, y in kept)

    def test_importance_sampling_end_to_end(self):
        rng_np = np.random.default_rng(0)
        data = {
            "noisy": rng_np.uniform(0, 2, (96, 96, 3)).astype(np.float32),
            "normal": rng_np.uniform(-1, 1, (96, 96, 3)).astype(np.float32),
        }
        pts = importance_sampling(data, 32, 10, Random(0))
        half = 16
        for x, y in pts:
            assert half <= x and half <= y
            assert x + half <= 96 and y + half <= 96


class TestSyntheticAndStore:
    def test_scene_channels(self):
        gt, noisy = generate_scene(np.random.default_rng(0), 64, 64)
        assert gt["default"].shape == (64, 64, 3)
        assert noisy["normal"].shape == (64, 64, 3)
        assert noisy["depth"].shape == (64, 64, 1)
        assert (gt["default"] >= 0).all()
        # noisy at 32spp should differ from gt
        assert np.abs(noisy["default"] - gt["default"]).mean() > 1e-3

    def test_noise_scale_knob(self):
        """`noise_scale` controls the relative MC noise level (the
        quality-band validation knob, BASELINE.md round 4): quartering
        the coefficient quarters the noisy-vs-clean deviation."""
        loud_gt, loud = generate_scene(
            np.random.default_rng(5), 64, 64, noise_scale=3.0,
        )
        quiet_gt, quiet = generate_scene(
            np.random.default_rng(5), 64, 64, noise_scale=0.75,
        )
        # same rng stream + same field draws -> identical radiance
        loud_err = np.abs(loud["default"] - loud_gt["default"]).mean()
        quiet_err = np.abs(quiet["default"] - quiet_gt["default"]).mean()
        assert quiet_err < loud_err / 2.5
        assert quiet_err > 0

    def test_full_pipeline_to_loader(self, tmp_path):
        images = tmp_path / "images"
        generate_dataset(images, height=96, width=96, seed=3)
        # preprocess_data via file pair
        data = preprocess_data(
            str(images / "32spp" / "fftle0_0_32"),
            str(images / "1024spp" / "fftle0_0_1024"),
        )
        assert data["aux"].shape == (96, 96, 7)
        assert data["depth"].max() <= 1.0

        cropped, pts = get_cropped_patches(
            str(images / "32spp" / "fftle0_0_32"),
            str(images / "1024spp" / "fftle0_0_1024"),
            32,
            12,
            Random(0),
        )
        assert all(c["noisy"].shape == (32, 32, 3) for c in cropped)
        assert all(c["aux"].shape == (32, 32, 7) for c in cropped)

        store = tmp_path / "patches"
        store.mkdir()
        Hdf5Constructor(
            str(images), str(store), 32, 12, seed=1, train_val_ratio=0.5,
        ).construct_hdf5()
        train = PatchDataset(str(store / "train.h5"))
        val = PatchDataset(str(store / "val.h5"))
        assert len(train) > 0 and len(val) > 0

        loader = PrefetchLoader(train, batch_size=4, shuffle=True, seed=0)
        batches = list(loader)
        assert len(batches) == len(loader)
        b = batches[0]
        assert b["noisy"].shape[1:] == (32, 32, 3)
        assert b["aux"].shape[1:] == (32, 32, 7)

        # seeded shuffle: same loader config → same epoch order
        l1 = PrefetchLoader(train, batch_size=4, seed=5)
        l2 = PrefetchLoader(train, batch_size=4, seed=5)
        b1 = next(iter(l1))
        b2 = next(iter(l2))
        np.testing.assert_array_equal(np.asarray(b1["gt"]), np.asarray(b2["gt"]))

        # multi-worker readers preserve the exact single-worker epoch order
        lw1 = PrefetchLoader(train, batch_size=2, seed=7, workers=1)
        lw3 = PrefetchLoader(train, batch_size=2, seed=7, workers=3)
        for a, b in zip(lw1, lw3, strict=True):
            np.testing.assert_array_equal(np.asarray(a["gt"]), np.asarray(b["gt"]))

        # host_bounds slices each global batch's rows (multi-host feed)
        full = PrefetchLoader(train, batch_size=4, seed=9)
        half = PrefetchLoader(train, batch_size=4, seed=9, host_bounds=(2, 4))
        fb = next(iter(full))
        hb = next(iter(half))
        np.testing.assert_array_equal(
            np.asarray(fb["noisy"])[2:4], np.asarray(hb["noisy"]),
        )

    def test_store_chunking_and_ram_cache(self, tmp_path):
        import h5py

        images = tmp_path / "images"
        generate_dataset(images, height=96, width=96, seed=4)
        store = tmp_path / "patches"
        store.mkdir()
        Hdf5Constructor(
            str(images), str(store), 32, 8, seed=1, train_val_ratio=0.5,
        ).construct_hdf5()
        # one gzip chunk per sample: a single-sample read must not
        # decompress other samples' data (h5py auto-chunking picked
        # multi-sample 16x16 spatial tiles, a measured 646 ms/sample)
        with h5py.File(store / "train.h5", "r") as f:
            for key in ("noisy", "gt", "aux"):
                assert f[key].chunks == (1,) + f[key].shape[1:]

        cached = PatchDataset(str(store / "train.h5"), cache_in_ram=True)
        direct = PatchDataset(str(store / "train.h5"), cache_in_ram=False)
        assert cached._cache is not None and direct._cache is None
        idx = np.array([3, 0, 2, 1])  # unsorted (epoch indices are unique)
        bc, bd = cached.batch(idx), direct.batch(idx)
        for key in PatchDataset.KEYS:
            np.testing.assert_array_equal(bc[key], bd[key])
            assert bc[key].dtype == np.float32


class TestDeviceLoader:
    """DeviceLoader: the HBM-resident feed must be byte-interchangeable
    with PrefetchLoader (same seed → same epoch order → same fp32 bytes),
    so switching `data.loader` never changes a training trajectory."""

    @pytest.fixture()
    def store(self, tmp_path):
        images = tmp_path / "images"
        generate_dataset(images, height=96, width=96, seed=6)
        patches = tmp_path / "patches"
        patches.mkdir()
        Hdf5Constructor(
            str(images), str(patches), 32, 8, seed=1, train_val_ratio=0.5,
        ).construct_hdf5()
        return PatchDataset(str(patches / "train.h5"))

    def test_matches_prefetch_loader_across_epochs(self, store):
        from pixel_heal_thyself_tpu.data.dataset import DeviceLoader

        host = PrefetchLoader(store, batch_size=4, shuffle=True, seed=11)
        dev = DeviceLoader(store, batch_size=4, shuffle=True, seed=11)
        assert len(host) == len(dev)
        for _ in range(2):  # epoch counter must advance identically
            for hb, db in zip(host, dev, strict=True):
                for key in PatchDataset.KEYS:
                    np.testing.assert_array_equal(
                        np.asarray(hb[key]), np.asarray(db[key]),
                    )

    def test_sharded_gather(self, store):
        import jax
        import jax.sharding as jsh

        from pixel_heal_thyself_tpu.data.dataset import DeviceLoader

        mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
        sharding = jsh.NamedSharding(mesh, jsh.PartitionSpec("data"))
        dev = DeviceLoader(
            store, batch_size=4, shuffle=True, seed=3,
            drop_last=True, device=sharding,
        )
        host = PrefetchLoader(
            store, batch_size=4, shuffle=True, seed=3, drop_last=True,
        )
        for hb, db in zip(host, dev, strict=True):
            assert db["noisy"].sharding.is_equivalent_to(sharding, 4)
            for key in PatchDataset.KEYS:
                np.testing.assert_array_equal(
                    np.asarray(hb[key]), np.asarray(db[key]),
                )

    def test_nbytes_and_arrays(self, store):
        arrays = store.arrays()
        assert store.nbytes == sum(v.nbytes for v in arrays.values())
