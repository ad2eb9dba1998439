"""GrainLoader: byte-interchangeability with the native PrefetchLoader.

The Grain pipeline is an opt-in alternative feed (`data.loader=grain`,
ROADMAP item) — these tests pin the contract the trainer relies on:
identical epoch order for a given seed, same length semantics, same
drop_last behavior, and working multi-thread / multi-process reads.
"""

from __future__ import annotations

import h5py
import numpy as np
import pytest

from pixel_heal_thyself_tpu.data.dataset import PatchDataset, PrefetchLoader

pygrain = pytest.importorskip("grain.python")

from pixel_heal_thyself_tpu.data.grain_loader import GrainLoader  # noqa: E402


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    """Tiny {noisy, gt, aux} h5 patch store (10 samples of 8x8)."""
    path = tmp_path_factory.mktemp("grain_store") / "train.h5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        f.create_dataset("noisy", data=rng.random((10, 8, 8, 3), np.float32))
        f.create_dataset("gt", data=rng.random((10, 8, 8, 3), np.float32))
        f.create_dataset("aux", data=rng.random((10, 8, 8, 7), np.float32))
    return str(path)


def _materialize(loader):
    return [{k: np.asarray(v) for k, v in b.items()} for b in loader]


def test_matches_prefetch_loader_across_epochs(store):
    ds = PatchDataset(store)
    native = PrefetchLoader(ds, batch_size=4, shuffle=True, seed=11)
    grain = GrainLoader(ds, batch_size=4, shuffle=True, seed=11)
    assert len(native) == len(grain) == 3
    for _ in range(2):  # epoch k reshuffles with seed + k in both
        nb, gb = _materialize(native), _materialize(grain)
        assert len(nb) == len(gb) == 3
        for a, b in zip(nb, gb, strict=True):
            for key in PatchDataset.KEYS:
                np.testing.assert_array_equal(a[key], b[key])


def test_drop_last_and_len(store):
    ds = PatchDataset(store)
    keep = GrainLoader(ds, batch_size=4, seed=0, drop_last=False)
    drop = GrainLoader(ds, batch_size=4, seed=0, drop_last=True)
    assert len(keep) == 3 and len(drop) == 2
    kb, db = _materialize(keep), _materialize(drop)
    assert [b["gt"].shape[0] for b in kb] == [4, 4, 2]
    assert [b["gt"].shape[0] for b in db] == [4, 4]
    for a, b in zip(kb[:2], db, strict=False):
        np.testing.assert_array_equal(a["gt"], b["gt"])


def test_unshuffled_is_sequential(store):
    ds = PatchDataset(store)
    loader = GrainLoader(ds, batch_size=10, shuffle=False)
    (batch,) = _materialize(loader)
    with h5py.File(store, "r") as f:
        np.testing.assert_array_equal(batch["noisy"], f["noisy"][:])


def test_read_threads_preserve_order(store):
    ds = PatchDataset(store)
    one = GrainLoader(ds, batch_size=2, seed=7, workers=1)
    four = GrainLoader(ds, batch_size=2, seed=7, workers=4)
    for a, b in zip(_materialize(one), _materialize(four), strict=True):
        np.testing.assert_array_equal(a["gt"], b["gt"])


def test_h5_source_concurrent_thread_reads(store):
    # grain's ReadOptions(num_threads=N) hits the record source from N
    # threads at once; the source must keep one h5 handle per thread
    # (h5py handles are not thread-safe)
    import threading

    from pixel_heal_thyself_tpu.data.grain_loader import _H5RecordSource

    with h5py.File(store, "r") as f:
        expect = {k: np.asarray(f[k]) for k in PatchDataset.KEYS}
    src = _H5RecordSource(store, len(expect["noisy"]))
    errors: list[Exception] = []

    def hammer():
        try:
            for _ in range(20):
                for i in range(len(src)):
                    rec = src[i]
                    for k in PatchDataset.KEYS:
                        np.testing.assert_array_equal(rec[k], expect[k][i])
        except Exception as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # distinct handles per thread, and the source still pickles
    import pickle

    clone = pickle.loads(pickle.dumps(src))
    assert np.asarray(clone[0]["gt"]).shape == expect["gt"][0].shape


@pytest.mark.slow
def test_mp_prefetch_preserves_order(store):
    ds = PatchDataset(store)
    plain = GrainLoader(ds, batch_size=2, seed=3)
    mp = GrainLoader(ds, batch_size=2, seed=3, mp_workers=2)
    for a, b in zip(_materialize(plain), _materialize(mp), strict=True):
        np.testing.assert_array_equal(a["gt"], b["gt"])
