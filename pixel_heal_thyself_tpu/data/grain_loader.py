"""Optional Grain-backed input pipeline over the h5 patch store.

The native `PrefetchLoader` (data/dataset.py) is the default feed — a
thread-prefetched h5 reader modeled on the reference's dataloader
(`pht/models/base_trainer.py:264-321`). This module offers the same
iteration contract on top of `grain` (the standard JAX input-pipeline
library): deterministic per-epoch shuffling, threaded reads with an
optional multi-process prefetch stage, and the same device-placement
step. Opt in with `data.loader=grain`.

Contract shared with PrefetchLoader:
- `len(loader)` = number of batches per epoch,
- iterating yields `{noisy, gt, aux}` batches already `device_put` with
  the provided sharding,
- with a seed, epoch k reshuffles with `seed + k` (byte-identical batch
  sequence to PrefetchLoader for the same seed/batch size, tested in
  tests/test_grain_loader.py),
- ragged final batch kept unless `drop_last`.

Multi-host runs use per-host slices of each global batch (PrefetchLoader
`host_bounds`); that assembly is not implemented here — the trainer
rejects `loader=grain` with `parallel.multihost=true`.
"""

from __future__ import annotations

import threading
from typing import Iterator

import h5py
import jax
import numpy as np

try:  # grain is present in current images; keep the import soft anyway
    import grain.python as pygrain

    HAVE_GRAIN = True
except Exception:  # pragma: no cover - exercised only where grain is absent
    pygrain = None
    HAVE_GRAIN = False

from pixel_heal_thyself_tpu.data.dataset import PatchDataset


class _H5RecordSource:
    """`grain.RandomAccessDataSource` over the {noisy, gt, aux} store.

    Opens the h5 file lazily so the source pickles cleanly into grain
    worker processes; each process/thread gets its own handle.
    """

    KEYS = PatchDataset.KEYS

    def __init__(self, path: str, length: int) -> None:
        self._path = path
        self._len = length
        # h5py handles are not thread-safe (see PatchDataset.file), and
        # grain's ReadOptions(num_threads=N) calls __getitem__ from N
        # threads concurrently — keep one handle per thread
        self._local = threading.local()

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        file = getattr(self._local, "file", None)
        if file is None:
            file = h5py.File(self._path, "r")
            self._local.file = file
        i = int(idx)
        return {
            key: np.asarray(file[key][i], np.float32) for key in self.KEYS
        }

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_local"] = None  # handles don't cross process boundaries
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._local = threading.local()

    def __repr__(self) -> str:  # grain logs the source repr
        return f"_H5RecordSource({self._path!r}, n={self._len})"


class _CachedRecordSource:
    """Record source over a `PatchDataset` RAM cache — no h5 reads at all.

    Thread-safe (numpy slicing) but deliberately NOT used with grain
    worker *processes*: pickling would copy the multi-GB cache into every
    worker."""

    KEYS = PatchDataset.KEYS

    def __init__(self, cache: dict[str, np.ndarray], length: int) -> None:
        self._cache = cache
        self._len = length

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        i = int(idx)
        return {key: self._cache[key][i] for key in self.KEYS}

    def __repr__(self) -> str:
        return f"_CachedRecordSource(n={self._len})"


class _FetchRecord(pygrain.MapTransform if HAVE_GRAIN else object):
    """index -> record via the picklable h5 source (survives mp workers)."""

    def __init__(self, source: _H5RecordSource) -> None:
        self.source = source

    def map(self, idx: int) -> dict[str, np.ndarray]:
        return self.source[idx]


class GrainLoader:
    """Grain-powered drop-in for `PrefetchLoader` (single-host)."""

    def __init__(
        self,
        dataset: PatchDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int | None = None,
        drop_last: bool = False,
        device=None,
        workers: int = 0,
        mp_workers: int = 0,
        read_buffer: int = 2,
    ) -> None:
        if not HAVE_GRAIN:
            raise RuntimeError(
                "data.loader=grain requested but the `grain` package is not "
                "importable; use the default native loader",
            )
        if jax.process_count() > 1:
            raise NotImplementedError(
                "GrainLoader is single-host; multi-host runs use the native "
                "PrefetchLoader's per-host batch assembly",
            )
        self.dataset = dataset
        if dataset._cache is not None and mp_workers == 0:
            self.source = _CachedRecordSource(dataset._cache, len(dataset))
        else:
            self.source = _H5RecordSource(dataset.dataset_path, len(dataset))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.device = device
        # grain read threads in the consumer process (h5 reads release the
        # GIL, so threads scale like the native loader's workers)
        self.workers = max(0, workers)
        # optional grain worker PROCESSES; spawned per epoch, so only worth
        # it for very expensive per-record work — off unless asked for
        self.mp_workers = max(0, mp_workers)
        self.read_buffer = max(1, read_buffer)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        """Same shuffle stream as PrefetchLoader._epoch_indices — keeps the
        two loaders byte-interchangeable for a given seed."""
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        if self.seed is None:
            return np.random.default_rng().permutation(n)
        return np.random.default_rng(self.seed + self._epoch).permutation(n)

    def __iter__(self) -> Iterator[dict]:
        order = self._epoch_indices()
        self._epoch += 1
        nb = len(self)

        # Grain's own .shuffle() would re-derive a different permutation;
        # mapping an explicit index MapDataset through the record source
        # keeps determinism identical to the native loader instead.
        idx = [int(i) for i in (order[: nb * self.batch_size] if self.drop_last else order)]
        ds = pygrain.MapDataset.source(idx).map(_FetchRecord(self.source))
        ds = ds.batch(self.batch_size, drop_remainder=self.drop_last)
        it = ds.to_iter_dataset(
            read_options=pygrain.ReadOptions(
                num_threads=max(1, self.workers),
                # grain wants buffer >= threads or reads can't overlap
                prefetch_buffer_size=max(self.read_buffer, self.workers, 1),
            ),
        )
        if self.mp_workers > 0:
            it = it.mp_prefetch(
                pygrain.MultiprocessingOptions(num_workers=self.mp_workers),
            )
        for batch in it:
            host = {k: np.ascontiguousarray(v, np.float32) for k, v in batch.items()}
            if self.device is not None:
                yield jax.device_put(host, self.device)
            else:
                yield jax.device_put(host)
