"""Patch dataset + prefetching device feed.

Behavioral spec: reference `pht/models/afgsa/dataset.py:12-46` (lazy h5
dataset of {noisy, gt, aux} HWC float arrays) and
`prefetch_dataloader.py:7-12` + `base_trainer.py:264-321` (shuffled,
seeded, background-prefetched loading).

TPU-first: batches are assembled as pinned contiguous numpy arrays on a
background thread and handed to `jax.device_put` ahead of compute, so the
chip never waits on the host (the per-batch numpy transforms the reference
did on the host run on-device instead, `ops/transforms.py`).
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Iterator

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.logger import logger


class PatchDataset:
    """Random-access view over a {noisy, gt, aux} patch store.

    Stores small enough to fit in host RAM (limit via
    `PHT_DATASET_CACHE_LIMIT_BYTES`, default 16 GiB; `0` disables) are
    loaded once with sequential full-dataset reads — each gzip chunk is
    decompressed exactly once — and batches are then pure numpy gathers.
    Random single-sample h5 reads on legacy auto-chunked stores (chunks
    spanning dozens of samples) were measured at 646 ms/sample, ~400×
    slower than the train step they feed.
    """

    KEYS = ("noisy", "gt", "aux")

    def __init__(
        self, dataset_path: str, cache_in_ram: bool | None = None
    ) -> None:
        if not str(dataset_path).endswith(".h5"):
            raise ValueError("dataset_path must be the path to a .h5 file")
        self.dataset_path = str(dataset_path)
        self._files: dict[int, h5py.File] = {}  # one handle per thread
        self._cache: dict[str, np.ndarray] | None = None
        with h5py.File(self.dataset_path, "r") as f:
            self._len = len(f["aux"])
            nbytes = sum(f[k].dtype.itemsize * np.prod(f[k].shape) for k in self.KEYS)
        logger.info(
            f"Data set {self.dataset_path} has {self._len} samples in total",
        )
        if cache_in_ram is None:
            limit = int(
                os.environ.get(
                    "PHT_DATASET_CACHE_LIMIT_BYTES", str(16 * 1024**3)
                )
            )
            cache_in_ram = 0 < nbytes <= limit
        if cache_in_ram:
            t0 = time.monotonic()
            with h5py.File(self.dataset_path, "r") as f:
                self._cache = {
                    k: np.ascontiguousarray(f[k][:], np.float32)
                    for k in self.KEYS
                }
            logger.info(
                f"Cached {nbytes / 1e9:.2f} GB patch store in RAM "
                f"({time.monotonic() - t0:.1f}s)",
            )

    def __len__(self) -> int:
        return self._len

    @property
    def file(self) -> h5py.File:
        """Lazy per-thread h5 handle (h5py handles are not thread-safe)."""
        tid = threading.get_ident()
        f = self._files.get(tid)
        if f is None:
            f = self._files[tid] = h5py.File(self.dataset_path, "r")
        return f

    def close_thread_handle(self) -> None:
        """Release the calling thread's h5 handle (reader threads are
        recreated every epoch; thread idents are not reused reliably, so
        keyed handles would otherwise accumulate over a long run)."""
        f = self._files.pop(threading.get_ident(), None)
        if f is not None:
            f.close()

    def arrays(self) -> dict[str, np.ndarray]:
        """The full {noisy, gt, aux} store as contiguous fp32 arrays
        (from the RAM cache when present, else one sequential read)."""
        if self._cache is not None:
            return self._cache
        with h5py.File(self.dataset_path, "r") as f:
            return {
                k: np.ascontiguousarray(f[k][:], np.float32)
                for k in self.KEYS
            }

    @property
    def nbytes(self) -> int:
        """Total store size in bytes (fp32), without loading it."""
        with h5py.File(self.dataset_path, "r") as f:
            return int(
                sum(4 * np.prod(f[k].shape) for k in self.KEYS),
            )

    def batch(self, indices: np.ndarray) -> dict[str, np.ndarray]:
        """Gather a batch; h5py wants sorted unique indices for fancy reads."""
        if self._cache is not None:
            return {
                key: np.ascontiguousarray(self._cache[key][indices])
                for key in self.KEYS
            }
        order = np.argsort(indices, kind="stable")
        sorted_idx = indices[order]
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        out = {}
        for key in self.KEYS:
            arr = self.file[key][sorted_idx.tolist()]
            out[key] = np.ascontiguousarray(arr[inv], np.float32)
        return out


class PrefetchLoader:
    """Shuffled (seeded) epoch iterator with background host prefetch and
    device placement."""

    def __init__(
        self,
        dataset: PatchDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int | None = None,
        drop_last: bool = False,
        prefetch: int = 2,
        device=None,
        host_bounds: tuple[int, int] | None = None,
        workers: int = 1,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.device = device
        # multi-host: [lo, hi) rows of each global batch that THIS process
        # reads from disk and feeds to its local devices (disjoint across
        # hosts; the global array is assembled in _put)
        self.host_bounds = host_bounds
        # reader threads (reference used 7 dataloader workers + a prefetch
        # thread, base_trainer.py:270-290; h5 reads release the GIL)
        self.workers = max(1, workers)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _put(self, host: dict[str, np.ndarray]):
        """Place a host batch on devices — via the cross-process assembly
        when this is one host of a multi-process run."""
        if self.device is not None and jax.process_count() > 1:
            from pixel_heal_thyself_tpu.parallel.distributed import put_global

            return put_global(host, self.device)
        if self.device is not None:
            return jax.device_put(host, self.device)
        return jax.device_put(host)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        if self.seed is None:
            # non-deterministic mode: genuinely unseeded (treating None as
            # 0 silently made every "unseeded" run byte-identical)
            return np.random.default_rng().permutation(n)
        return np.random.default_rng(self.seed + self._epoch).permutation(n)

    def _batch_indices(self, indices: np.ndarray, b: int) -> np.ndarray:
        idx = indices[b * self.batch_size : (b + 1) * self.batch_size]
        if self.host_bounds is not None:
            idx = idx[self.host_bounds[0] : self.host_bounds[1]]
        return idx

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        self._epoch += 1
        nb = len(self)
        stop = threading.Event()
        # one bounded queue per worker; batch b is produced by worker
        # b % workers and consumed round-robin, preserving epoch order
        depth = max(1, -(-self.prefetch // self.workers))
        queues = [queue.Queue(maxsize=depth) for _ in range(self.workers)]

        def producer(w: int) -> None:
            try:
                for b in range(w, nb, self.workers):
                    if stop.is_set():
                        return
                    host = self.dataset.batch(self._batch_indices(indices, b))
                    queues[w].put(self._put(host))
                queues[w].put(None)
            except Exception as e:  # surface worker errors to the consumer
                queues[w].put(e)
            finally:
                self.dataset.close_thread_handle()

        threads = [
            threading.Thread(target=producer, args=(w,), daemon=True)
            for w in range(self.workers)
        ]
        for t in threads:
            t.start()
        try:
            for b in range(nb):
                item = queues[b % self.workers].get()
                if isinstance(item, Exception):
                    raise item
                assert item is not None
                yield item
        finally:
            stop.set()
            for qd in queues:  # unblock any producer waiting on a full queue
                while not qd.empty():
                    qd.get_nowait()


class DeviceLoader(PrefetchLoader):
    """Epoch iterator over a patch store cached ON DEVICE (in HBM).

    The host→device link only ever carries the [batch] int32 index array
    (~32 bytes/step); batches are gathered from the resident store by one
    tiny jitted program per step, so the feed runs at HBM speed. This is
    the TPU-native answer to the reference's known input-pipeline
    bottleneck (reference `base_trainer.py:459-467` logs iter/io time
    because its host loader couldn't keep up, SURVEY.md §3.2) — and on a
    relay-attached chip (axon) it removes the host→device batch upload
    entirely (measured in tools/bench_pipeline.py: streamed uploads
    pipeline at best ~40% of the resident step rate).

    Epoch order is byte-identical to `PrefetchLoader` for the same seed
    (same `_epoch_indices`/`_batch_indices`), and the gathered fp32 values
    are the same bytes — training trajectories are unchanged (pinned by
    tests/test_data.py). Single-process only: multi-host runs feed
    disjoint `host_bounds` slices from disk and must keep the host loader.

    `device` may be a `jax.sharding.Sharding` — the store is uploaded
    replicated and each gathered batch is laid out to that sharding by the
    gather program itself (`out_shardings`), so DP meshes shard batches
    exactly like the host loader's `device_put` did.
    """

    def __init__(
        self,
        dataset: PatchDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int | None = None,
        drop_last: bool = False,
        device=None,
    ) -> None:
        super().__init__(
            dataset,
            batch_size,
            shuffle=shuffle,
            seed=seed,
            drop_last=drop_last,
            device=device,
        )
        if jax.process_count() > 1:
            raise ValueError(
                "DeviceLoader is single-process; multi-host runs read "
                "disjoint host_bounds slices and need PrefetchLoader",
            )
        host = dataset.arrays()
        t0 = time.monotonic()
        if device is not None and isinstance(device, jax.sharding.Sharding):
            # replicate the store; gathered batches land on `device` below
            import jax.sharding as jsh

            mesh = device.mesh
            replicated = jsh.NamedSharding(mesh, jsh.PartitionSpec())
            self._store = {k: jax.device_put(v, replicated) for k, v in host.items()}
        elif device is not None:
            self._store = {k: jax.device_put(v, device) for k, v in host.items()}
        else:
            self._store = {k: jax.device_put(v) for k, v in host.items()}
        jax.block_until_ready(self._store)
        nbytes = sum(v.nbytes for v in host.values())
        logger.info(
            f"Cached {nbytes / 1e9:.2f} GB patch store on device "
            f"({time.monotonic() - t0:.1f}s)",
        )
        sharding = device if isinstance(device, jax.sharding.Sharding) else None
        self._gather = jax.jit(
            lambda store, idx: {
                k: jnp.take(v, idx, axis=0) for k, v in store.items()
            },
            out_shardings=sharding,
        )

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        self._epoch += 1
        for b in range(len(self)):
            idx = self._batch_indices(indices, b)
            yield self._gather(self._store, jnp.asarray(idx, jnp.int32))
