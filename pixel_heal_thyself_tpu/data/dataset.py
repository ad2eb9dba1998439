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

import queue
import threading
from typing import Iterator

import h5py
import jax
import numpy as np

from pixel_heal_thyself_tpu.logger import logger


class PatchDataset:
    """Random-access view over a {noisy, gt, aux} patch store."""

    KEYS = ("noisy", "gt", "aux")

    def __init__(self, dataset_path: str) -> None:
        if not str(dataset_path).endswith(".h5"):
            raise ValueError("dataset_path must be the path to a .h5 file")
        self.dataset_path = str(dataset_path)
        self._file: h5py.File | None = None
        with h5py.File(self.dataset_path, "r") as f:
            self._len = len(f["aux"])
        logger.info(
            f"Data set {self.dataset_path} has {self._len} samples in total",
        )

    def __len__(self) -> int:
        return self._len

    @property
    def file(self) -> h5py.File:
        if self._file is None:
            self._file = h5py.File(self.dataset_path, "r")
        return self._file

    def batch(self, indices: np.ndarray) -> dict[str, np.ndarray]:
        """Gather a batch; h5py wants sorted unique indices for fancy reads."""
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
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.device = device
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        seed = (self.seed or 0) + self._epoch
        return np.random.default_rng(seed).permutation(n)

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        self._epoch += 1
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer() -> None:
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    idx = indices[b * self.batch_size : (b + 1) * self.batch_size]
                    host = self.dataset.batch(idx)
                    batch = (
                        jax.device_put(host, self.device)
                        if self.device is not None
                        else jax.device_put(host)
                    )
                    q.put(batch)
                q.put(None)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
