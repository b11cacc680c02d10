"""Threaded / multi-process batch loader with device prefetch.

Replaces torch DataLoader + pin_memory (train.py:406-412) with a
thread-pool pipeline feeding `jax.device_put` ahead of consumption, so the
TPU never waits on host augmentation. cv2/numpy release the GIL in the hot
paths, making threads the default concurrency primitive — no pickling,
shared memory for free. The GIL-BOUND sections (python-level box math,
mosaic bookkeeping) cap the threaded loader near one core's rate, so
`use_processes=True` adds a fork-based process pool for multi-core hosts:
workers inherit the dataset (including the decoded-image cache) copy-on-
write at fork, assemble WHOLE batches in-process, and ship them back with
the image payload re-packed as uint8 (exact: pixel values are k/255) to
quarter the IPC bytes.

Shuffling is seeded per epoch (the DistributedSampler.set_epoch analog,
train.py:458); under a data-parallel mesh pass shard_id/num_shards to give
each host its slice.
"""
from __future__ import annotations

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from transparent_object_detection_tpu.data.dataset import DetectionDataset, collate

# Fork-inherited dataset handle for process-pool workers (set just before
# the pool forks in DataLoader.__iter__; never pickled — the decoded-image
# cache rides copy-on-write pages).
_WORKER_DATASET: Optional[DetectionDataset] = None


def _process_batch(batch_idx) -> Dict[str, np.ndarray]:
    """Worker-side: fetch + collate one whole batch; image shipped as uint8
    (values are exact multiples of 1/255, so the round trip is lossless)."""
    ds = _WORKER_DATASET
    batch = collate([ds[int(i)] for i in batch_idx])
    batch["image"] = np.round(batch["image"] * 255.0).astype(np.uint8)
    return batch


def _unpack_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    batch["image"] = np.multiply(
        batch["image"], np.float32(1.0 / 255.0), dtype=np.float32
    )
    return batch


class DataLoader:
    def __init__(
        self,
        dataset: DetectionDataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 11,
        shard_id: int = 0,
        num_shards: int = 1,
        use_processes: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.use_processes = use_processes
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.dataset.epoch_now = epoch

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        # contiguous per-host shard (even split, truncating the remainder)
        per = len(idx) // self.num_shards
        return idx[self.shard_id * per : (self.shard_id + 1) * per]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.use_processes:
            yield from self._iter_processes()
            return
        indices = self._epoch_indices()
        nb = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline batches: submit all sample fetches lazily per batch,
            # keep a small window of in-flight batches
            window = 2
            futures = []

            def submit(bi):
                batch_idx = indices[bi * self.batch_size : (bi + 1) * self.batch_size]
                return [pool.submit(self.dataset.__getitem__, int(i)) for i in batch_idx]

            for bi in range(min(window, nb)):
                futures.append(submit(bi))
            for bi in range(nb):
                samples = [f.result() for f in futures[0]]
                futures.pop(0)
                nxt = bi + window
                if nxt < nb:
                    futures.append(submit(nxt))
                yield collate(samples)

    def _iter_processes(self) -> Iterator[Dict[str, np.ndarray]]:
        """Fork-based process pool: one task per BATCH (amortizes IPC),
        2x workers of batches in flight. The pool is created per epoch so
        forked workers see the current epoch_now (mosaic phase-out state).
        Same batches as the threaded path for a given (seed, epoch): the
        per-sample RNG is keyed on (seed, epoch, index), not on worker
        identity."""
        global _WORKER_DATASET
        indices = self._epoch_indices()
        nb = len(self)
        _WORKER_DATASET = self.dataset
        ctx = multiprocessing.get_context("fork")
        try:
            with ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx
            ) as pool:
                window = max(2, 2 * self.num_workers)
                futures = []

                def submit(bi):
                    batch_idx = indices[
                        bi * self.batch_size : (bi + 1) * self.batch_size
                    ]
                    return pool.submit(_process_batch, list(map(int, batch_idx)))

                for bi in range(min(window, nb)):
                    futures.append(submit(bi))
                for bi in range(nb):
                    batch = futures.pop(0).result()
                    nxt = bi + window
                    if nxt < nb:
                        futures.append(submit(nxt))
                    yield _unpack_batch(batch)
        finally:
            _WORKER_DATASET = None


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator with ahead-of-time jax.device_put.

    With `sharding` (a jax.sharding.Sharding), batches land already laid out
    across the mesh — the SPMD analog of pinned-memory H2D overlap.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def produce():
        # Producer errors (corrupt file, missing image, augmentation bug)
        # must surface in the training loop, not silently truncate the
        # epoch: enqueue the exception and re-raise it consumer-side.
        try:
            for batch in iterator:
                if sharding is not None:
                    batch = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), batch
                    )
                else:
                    batch = jax.tree_util.tree_map(jax.device_put, batch)
                q.put(batch)
        except BaseException as exc:  # noqa: BLE001 - relayed, not swallowed
            q.put(exc)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
