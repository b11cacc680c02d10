"""Threaded batch loader with device prefetch (double buffering).

Replaces torch DataLoader + pin_memory (train.py:406-412) with a
thread-pool pipeline feeding `jax.device_put` ahead of consumption, so the
TPU never waits on host augmentation. cv2/numpy release the GIL in the hot
paths, making threads (not processes) the right concurrency primitive here —
no pickling, shared memory for free.

Shuffling is seeded per epoch (the DistributedSampler.set_epoch analog,
train.py:458); under a data-parallel mesh pass shard_id/num_shards to give
each host its slice.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np

from transparent_object_detection_tpu.data.dataset import DetectionDataset, collate


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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
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
