#!/usr/bin/env python
"""Augmented dataloader throughput (BASELINE.json config 3):
letterbox + mosaic/mixup at 640x640, batch 32.

Generates a synthetic on-disk dataset, then measures imgs/sec through the
full DetectionDataset -> DataLoader pipeline (mosaic+mixup on) and the
native fused letterbox path.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic(root: str, n: int = 64, size=(480, 640)) -> list:
    from PIL import Image

    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        arr = rng.integers(0, 255, size=(*size, 3), dtype=np.uint8)
        p = os.path.join(root, f"s{i}.jpg")
        Image.fromarray(arr).save(p, quality=85)
        boxes = []
        for _ in range(rng.integers(1, 6)):
            x1, y1 = rng.integers(0, size[1] - 60), rng.integers(0, size[0] - 60)
            w, h = rng.integers(30, 60, 2)
            boxes.append(f"{x1},{y1},{x1 + w},{y1 + h},0")
        lines.append(" ".join([p] + boxes))
    return lines


def main():
    from transparent_object_detection_tpu.data import DataLoader, DetectionDataset
    from transparent_object_detection_tpu.data import native

    with tempfile.TemporaryDirectory() as root:
        lines = make_synthetic(root)
        ds = DetectionDataset(
            lines,
            input_shape=(640, 640),
            train=True,
            mosaic=True,
            mosaic_prob=0.5,
            mixup=True,
            mixup_prob=0.5,
            epoch_length=100,
            max_boxes=128,
        )
        dl = DataLoader(ds, batch_size=32, shuffle=True, num_workers=8)
        dl.set_epoch(0)
        # warmup one epoch pass of 2 batches
        it = iter(dl)
        next(it)
        t0 = time.perf_counter()
        n_imgs = 0
        for _ in range(4):
            for batch in dl:
                n_imgs += batch["image"].shape[0]
            dl.set_epoch(dl.epoch + 1)
        dt = time.perf_counter() - t0
        aug_rate = n_imgs / dt

        result = {"augmented_imgs_per_sec": round(aug_rate, 1)}

        # decode-free augmentation throughput: cache_images=True (decoded
        # sources resident), isolating mosaic+mixup+HSV itself
        ds_c = DetectionDataset(
            lines, input_shape=(640, 640), train=True, mosaic=True,
            mosaic_prob=0.5, mixup=True, mixup_prob=0.5, epoch_length=100,
            max_boxes=128, cache_images=True,
        )
        dl_c = DataLoader(ds_c, batch_size=32, shuffle=True, num_workers=8)
        dl_c.set_epoch(0)
        for _ in dl_c:  # warm the cache (first epoch decodes)
            pass
        t0 = time.perf_counter()
        n_imgs = 0
        for _ in range(4):
            dl_c.set_epoch(dl_c.epoch + 1)
            for batch in dl_c:
                n_imgs += batch["image"].shape[0]
        result["augmented_cached_imgs_per_sec"] = round(
            n_imgs / (time.perf_counter() - t0), 1
        )

        # (mode, workers) matrix on the cached path (DL_WORKERS, comma
        # list): one JSON line per cell, cpu_count stamped, so a multi-core
        # host has a ready-made A/B of the threaded pool vs the fork-based
        # process pool (use_processes=True). EXPECTATION on a 1-vCPU rig:
        # processes can only TIE threads (both serialize on the one core;
        # processes add fork+pickle overhead) — the matrix exists so a
        # production host can measure where processes escape the GIL. The
        # per-core rate times available cores sizes a host (a v5e-8 at
        # ~140 imgs/s/chip serving needs ~1,120 imgs/s of feed, i.e. ~12
        # busy cores at the cached rate).
        workers_env = os.environ.get("DL_WORKERS")
        if workers_env:
            ncpu = os.cpu_count()
            sweep = {}
            for mode, use_proc in (("threads", False), ("processes", True)):
                for nw in [int(x) for x in workers_env.split(",")]:
                    dl_w = DataLoader(
                        ds_c, batch_size=32, shuffle=True, num_workers=nw,
                        use_processes=use_proc,
                    )
                    dl_w.set_epoch(100 + nw)  # cache already warm from above
                    next(iter(dl_w))
                    t0 = time.perf_counter()
                    n_imgs = 0
                    for _ in range(2):
                        dl_w.set_epoch(dl_w.epoch + 1)
                        for batch in dl_w:
                            n_imgs += batch["image"].shape[0]
                    rate = round(n_imgs / (time.perf_counter() - t0), 1)
                    sweep[f"{mode}-{nw}"] = rate
                    print(json.dumps({
                        "mode": mode, "workers": nw, "cpu_count": ncpu,
                        "cached_imgs_per_sec": rate,
                    }), flush=True)
            result["cached_imgs_per_sec_by_mode_workers"] = sweep

        # native fused letterbox path (uint8 batch -> float32 canvas)
        if native.available():
            imgs = np.random.default_rng(1).integers(
                0, 255, size=(32, 480, 640, 3), dtype=np.uint8
            )
            native.letterbox_batch_u8(imgs, (640, 640))
            t0 = time.perf_counter()
            for _ in range(10):
                native.letterbox_batch_u8(imgs, (640, 640))
            rate = 320 / (time.perf_counter() - t0)
            result["native_letterbox_imgs_per_sec"] = round(rate, 1)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
