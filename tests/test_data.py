"""Data pipeline tests: annotations, augmentation, dataset, loader.

Uses a synthetic 2-image fixture written to tmp_path (the fake-dataset
strategy from SURVEY.md §4/§7).
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

from transparent_object_detection_tpu.data import (
    DataLoader,
    DetectionDataset,
    coco_category_remap,
    coco_to_annotation_lines,
    collate,
    parse_annotation_line,
)
from transparent_object_detection_tpu.data.augment import (
    hsv_jitter,
    letterbox_deterministic,
    mixup,
    mosaic4,
    random_affine,
)


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    """Two synthetic images with one colored rectangle each + annotations."""
    root = tmp_path_factory.mktemp("fakeds")
    lines = []
    rects = [(20, 30, 80, 90), (10, 10, 50, 60)]
    sizes = [(160, 120), (100, 140)]  # (w, h)
    for i, ((x1, y1, x2, y2), (w, h)) in enumerate(zip(rects, sizes)):
        arr = np.full((h, w, 3), 200, dtype=np.uint8)
        arr[y1:y2, x1:x2] = (255, 0, 0)
        p = str(root / f"img{i}.png")
        Image.fromarray(arr).save(p)
        lines.append(f"{p} {x1},{y1},{x2},{y2},0")
    return lines


def test_parse_annotation_line(fake_dataset):
    path, boxes = parse_annotation_line(fake_dataset[0])
    assert os.path.exists(path)
    assert boxes.shape == (1, 5)
    np.testing.assert_allclose(boxes[0], [20, 30, 80, 90, 0])


def test_parse_bare_line():
    path, boxes = parse_annotation_line("/x/y.png")
    assert boxes.shape == (0, 5)


def test_letterbox_deterministic_box_mapping(fake_dataset):
    from transparent_object_detection_tpu.data.augment import load_rgb

    path, boxes = parse_annotation_line(fake_dataset[0])
    img = load_rgb(path)
    canvas, out = letterbox_deterministic(img, boxes, (64, 64))
    assert canvas.shape == (64, 64, 3)
    assert len(out) == 1
    # 160x120 -> scale .4 -> 64x48, dy = 8
    np.testing.assert_allclose(
        out[0, :4], [20 * 0.4, 30 * 0.4 + 8, 80 * 0.4, 90 * 0.4 + 8], atol=1.0
    )


def test_random_affine_boxes_in_canvas(fake_dataset, rng):
    from transparent_object_detection_tpu.data.augment import load_rgb

    path, boxes = parse_annotation_line(fake_dataset[0])
    img = load_rgb(path)
    for _ in range(10):
        canvas, out, _ = random_affine(img, boxes, (96, 96), rng)
        assert canvas.shape == (96, 96, 3)
        if len(out):
            assert np.all(out[:, 0] >= 0) and np.all(out[:, 2] <= 96)
            assert np.all(out[:, 1] >= 0) and np.all(out[:, 3] <= 96)
            assert np.all(out[:, 2] > out[:, 0]) and np.all(out[:, 3] > out[:, 1])


def test_hsv_jitter_preserves_shape_dtype(rng):
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    out = hsv_jitter(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_mosaic4(fake_dataset, rng):
    from transparent_object_detection_tpu.data.augment import load_rgb

    imgs, boxes = [], []
    for line in (fake_dataset * 2)[:4]:
        p, b = parse_annotation_line(line)
        imgs.append(load_rgb(p))
        boxes.append(b)
    canvas, out = mosaic4(imgs, boxes, (128, 128), rng)
    assert canvas.shape == (128, 128, 3)
    if len(out):
        assert np.all(out[:, 2] > out[:, 0]) and np.all(out[:, 3] > out[:, 1])
        assert np.all(out[:, :4] >= 0) and np.all(out[:, :4] <= 128)


def test_mixup_union():
    i1 = np.zeros((8, 8, 3), dtype=np.uint8)
    i2 = np.full((8, 8, 3), 200, dtype=np.uint8)
    b1 = np.array([[0, 0, 4, 4, 0]], dtype=np.float32)
    b2 = np.array([[4, 4, 8, 8, 1]], dtype=np.float32)
    img, boxes = mixup(i1, b1, i2, b2)
    assert img[0, 0, 0] == 100
    assert boxes.shape == (2, 5)


def test_dataset_fixed_shapes_train_and_eval(fake_dataset):
    for train in (True, False):
        ds = DetectionDataset(
            fake_dataset, input_shape=(64, 64), train=train, max_boxes=16, epoch_length=10
        )
        ds.epoch_now = 0
        s = ds[0]
        assert s["image"].shape == (64, 64, 3) and s["image"].dtype == np.float32
        assert s["boxes"].shape == (16, 4)
        assert s["labels"].shape == (16,)
        assert 0 <= float(s["image"].max()) <= 1.0
        n = int(s["num_boxes"])
        if n:
            b = s["boxes"][:n]
            assert np.all(b >= 0) and np.all(b <= 1)
            assert np.all(b[:, 2] > 0) and np.all(b[:, 3] > 0)


def test_dataset_mosaic_phase_out(fake_dataset):
    ds = DetectionDataset(
        fake_dataset,
        input_shape=(64, 64),
        train=True,
        mosaic=True,
        mosaic_prob=1.0,
        mixup=False,
        epoch_length=10,
        special_aug_ratio=0.5,
        max_boxes=16,
    )
    # epoch beyond phase-out: identical to single-image pipeline determinism
    ds.epoch_now = 9
    s_late = ds[0]
    assert int(s_late["num_boxes"]) >= 0  # runs the non-mosaic path
    ds2 = DetectionDataset(
        fake_dataset,
        input_shape=(64, 64),
        train=True,
        mosaic=False,
        mixup=False,
        epoch_length=10,
        max_boxes=16,
    )
    ds2.epoch_now = 9
    s_ref = ds2[0]
    np.testing.assert_array_equal(s_late["image"], s_ref["image"])


def test_dataset_reproducible(fake_dataset):
    ds = DetectionDataset(fake_dataset, input_shape=(64, 64), train=True, max_boxes=16)
    ds.epoch_now = 3
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["boxes"], b["boxes"])


def test_loader_batches(fake_dataset):
    ds = DetectionDataset(
        fake_dataset * 4, input_shape=(64, 64), train=True, max_boxes=16, epoch_length=10
    )
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    dl.set_epoch(0)
    batches = list(dl)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (4, 64, 64, 3)
        assert b["boxes"].shape == (4, 16, 4)
        assert b["labels"].shape == (4, 16)
        assert b["num_boxes"].shape == (4,)


def test_loader_sharding(fake_dataset):
    ds = DetectionDataset(fake_dataset * 8, input_shape=(64, 64), train=False, max_boxes=8)
    shards = []
    for sid in range(2):
        dl = DataLoader(
            ds, batch_size=2, shuffle=True, num_workers=1, shard_id=sid, num_shards=2, seed=7
        )
        dl.set_epoch(1)
        idx = dl._epoch_indices()
        shards.append(set(int(i) for i in idx))
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0]) == len(shards[1]) == 8


def test_coco_converter(tmp_path):
    coco = {
        "images": [
            {"id": 1, "file_name": "a.jpg"},
            {"id": 2, "file_name": "b.jpg"},
        ],
        "annotations": [
            {"image_id": 1, "category_id": 7, "bbox": [10, 20, 30, 40], "iscrowd": 0},
            {"image_id": 1, "category_id": 99, "bbox": [1, 2, 3, 4], "iscrowd": 0},
            {"image_id": 2, "category_id": 7, "bbox": [5, 5, 10, 10], "iscrowd": 1},
        ],
        "categories": [{"id": 7, "name": "x"}, {"id": 99, "name": "y"}],
    }
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(coco))
    lines = coco_to_annotation_lines(str(p), "/imgs")
    assert lines[0] == "/imgs/a.jpg 10,20,40,60,0 1,2,4,6,1"
    assert lines[1] == "/imgs/b.jpg"  # crowd skipped
    assert coco_category_remap(coco["categories"]) == {7: 0, 99: 1}


# ---------------------------------------------------------------- sharding
def _many_lines(fake_dataset, n=16):
    # reuse the two fixture images with distinct boxes so indices are many
    lines = []
    for i in range(n):
        path = fake_dataset[i % 2].split()[0]
        lines.append(f"{path} {10 + i},10,{30 + i},40,0")
    return lines


def test_loader_shards_disjoint_and_covering(fake_dataset):
    """Multi-host sharding semantics (the DistributedSampler analog,
    reference train.py:389-404): per epoch, shards are pairwise disjoint and
    their union covers the even split of the dataset."""
    lines = _many_lines(fake_dataset, 16)
    loaders = [
        DataLoader(
            DetectionDataset(lines, input_shape=(64, 64), train=False, max_boxes=4),
            batch_size=2, shuffle=True, num_workers=1, seed=11,
            shard_id=s, num_shards=4,
        )
        for s in range(4)
    ]
    for epoch in (0, 3):
        shard_indices = []
        for ld in loaders:
            ld.set_epoch(epoch)
            shard_indices.append(set(ld._epoch_indices().tolist()))
        # disjoint
        for a in range(4):
            for b in range(a + 1, 4):
                assert not (shard_indices[a] & shard_indices[b])
        # covering the even split
        assert set().union(*shard_indices) == set(range(16))
        # equal per-shard load (no straggler host)
        assert {len(s) for s in shard_indices} == {4}
    # shuffle must actually change composition between epochs
    loaders[0].set_epoch(0)
    e0 = loaders[0]._epoch_indices().tolist()
    loaders[0].set_epoch(1)
    e1 = loaders[0]._epoch_indices().tolist()
    assert e0 != e1


def test_loader_shards_remainder_truncated(fake_dataset):
    # 10 items over 4 shards -> 2 each, remainder dropped (even split)
    lines = _many_lines(fake_dataset, 10)
    sets = []
    for s in range(4):
        ld = DataLoader(
            DetectionDataset(lines, input_shape=(64, 64), train=False, max_boxes=4),
            batch_size=1, shuffle=False, num_workers=1, shard_id=s, num_shards=4,
        )
        sets.append(set(ld._epoch_indices().tolist()))
    assert {len(x) for x in sets} == {2}
    assert len(set().union(*sets)) == 8


def test_loader_shards_feed_mesh(fake_dataset):
    """Integration: per-shard loader batches concatenate to the global batch
    and land sharded on the 8-device mesh (single-process multi-host analog)."""
    import jax
    import jax.numpy as jnp

    from transparent_object_detection_tpu.parallel import batch_sharding, make_mesh

    lines = _many_lines(fake_dataset, 16)
    num_shards = 8
    per_shard_bs = 2
    batches = []
    for s in range(num_shards):
        ld = DataLoader(
            DetectionDataset(lines, input_shape=(64, 64), train=False, max_boxes=4),
            batch_size=per_shard_bs, shuffle=True, num_workers=1, seed=11,
            shard_id=s, num_shards=num_shards,
        )
        ld.set_epoch(0)
        batches.append(next(iter(ld)))
    global_batch = {
        k: np.concatenate([b[k] for b in batches]) for k in batches[0]
    }
    assert global_batch["image"].shape[0] == num_shards * per_shard_bs

    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    device_batch = jax.device_put(jnp.asarray(global_batch["image"]), sharding)
    assert len(device_batch.addressable_shards) == 8
    total = jax.jit(lambda x: x.sum())(device_batch)
    np.testing.assert_allclose(
        float(total), float(global_batch["image"].sum()), rtol=1e-5
    )


def test_process_pool_loader_matches_threaded(fake_dataset):
    """use_processes=True (the multi-core feed path for pod-scale serving,
    docs/ROADMAP.md host-feed requirement) yields bit-identical batches to
    the threaded loader: per-sample RNG is keyed on (seed, epoch, index),
    and the uint8 IPC re-pack is lossless (pixels are exact k/255)."""
    ds = DetectionDataset(
        fake_dataset * 4, input_shape=(64, 64), train=True, max_boxes=16,
        epoch_length=10,
    )
    dl_t = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=5)
    dl_p = DataLoader(
        ds, batch_size=4, shuffle=True, num_workers=2, seed=5, use_processes=True
    )
    for epoch in (0, 1):
        dl_t.set_epoch(epoch)
        ref = list(dl_t)
        dl_p.set_epoch(epoch)
        got = list(dl_p)
        assert len(ref) == len(got) == 2
        for rb, gb in zip(ref, got):
            for key in rb:
                np.testing.assert_array_equal(rb[key], gb[key])
