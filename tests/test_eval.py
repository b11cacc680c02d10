"""Evaluator tests: VOC mAP golden cases + COCO stat sanity."""
import os

import numpy as np
import pytest

from transparent_object_detection_tpu.eval.coco_map import coco_eval
from transparent_object_detection_tpu.eval.voc_map import voc_ap, voc_map


def det(rows):
    return np.asarray(rows, dtype=np.float64).reshape(-1, 6)


def gt(rows):
    return np.asarray(rows, dtype=np.float64).reshape(-1, 5)


def test_voc_ap_perfect():
    # One class, one image, exact match -> AP 1.
    ap = voc_ap(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(1.0)


def test_voc_map_perfect_detection():
    d = [det([[10, 10, 50, 50, 0.9, 0]])]
    g = [gt([[10, 10, 50, 50, 0]])]
    m, per = voc_map(d, g, num_classes=1)
    assert m == pytest.approx(1.0)
    assert per[0].num_gt == 1 and per[0].f1 == pytest.approx(1.0)


def test_voc_map_miss():
    d = [det([[200, 200, 250, 250, 0.9, 0]])]
    g = [gt([[10, 10, 50, 50, 0]])]
    m, per = voc_map(d, g, num_classes=1)
    assert m == pytest.approx(0.0)
    assert per[0].lamr == pytest.approx(1.0)


def test_voc_map_half():
    # Two GTs, one matched by a high-score det, one missed; one extra FP.
    d = [det([[10, 10, 50, 50, 0.9, 0], [300, 300, 340, 340, 0.8, 0]])]
    g = [gt([[10, 10, 50, 50, 0], [100, 100, 140, 140, 0]])]
    m, per = voc_map(d, g, num_classes=1)
    # PR: efter det1 -> P=1, R=.5; det2 FP -> P=.5, R=.5  => AP = 0.5
    assert m == pytest.approx(0.5)


def test_voc_map_duplicate_detection_is_fp():
    d = [det([[10, 10, 50, 50, 0.9, 0], [11, 11, 50, 50, 0.8, 0]])]
    g = [gt([[10, 10, 50, 50, 0]])]
    m, per = voc_map(d, g, num_classes=1)
    assert per[0].rec_at_thresh == pytest.approx(1.0)
    assert per[0].prec_at_thresh == pytest.approx(0.5)
    assert m == pytest.approx(1.0)  # AP unaffected by trailing FP at R=1


def test_voc_map_classes_dont_mix():
    d = [det([[10, 10, 50, 50, 0.9, 1]])]  # wrong class
    g = [gt([[10, 10, 50, 50, 0]])]
    m, per = voc_map(d, g, num_classes=2)
    assert m == pytest.approx(0.0)


def test_voc_map_difficult_ignored():
    d = [det([[10, 10, 50, 50, 0.9, 0]])]
    g = [gt([[10, 10, 50, 50, 0]])]
    m, per = voc_map(d, g, num_classes=1, difficult=[np.array([True])])
    assert per[0].num_gt == 0  # difficult GT not counted


def test_coco_eval_perfect():
    d = [det([[10, 10, 50, 50, 0.9, 0]])]
    g = [gt([[10, 10, 50, 50, 0]])]
    out = coco_eval(d, g, num_classes=1)
    assert out["AP"] == pytest.approx(1.0)
    assert out["AP50"] == pytest.approx(1.0)
    assert out["AR100"] == pytest.approx(1.0)


def test_coco_eval_offset_box_passes_50_fails_95():
    # IoU = 1200/2000 = 0.60: counts at 0.5/0.55/0.6, fails at >= 0.65.
    d = [det([[20, 10, 60, 50, 0.9, 0]])]
    g = [gt([[10, 10, 50, 50, 0]])]
    out = coco_eval(d, g, num_classes=1)
    assert out["AP50"] == pytest.approx(1.0)
    assert out["AP75"] == pytest.approx(0.0)
    assert out["AP"] == pytest.approx(0.3, abs=1e-6)  # 3/10 IoU thresholds pass


def test_coco_eval_area_buckets():
    # small GT (16x16=256 < 1024) and large GT (200x200)
    d = [det([[0, 0, 16, 16, 0.9, 0], [100, 100, 300, 300, 0.8, 0]])]
    g = [gt([[0, 0, 16, 16, 0], [100, 100, 300, 300, 0]])]
    out = coco_eval(d, g, num_classes=1)
    assert out["APs"] == pytest.approx(1.0)
    assert out["APl"] == pytest.approx(1.0)
    assert out["APm"] == -1.0  # no medium GT


def test_coco_eval_empty_detections():
    d = [np.zeros((0, 6))]
    g = [gt([[10, 10, 50, 50, 0]])]
    out = coco_eval(d, g, num_classes=1)
    assert out["AP"] == pytest.approx(0.0)


def test_coco_vs_voc_consistency(rng):
    """Random scenes: AP50 from both evaluators should be close (conventions
    differ by the +1-pixel VOC area term only)."""
    dets, gts = [], []
    for _ in range(8):
        n = int(rng.integers(1, 5))
        g_rows = []
        d_rows = []
        for k in range(n):
            x1, y1 = rng.uniform(0, 200, 2)
            w, h = rng.uniform(40, 120, 2)
            g_rows.append([x1, y1, x1 + w, y1 + h, 0])
            if rng.random() < 0.7:  # 70% detected with jitter
                j = rng.uniform(-5, 5, 4)
                d_rows.append(
                    [x1 + j[0], y1 + j[1], x1 + w + j[2], y1 + h + j[3], rng.uniform(0.5, 1), 0]
                )
            if rng.random() < 0.3:  # random FP
                a, b = rng.uniform(300, 400, 2)
                d_rows.append([a, b, a + 50, b + 50, rng.uniform(0.1, 1), 0])
        gts.append(gt(g_rows))
        dets.append(det(d_rows))
    coco = coco_eval(dets, gts, 1)
    vm, _ = voc_map(dets, gts, 1, min_overlap=0.5)
    assert coco["AP50"] == pytest.approx(vm, abs=0.08)


def test_write_results_full_reporting_surface(tmp_path):
    """results.txt + PR curves + per-metric class summary plots
    (the reference utils_map.py:560-721 artifact set)."""
    from transparent_object_detection_tpu.eval.voc_map import voc_map, write_results

    g = np.array([[50, 50, 150, 150, 0]], dtype=float)
    d = np.array([[52, 52, 148, 148, 0.9, 0]], dtype=float)
    mean_ap, results = voc_map([d], [g], 1)
    out = str(tmp_path / "res")
    path = write_results(out, mean_ap, results, ["Transparent"])
    assert os.path.exists(path)
    text = open(path).read()
    assert "Transparent" in text and "LAMR" in text
    for fname in ["pr_Transparent.png", "mAP.png", "F1.png", "Recall.png",
                  "Precision.png", "lamr.png"]:
        assert os.path.exists(os.path.join(out, fname)), fname
