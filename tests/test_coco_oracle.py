"""Protocol validation of eval/coco_map.py against an independent COCOeval
oracle.

pycocotools is not installable in this environment (and the reference
consumes it as a black box at utils/utils_map.py:825-864), so this module
carries a test-only, literal transcription of the published COCOeval bbox
algorithm (per-image greedy matching over dict records + the accumulate()
101-point interpolation, exactly as the pycocotools reference describes it)
written in a deliberately different style from the vectorized production
implementation. Any protocol mismatch in eval/coco_map.py — matching order,
ignore semantics, area-range boundaries, interpolation details — shows up as
a stat-vector difference here.
"""
from __future__ import annotations

import numpy as np
import pytest

from transparent_object_detection_tpu.eval.coco_map import coco_eval

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [
    (0.0, 1e5**2),
    (0.0, 32.0**2),
    (32.0**2, 96.0**2),
    (96.0**2, 1e5**2),
]
MAX_DETS = [1, 10, 100]


def _iou_single(d, g):
    ix = max(0.0, min(d[2], g[2]) - max(d[0], g[0]))
    iy = max(0.0, min(d[3], g[3]) - max(d[1], g[1]))
    inter = ix * iy
    ad = (d[2] - d[0]) * (d[3] - d[1])
    ag = (g[2] - g[0]) * (g[3] - g[1])
    union = ad + ag - inter
    return inter / union if union > 0 else 0.0


def _evaluate_img(dts, gts, a_rng, max_det):
    """COCOeval.evaluateImg, dict-record style. dts/gts: lists of dicts with
    'bbox' (xyxy), 'score' (dts only), 'area'."""
    for g in gts:
        g["_ignore"] = 1 if (g["area"] < a_rng[0] or g["area"] > a_rng[1]) else 0
    gts = sorted(gts, key=lambda g: g["_ignore"])  # python sort is stable
    dts = sorted(dts, key=lambda d: -d["score"])[:max_det]

    T, D, G = len(IOU_THRS), len(dts), len(gts)
    gt_ig = np.array([g["_ignore"] for g in gts]) if G else np.zeros(0)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D))
    for tind, thr in enumerate(IOU_THRS):
        for dind, d in enumerate(dts):
            iou = min(thr, 1 - 1e-10)
            m = -1
            for gind, g in enumerate(gts):
                if gtm[tind, gind] > 0:  # no iscrowd in this pipeline
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                cur = _iou_single(d["bbox"], g["bbox"])
                if cur < iou:
                    continue
                iou = cur
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = m + 1
            gtm[tind, m] = dind + 1
    out = np.array([1 if (d["area"] < a_rng[0] or d["area"] > a_rng[1]) else 0 for d in dts])
    if D:
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.tile(out, (T, 1))))
    return {
        "dtMatches": dtm,
        "dtIgnore": dt_ig,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
    }


def cocoeval_oracle(detections, ground_truths, num_classes):
    """Full COCOeval bbox stats: the published evaluate+accumulate+summarize
    protocol over per-image (N,6)/(M,5) arrays like coco_eval's inputs."""
    T, R, K, A, M = len(IOU_THRS), len(REC_THRS), num_classes, len(AREA_RNGS), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))

    for k in range(K):
        img_records = []
        for det, gt in zip(detections, ground_truths):
            det = np.asarray(det, dtype=float).reshape(-1, 6)
            gt = np.asarray(gt, dtype=float).reshape(-1, 5)
            dts = [
                {
                    "bbox": row[:4],
                    "score": row[4],
                    "area": (row[2] - row[0]) * (row[3] - row[1]),
                }
                for row in det
                if int(row[5]) == k
            ]
            gts = [
                {"bbox": row[:4], "area": (row[2] - row[0]) * (row[3] - row[1])}
                for row in gt
                if int(row[4]) == k
            ]
            img_records.append((dts, gts))

        for a, a_rng in enumerate(AREA_RNGS):
            for m, max_det in enumerate(MAX_DETS):
                E = [
                    _evaluate_img([dict(d) for d in dts], [dict(g) for g in gts], a_rng, max_det)
                    for dts, gts in img_records
                ]
                dt_scores = np.concatenate([np.asarray(e["dtScores"]) for e in E])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate([e["dtMatches"] for e in E], axis=1)[:, inds]
                dt_ig = np.concatenate([e["dtIgnore"] for e in E], axis=1)[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                npig = int(np.count_nonzero(gt_ig == 0))
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros(R)
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    r_inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(r_inds):
                        if pi < len(pr):
                            q[ri] = pr[pi]
                    precision[t, :, k, a, m] = q

    def summarize(ap, iou_thr, a, m):
        if ap:
            s = precision[..., a, m]
            if iou_thr is not None:
                t = int(np.where(np.isclose(IOU_THRS, iou_thr))[0][0])
                s = s[t : t + 1]
        else:
            s = recall[:, :, a, m]
            if iou_thr is not None:
                t = int(np.where(np.isclose(IOU_THRS, iou_thr))[0][0])
                s = s[t : t + 1]
        valid = s[s > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    return [
        summarize(True, None, 0, 2),
        summarize(True, 0.5, 0, 2),
        summarize(True, 0.75, 0, 2),
        summarize(True, None, 1, 2),
        summarize(True, None, 2, 2),
        summarize(True, None, 3, 2),
        summarize(False, None, 0, 0),
        summarize(False, None, 0, 1),
        summarize(False, None, 0, 2),
        summarize(False, None, 1, 2),
        summarize(False, None, 2, 2),
        summarize(False, None, 3, 2),
    ]


def _random_scene(rng, n_imgs, n_classes, max_gt, max_dt, canvas=640.0,
                  jitter=8.0, area_spread=True):
    """GTs + detections that are perturbed/dropped/duplicated GTs plus pure
    noise, spanning small/medium/large areas and score ties."""
    dets, gts = [], []
    for _ in range(n_imgs):
        ng = int(rng.integers(0, max_gt + 1))
        if area_spread:
            sizes = rng.choice([8.0, 24.0, 48.0, 120.0, 200.0], size=ng)
        else:
            sizes = rng.uniform(20, 80, size=ng)
        g = np.zeros((ng, 5))
        for i in range(ng):
            s = sizes[i]
            x = rng.uniform(0, canvas - s)
            y = rng.uniform(0, canvas - s)
            w = s * rng.uniform(0.7, 1.3)
            h = s * rng.uniform(0.7, 1.3)
            g[i] = [x, y, min(x + w, canvas), min(y + h, canvas), rng.integers(0, n_classes)]
        d_rows = []
        for i in range(ng):
            for _ in range(int(rng.integers(0, 3))):  # 0-2 dets per gt
                b = g[i, :4] + rng.normal(0, jitter, 4)
                b = np.array([min(b[0], b[2] - 1), min(b[1], b[3] - 1), max(b[0] + 1, b[2]), max(b[1] + 1, b[3])])
                cls = g[i, 4] if rng.uniform() > 0.15 else rng.integers(0, n_classes)
                score = round(float(rng.uniform(0.05, 1.0)), 2)  # ties likely
                d_rows.append([*b, score, cls])
        for _ in range(int(rng.integers(0, max_dt // 2 + 1))):  # noise dets
            s = float(rng.choice([10.0, 40.0, 150.0]))
            x, y = rng.uniform(0, canvas - s, 2)
            d_rows.append([x, y, x + s, y + s, round(float(rng.uniform()), 2),
                           rng.integers(0, n_classes)])
        d = np.asarray(d_rows, dtype=float).reshape(-1, 6)
        dets.append(d)
        gts.append(g)
    return dets, gts


@pytest.mark.parametrize("seed", range(12))
def test_coco_eval_matches_oracle_random(seed):
    rng = np.random.default_rng(seed)
    n_classes = int(rng.integers(1, 4))
    dets, gts = _random_scene(rng, n_imgs=int(rng.integers(1, 5)),
                              n_classes=n_classes, max_gt=6, max_dt=12)
    got = coco_eval(dets, gts, n_classes)["stats"]
    want = cocoeval_oracle(dets, gts, n_classes)
    np.testing.assert_allclose(got, want, atol=1e-9,
                               err_msg=f"stat vector mismatch (seed={seed})")


def test_coco_eval_matches_oracle_maxdet_overflow():
    """>100 detections in one image exercises the maxDets slicing path."""
    rng = np.random.default_rng(99)
    g = np.array([[100, 100, 180, 180, 0], [300, 300, 500, 500, 0]], dtype=float)
    rows = []
    for _ in range(130):
        b = g[int(rng.integers(0, 2)), :4] + rng.normal(0, 15, 4)
        b = np.array([min(b[0], b[2] - 1), min(b[1], b[3] - 1), max(b[0] + 1, b[2]), max(b[1] + 1, b[3])])
        rows.append([*b, round(float(rng.uniform()), 3), 0])
    dets = [np.asarray(rows)]
    gts = [g]
    got = coco_eval(dets, gts, 1)["stats"]
    want = cocoeval_oracle(dets, gts, 1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_coco_eval_matches_oracle_area_boundaries():
    """GT/det areas exactly at 32^2 and 96^2 — the inclusive-both-ends rule."""
    g = np.array(
        [
            [0, 0, 32, 32, 0],       # area == 1024: small AND medium
            [100, 100, 196, 196, 0], # area == 9216: medium AND large
            [300, 300, 310, 310, 0], # small
        ],
        dtype=float,
    )
    d = np.array(
        [
            [0, 0, 32, 32, 0.9, 0],
            [100, 100, 196, 196, 0.8, 0],
            [300, 300, 310, 310, 0.7, 0],
            [400, 400, 432, 432, 0.6, 0],  # unmatched, area == 1024
        ],
        dtype=float,
    )
    got = coco_eval([d], [g], 1)["stats"]
    want = cocoeval_oracle([d], [g], 1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_coco_eval_matches_oracle_empty_cases():
    # image with no dets; image with no gts; class with no gts anywhere
    g1 = np.array([[10, 10, 60, 60, 0]], dtype=float)
    d1 = np.zeros((0, 6))
    g2 = np.zeros((0, 5))
    d2 = np.array([[10, 10, 60, 60, 0.5, 1]], dtype=float)
    got = coco_eval([d1, d2], [g1, g2], 2)["stats"]
    want = cocoeval_oracle([d1, d2], [g1, g2], 2)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_coco_eval_perfect_detection():
    g = np.array([[50, 50, 150, 150, 0]], dtype=float)
    d = np.array([[50, 50, 150, 150, 1.0, 0]], dtype=float)
    stats = coco_eval([d], [g], 1)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    np.testing.assert_allclose(stats["stats"], cocoeval_oracle([d], [g], 1), atol=1e-9)


# ---------------------------------------------------------------------------
# Adversarial protocol traps. Each case mirrors a specific behavior of the
# published pycocotools source (cocoeval.py at the pycocotools 2.0 line
# numbering): the oracle transcribes it literally, production must agree to
# 1e-9. Key transcription anchors:
#   * gt sorted by _ignore, stable           cocoeval.py:269 (argsort mergesort)
#   * dt sorted by -score, stable, maxDets   cocoeval.py:270-271
#   * greedy loop: thr floor min(t,1-1e-10)  cocoeval.py:276-296
#     - skip gts already matched             cocoeval.py:281-282
#     - stop at ignored gts once a real
#       match exists (gt list is ignore-
#       sorted, so break not continue)       cocoeval.py:284-286
#     - strictly-better iou to switch        cocoeval.py:288-290
#   * unmatched out-of-area dts ignored      cocoeval.py:298-302
#   * accumulate: global stable score sort   cocoeval.py:356-358
#     npig excludes ignored gts              cocoeval.py:360-361
#     monotone precision envelope            cocoeval.py:377-380
#     searchsorted(rc, recThrs, 'left')      cocoeval.py:381-383
# ---------------------------------------------------------------------------


def test_coco_eval_score_ties_stable_order():
    """Equal scores across images: accumulate's mergesort keeps image order,
    and within an image the evaluateImg det order (cocoeval.py:270, 356-358).
    TP/FP alternate under the stable order, so any tiebreak difference in
    the production vectorized sort shifts the PR curve."""
    g1 = np.array([[100, 100, 200, 200, 0]], dtype=float)
    g2 = np.array([[100, 100, 200, 200, 0]], dtype=float)
    # img1: TP then far-off FP, same score; img2: FP then TP, same score
    d1 = np.array(
        [
            [100, 100, 200, 200, 0.5, 0],
            [400, 400, 500, 500, 0.5, 0],
        ],
        dtype=float,
    )
    d2 = np.array(
        [
            [400, 400, 500, 500, 0.5, 0],
            [102, 102, 202, 202, 0.5, 0],
        ],
        dtype=float,
    )
    got = coco_eval([d1, d2], [g1, g2], 1)["stats"]
    want = cocoeval_oracle([d1, d2], [g1, g2], 1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_coco_eval_greedy_match_switches_with_threshold():
    """A higher-score det takes the best-IoU gt (cocoeval.py:288-292),
    leaving a lower-score det to a worse gt; as the threshold rises the
    matches flip one by one. Exercises strictly-better switching and the
    gt-already-matched skip at every threshold."""
    g = np.array(
        [[100, 100, 200, 200, 0], [210, 100, 310, 200, 0]], dtype=float
    )
    d = np.array(
        [
            # score .9: iou ~0.96 with gt2, ~0.0 with gt1 -> takes gt2
            [212, 100, 312, 200, 0.9, 0],
            # score .8: iou ~0.72 with gt1, ~0.3 with gt2(now taken)
            [100, 130, 200, 215, 0.8, 0],
            # score .7: iou ~0.52 with gt1 (taken at low thr -> FP, but
            # at thr where .8-det fails (>0.72), gt1 frees up yet this det
            # also fails -> both FP)
            [100, 148, 200, 225, 0.7, 0],
        ],
        dtype=float,
    )
    got = coco_eval([d], [g], 1)["stats"]
    want = cocoeval_oracle([d], [g], 1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_coco_eval_ignored_gt_break_rule():
    """Once a det holds a real (non-ignored) match, reaching the ignored
    tail of the ignore-sorted gt list BREAKS the search (cocoeval.py:284-286)
    — an ignored gt with higher IoU must NOT steal the det. The small gt is
    out-of-range for the large area band, so in that band it is ignored and
    sorted after the real gt."""
    g = np.array(
        [
            [100, 100, 250, 250, 0],   # large: area 22500
            [300, 300, 316, 316, 0],   # small: area 256 -> ignored in 'large'
        ],
        dtype=float,
    )
    d = np.array(
        [
            # overlaps the small gt perfectly AND the large gt weakly; in
            # the large band the small gt is ignored — det must stick with
            # its first (real) match and break, not switch to iou=1.0
            [300, 300, 316, 316, 0.9, 0],
            [110, 110, 250, 250, 0.8, 0],
        ],
        dtype=float,
    )
    got = coco_eval([d], [g], 1)["stats"]
    want = cocoeval_oracle([d], [g], 1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_coco_eval_maxdets1_with_ignored_gts():
    """maxDets=1 truncation (cocoeval.py:271) interacting with ignore: the
    single surviving (top-score) det matches an area-ignored gt, so AR@1 in
    that band must count it as ignored, not as a miss of the real gt."""
    g = np.array(
        [
            [0, 0, 20, 20, 0],          # area 400: ignored in medium+large
            [100, 100, 180, 180, 0],    # area 6400: medium
        ],
        dtype=float,
    )
    d = np.array(
        [
            [0, 0, 20, 20, 0.95, 0],       # top det -> ignored gt
            [100, 100, 180, 180, 0.90, 0], # truncated away at maxDets=1
        ],
        dtype=float,
    )
    got = coco_eval([d], [g], 1)["stats"]
    want = cocoeval_oracle([d], [g], 1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_coco_eval_duplicate_dets_on_one_gt():
    """Duplicates: first (highest-score) det matches, the rest are FPs at
    every threshold (gtm check, cocoeval.py:281-282)."""
    g = np.array([[50, 50, 150, 150, 0]], dtype=float)
    d = np.array(
        [
            [50, 50, 150, 150, 0.9, 0],
            [51, 51, 151, 151, 0.8, 0],
            [49, 49, 149, 149, 0.7, 0,],
        ],
        dtype=float,
    )
    got = coco_eval([d], [g], 1)["stats"]
    want = cocoeval_oracle([d], [g], 1)
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.slow
def test_coco_eval_property_1000_scenarios():
    """Production == oracle over 1,000 random scenarios (small scenes keep
    the pure-python oracle tractable; ties, area bands, class mismatch and
    noise dets are all present by construction of _random_scene)."""
    failures = []
    for seed in range(1000):
        rng = np.random.default_rng(10_000 + seed)
        n_classes = int(rng.integers(1, 3))
        dets, gts = _random_scene(
            rng, n_imgs=int(rng.integers(1, 4)), n_classes=n_classes,
            max_gt=4, max_dt=8,
        )
        got = np.asarray(coco_eval(dets, gts, n_classes)["stats"])
        want = np.asarray(cocoeval_oracle(dets, gts, n_classes))
        if not np.allclose(got, want, atol=1e-9):
            failures.append((seed, got, want))
    assert not failures, f"{len(failures)} mismatches; first: {failures[0]}"
