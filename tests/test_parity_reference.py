"""Numerical parity vs the *patched* reference loss (torch CPU oracle).

Loads /root/reference/model/loss.py in-process (with a torch shim replacing
its `utils` import, since torchvision is unavailable) and repairs its latent
bugs exactly as SURVEY.md §2.9 prescribes:
  B5: Loss.no / assigner.roll_out / .bs / .n_max_boxes never set -> set them.
  _df_loss broadcasting error -> replaced with the intended per-anchor
  mean-over-4-sides form (upstream ultralytics semantics).

Then feeds identical random head maps + targets to both implementations and
compares the three loss components. Skipped when the reference checkout or
torch is unavailable.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from transparent_object_detection_tpu.train.loss import LossConfig, detection_loss  # noqa: E402

REF = "/root/reference"


def _load_reference_loss():
    """Import reference model.loss with a minimal torch `utils` shim."""
    import importlib.util
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference checkout unavailable")

    shim = types.ModuleType("utils")

    def make_anchors(feats, strides, grid_cell_offset=0.5):
        anchor_points, stride_tensor = [], []
        for i, stride in enumerate(strides):
            _, _, h, w = feats[i].shape
            sx = torch.arange(w, dtype=feats[i].dtype) + grid_cell_offset
            sy = torch.arange(h, dtype=feats[i].dtype) + grid_cell_offset
            sy, sx = torch.meshgrid(sy, sx, indexing="ij")
            anchor_points.append(torch.stack((sx, sy), -1).view(-1, 2))
            stride_tensor.append(torch.full((h * w, 1), float(stride), dtype=feats[i].dtype))
        return torch.cat(anchor_points), torch.cat(stride_tensor)

    def dist2bbox(distance, anchor_points, xywh=True, dim=-1):
        lt, rb = torch.split(distance, 2, dim)
        x1y1 = anchor_points - lt
        x2y2 = anchor_points + rb
        if xywh:
            return torch.cat(((x1y1 + x2y2) / 2, x2y2 - x1y1), dim)
        return torch.cat((x1y1, x2y2), dim)

    shim.make_anchors = make_anchors
    shim.dist2bbox = dist2bbox
    sys.modules["utils"] = shim

    # Load model.loss as part of a real package so its relative import of
    # .base resolves.
    pkg = types.ModuleType("refmodel")
    pkg.__path__ = [f"{REF}/model"]
    sys.modules["refmodel"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refmodel.loss", f"{REF}/model/loss.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refmodel.loss"] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"cannot exec reference loss: {e}")
    return mod


@pytest.fixture(scope="module")
def ref_loss_mod():
    return _load_reference_loss()


def _patched_reference_loss(mod, nc=1, reg_max=16, strides=(8, 16, 32)):
    """Instantiate reference Loss with its latent bugs repaired (B5)."""
    head = types.SimpleNamespace(
        stride=torch.tensor(list(strides), dtype=torch.float32), nc=nc, ch=reg_max
    )
    model = types.SimpleNamespace(head=head)
    crit = mod.Loss(model)
    crit.no = nc + reg_max * 4  # B5
    crit.assigner.roll_out = False  # B5

    def fixed_df_loss(pred_dist, target):
        # intended (ultralytics) semantics: per-anchor mean over 4 sides
        tl = target.long()
        tr = tl + 1
        wl = tr - target
        wr = 1 - wl
        import torch.nn.functional as F

        ce_l = F.cross_entropy(pred_dist, tl.view(-1), reduction="none").view(tl.shape)
        ce_r = F.cross_entropy(pred_dist, tr.view(-1), reduction="none").view(tl.shape)
        return (ce_l * wl + ce_r * wr).mean(-1, keepdim=True)

    crit.bbox_loss._df_loss = staticmethod(fixed_df_loss)
    # reference BboxLoss._df_loss reshapes to (-1, reg_max); route through
    # a wrapper that keeps the (Nfg, 4, reg_max) layout for the fixed fn.
    orig_bbox_loss = crit.bbox_loss

    class FixedBboxLoss(torch.nn.Module):
        def __init__(self, reg_max):
            super().__init__()
            self.reg_max = reg_max

        def forward(self, pred_dist, pred_bboxes, anchor_points, target_bboxes,
                    target_scores, target_scores_sum, fg_mask):
            weight = torch.masked_select(target_scores.sum(-1), fg_mask).unsqueeze(-1)
            iou = mod.bbox_iou(
                pred_bboxes[fg_mask], target_bboxes[fg_mask], xywh=False, CIoU=True
            )
            loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum
            target_ltrb = mod.bbox2dist(anchor_points, target_bboxes, self.reg_max)
            loss_dfl = fixed_df_loss(
                pred_dist[fg_mask].view(-1, self.reg_max + 1), target_ltrb[fg_mask]
            ) * weight
            loss_dfl = loss_dfl.sum() / target_scores_sum
            return loss_iou, loss_dfl

    crit.bbox_loss = FixedBboxLoss(reg_max - 1)
    return crit


def _assigner_state_patch(crit, bs, n_max_boxes):
    crit.assigner.bs = bs
    crit.assigner.n_max_boxes = n_max_boxes


def test_loss_parity_with_patched_reference(ref_loss_mod, rng):
    nc, reg_max = 1, 16
    shapes = ((8, 8), (4, 4), (2, 2))
    strides = (8, 16, 32)
    b = 2
    no = 4 * reg_max + nc

    maps_np = [rng.normal(size=(b, h, w, no)).astype(np.float32) * 0.5 for h, w in shapes]

    # targets: 2 boxes in image 0, 1 box in image 1 (normalized cxcywh)
    t = np.array(
        [
            [0, 0, 0.5, 0.5, 0.5, 0.5],
            [0, 0, 0.25, 0.25, 0.2, 0.3],
            [1, 0, 0.7, 0.6, 0.4, 0.4],
        ],
        dtype=np.float32,
    )

    # --- reference (torch, NCHW) ------------------------------------------
    crit = _patched_reference_loss(ref_loss_mod, nc=nc, reg_max=reg_max, strides=strides)
    feats = [torch.from_numpy(m).permute(0, 3, 1, 2).contiguous() for m in maps_np]
    _assigner_state_patch(crit, bs=b, n_max_boxes=2)
    ref_total = crit(feats, torch.from_numpy(t)).item()

    # --- ours (jax, NHWC, padded targets) ----------------------------------
    m_pad = 2
    boxes = np.zeros((b, m_pad, 4), dtype=np.float32)
    labels = np.zeros((b, m_pad), dtype=np.int32)
    boxes[0, 0] = t[0, 2:]
    boxes[0, 1] = t[1, 2:]
    boxes[1, 0] = t[2, 2:]
    cfg = LossConfig(num_classes=nc, reg_max=reg_max, strides=strides)
    total, comps = detection_loss(
        [jnp.asarray(m) for m in maps_np], jnp.asarray(boxes), jnp.asarray(labels), cfg
    )
    assert float(total) == pytest.approx(ref_total, rel=2e-3), (
        float(total),
        ref_total,
        {k: float(v) for k, v in comps.items()},
    )


def test_iou_parity_with_reference(ref_loss_mod, rng):
    from transparent_object_detection_tpu.ops.geometry import bbox_iou as jax_iou

    b1 = rng.uniform(0, 50, size=(32, 4)).astype(np.float32)
    b1[:, 2:] = b1[:, :2] + rng.uniform(1, 30, size=(32, 2)).astype(np.float32)
    b2 = rng.uniform(0, 50, size=(32, 4)).astype(np.float32)
    b2[:, 2:] = b2[:, :2] + rng.uniform(1, 30, size=(32, 2)).astype(np.float32)

    ref = ref_loss_mod.bbox_iou(
        torch.from_numpy(b1), torch.from_numpy(b2), xywh=False, CIoU=True
    ).squeeze(-1).numpy()
    ours = np.asarray(jax_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=False, kind="ciou"))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
