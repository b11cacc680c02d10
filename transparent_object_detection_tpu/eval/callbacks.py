"""Training observability callbacks (reference utils/callbacks.py:22-235).

LossHistory: per-epoch train/val loss -> txt logs, loss-curve PNG, and
TensorBoard scalars (tensorboardX when present, silently skipped otherwise).

EvalCallback: every `period` epochs, runs the on-device batched inference
path over the validation set with the EMA weights and computes both the
COCO 12-stat vector (primary, like get_coco_map at callbacks.py:211) and
VOC-style mAP@MINOVERLAP (fallback/secondary), logging epoch_map.txt and a
curve PNG. Unlike the reference — which letterboxes, forwards, decodes and
NMS-es one image at a time on host (callbacks.py:130-178) — this evaluates
whole batches in one compiled program per step.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from transparent_object_detection_tpu.config import ModelConfig, PredictConfig
from transparent_object_detection_tpu.data.annotations import parse_annotation_line
from transparent_object_detection_tpu.eval.coco_map import coco_eval
from transparent_object_detection_tpu.eval.voc_map import voc_map


def _plot(xs, series: Dict[str, list], path: str, xlabel: str, ylabel: str):
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
    except Exception:
        return
    plt.figure()
    for label, ys in series.items():
        plt.plot(xs, ys, linewidth=2, label=label)
    plt.grid(True)
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.legend(loc="upper right")
    plt.savefig(path)
    plt.cla()
    plt.close("all")


class LossHistory:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.losses: List[float] = []
        self.val_losses: List[float] = []
        self.writer = None
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_dir)
        except Exception:
            pass

    def on_epoch_end(self, epoch: int, logs: Dict[str, float], trainer=None, state=None):
        self.append_loss(epoch, logs["loss"], logs["val_loss"])

    def append_loss(self, epoch: int, loss: float, val_loss: float):
        self.losses.append(loss)
        self.val_losses.append(val_loss)
        with open(os.path.join(self.log_dir, "epoch_loss.txt"), "a") as f:
            f.write(f"{loss}\n")
        with open(os.path.join(self.log_dir, "epoch_val_loss.txt"), "a") as f:
            f.write(f"{val_loss}\n")
        if self.writer is not None:
            self.writer.add_scalar("loss", loss, epoch)
            self.writer.add_scalar("val_loss", val_loss, epoch)
        _plot(
            range(len(self.losses)),
            {"train loss": self.losses, "val loss": self.val_losses},
            os.path.join(self.log_dir, "epoch_loss.png"),
            "Epoch",
            "Loss",
        )

    def close(self):
        if self.writer is not None:
            self.writer.close()


class EvalCallback:
    """Periodic mAP evaluation on the validation annotations."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        val_lines: Sequence[str],
        class_names: Sequence[str],
        log_dir: str,
        period: int = 1,
        confidence: float = 0.05,
        nms_iou: float = 0.5,
        max_boxes: int = 100,
        min_overlap: float = 0.5,
        batch_size: int = 8,
        eval_flag: bool = True,
        use_ema: bool = True,
    ):
        self.model_cfg = model_cfg
        self.val_lines = list(val_lines)
        self.class_names = list(class_names)
        self.log_dir = log_dir
        self.period = max(1, period)
        self.min_overlap = min_overlap
        self.batch_size = batch_size
        self.eval_flag = eval_flag
        self.use_ema = use_ema
        self.maps: List[float] = []
        self.epochs: List[int] = []
        os.makedirs(log_dir, exist_ok=True)
        self.predict_cfg = PredictConfig(
            confidence=confidence,
            nms_iou=nms_iou,
            max_detections=max_boxes,
            nms_mode="exact",
            letterbox_image=True,
        )
        self._predictor = None  # reused across epochs: no per-eval re-trace
        # populated by evaluate(): per-image (N,6) dets / (M,5) gts, so
        # callers (tools/get_map.py mode 1) can cache raw detections
        self.last_dets: List[np.ndarray] = []
        self.last_gts: List[np.ndarray] = []

    # -- trainer hook ---------------------------------------------------------

    def on_epoch_end(self, epoch: int, logs: Dict[str, float], trainer=None, state=None):
        if not self.eval_flag or epoch % self.period != 0:
            return
        if self.use_ema and state is not None:
            variables = {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
        elif state is not None:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
        else:
            variables = trainer.variables
        stats = self.evaluate(trainer.model, variables)
        map50 = stats["AP50"] if stats["AP50"] >= 0 else stats["voc_map"]
        self.maps.append(float(map50))
        self.epochs.append(epoch)
        logs["map50"] = float(map50)
        logs["coco_ap"] = float(stats["AP"])
        with open(os.path.join(self.log_dir, "epoch_map.txt"), "a") as f:
            f.write(f"{map50}\n")
        _plot(
            self.epochs,
            {f"mAP@{self.min_overlap}": self.maps},
            os.path.join(self.log_dir, "epoch_map.png"),
            "Epoch",
            "mAP",
        )

    # -- core -------------------------------------------------------------------

    def write_cartucho_dirs(self, dets_all, gts_all, out_root: str) -> None:
        """Dump detection-results/ and ground-truth/ txt dirs in the Cartucho
        format the reference writes (callbacks.py:196-207), for external
        tooling interop."""
        dr = os.path.join(out_root, "detection-results")
        gt = os.path.join(out_root, "ground-truth")
        os.makedirs(dr, exist_ok=True)
        os.makedirs(gt, exist_ok=True)
        for i, (det, g) in enumerate(zip(dets_all, gts_all)):
            with open(os.path.join(dr, f"{i:06d}.txt"), "w") as f:
                for row in det:
                    name = self.class_names[int(row[5])]
                    f.write(f"{name} {row[4]:.6f} {int(row[0])} {int(row[1])} "
                            f"{int(row[2])} {int(row[3])}\n")
            with open(os.path.join(gt, f"{i:06d}.txt"), "w") as f:
                for row in g:
                    name = self.class_names[int(row[4])]
                    f.write(f"{name} {int(row[0])} {int(row[1])} {int(row[2])} "
                            f"{int(row[3])}\n")

    def evaluate(self, model, variables, write_dirs: Optional[str] = None) -> Dict[str, float]:
        """Run batched inference over val_lines and score with COCO + VOC."""
        from transparent_object_detection_tpu.inference import Predictor
        from transparent_object_detection_tpu.utils.image import cvt_color, resize_image
        from PIL import Image
        import jax.numpy as jnp

        if self._predictor is None or self._predictor.model is not model:
            self._predictor = Predictor(model, variables, self.model_cfg, self.predict_cfg)
        else:
            # same compiled program, fresh (EMA) weights
            self._predictor.variables = variables
        predictor = self._predictor
        h, w = self.model_cfg.input_shape
        dets_all: List[np.ndarray] = []
        gts_all: List[np.ndarray] = []

        # Under a registered compute mesh (tools/train.py --data-parallel:
        # this callback's Predictor adopts the training mesh) the compiled
        # batch must divide the data axis — round the batch size UP to the
        # next multiple; the existing tail-padding below absorbs the slack.
        n_shards = predictor.data_shards
        bs = -(-self.batch_size // n_shards) * n_shards
        for start in range(0, len(self.val_lines), bs):
            chunk = self.val_lines[start : start + bs]
            images, shapes, gts = [], [], []
            for line in chunk:
                path, boxes = parse_annotation_line(line)
                img = cvt_color(Image.open(path))
                iw, ih = img.size
                boxed = resize_image(img, (w, h), letterbox_image=True)
                images.append(np.asarray(boxed, dtype=np.float32) / 255.0)
                shapes.append([ih, iw])
                gts.append(
                    np.concatenate([boxes[:, :4], boxes[:, 4:5]], axis=1)
                    if len(boxes)
                    else np.zeros((0, 5))
                )
            # pad the tail batch to the compiled batch size
            n = len(images)
            while len(images) < bs:
                images.append(np.zeros((h, w, 3), dtype=np.float32))
                shapes.append([h, w])
            out = predictor.detect_letterboxed(
                jnp.asarray(np.stack(images)), jnp.asarray(np.asarray(shapes, np.float32))
            )
            boxes_np = np.asarray(out["boxes"])
            scores_np = np.asarray(out["scores"])
            cls_np = np.asarray(out["classes"])
            valid_np = np.asarray(out["valid"])
            for i in range(n):
                v = valid_np[i]
                dets_all.append(
                    np.concatenate(
                        [boxes_np[i][v], scores_np[i][v, None], cls_np[i][v, None]], axis=1
                    )
                    if v.any()
                    else np.zeros((0, 6))
                )
                gts_all.append(gts[i])

        if write_dirs:
            self.write_cartucho_dirs(dets_all, gts_all, write_dirs)
        self.last_dets, self.last_gts = dets_all, gts_all
        nc = len(self.class_names)
        coco = coco_eval(dets_all, gts_all, nc)
        vmap, _ = voc_map(dets_all, gts_all, nc, self.min_overlap)
        coco["voc_map"] = vmap
        return coco
