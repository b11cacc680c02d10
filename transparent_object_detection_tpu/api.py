"""FOCUS — the top-level object API.

Rebuild of the reference FOCUS class (model.py:17-337) plus the
capabilities predict.py dispatches to (predict/video/fps/dir/heatmap/export,
predict.py:90-186) — with the API drift repaired (bug B7: predict.py calls
detect_image/get_FPS/... that the reference never defines; here every
advertised method exists and is tested).

One unambiguous import path (repairs bug B6):

    from transparent_object_detection_tpu import FOCUS
    f = FOCUS(phi="s", classes_path="model_data/coco_classes.txt")
    f.train("dataset/")          # train.txt / val.txt inside
    f.predict("image.jpg")       # extension dispatch
    f.export("model.stablehlo")  # serialized XLA program (ONNX analog)
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from transparent_object_detection_tpu.config import (
    ModelConfig,
    PredictConfig,
    TrainConfig,
)
from transparent_object_detection_tpu.utils.common import get_classes, seed_everything, show_config

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}
VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm"}


class FOCUS:
    def __init__(
        self,
        phi: str = "s",
        model_path: Optional[str] = None,
        classes_path: str = "model_data/coco_classes.txt",
        input_shape: Tuple[int, int] = (640, 640),
        compute_dtype: str = "bfloat16",
        int8: bool = False,
        predict_cfg: Optional[PredictConfig] = None,
        seed: int = 11,
        verbose: bool = True,
    ):
        """int8=True enables the quantized serving path (fused int8 TEB
        projections + int8 flash attention, ops/quant_matmul.py /
        ops/attention_int8.py). The parameter tree is identical to the bf16
        model, so any trained checkpoint loads unchanged; validated at zero
        mAP drift (benchmarks/validate_e2e.py E2E_INT8=1). Serving-only —
        training via this object always runs the bf16 path."""
        from transparent_object_detection_tpu.models.detector import build_model, init_variables

        self.class_names, self.num_classes = get_classes(classes_path)
        self.model_cfg = ModelConfig(
            num_classes=self.num_classes,
            phi=phi,
            input_shape=tuple(input_shape),
            compute_dtype=compute_dtype,
            int8_dense=int8,
            int8_attn=int8,
            # int8_1x1 stays OFF: per-shape microbenchmarks showed kernel
            # wins, but e2e the bf16 convs' XLA fusion with their BN/SiLU/
            # concat neighbours wins back more (137.4 -> 133-137 measured
            # with it on) — see docs/ROADMAP.md. The ModelConfig knob
            # remains for other scales/hardware.
        )
        self.predict_cfg = predict_cfg or PredictConfig()
        self.seed = seed
        seed_everything(seed)

        self.model = build_model(self.model_cfg)
        self.variables = init_variables(self.model, self.model_cfg, seed)
        if model_path:
            self.load_weights(model_path)
        self._predictor = None
        if verbose:
            show_config(
                phi=phi,
                model_path=model_path,
                classes_path=classes_path,
                input_shape=self.model_cfg.input_shape,
                num_classes=self.num_classes,
                compute_dtype=compute_dtype,
                backend=self._backend(),
            )

    @staticmethod
    def _backend() -> str:
        import jax

        return jax.devices()[0].platform

    # ------------------------------------------------------------------ io

    def load_weights(self, path: str, partial: bool = True) -> None:
        """Orbax checkpoint load with shape-filtered partial semantics
        (reference train.py:224-239)."""
        from transparent_object_detection_tpu.train.checkpoints import (
            CheckpointManager,
            load_weights_partial,
        )

        ckpt = CheckpointManager(os.path.dirname(os.path.abspath(path)) or ".")
        tree = ckpt.load_tree(os.path.abspath(path))
        if partial:
            merged, loaded, skipped = load_weights_partial(self.variables, tree)
            self.variables = merged
            print(f"loaded {len(loaded)} tensors, skipped {len(skipped)}")
        else:
            self.variables = tree
        self._predictor = None

    def save_weights(self, path: str) -> str:
        from transparent_object_detection_tpu.train.checkpoints import CheckpointManager

        path = os.path.abspath(path)
        ckpt = CheckpointManager(os.path.dirname(path) or ".")
        return ckpt.save_tree(os.path.basename(path), self.variables)

    # ------------------------------------------------------------------ train

    def _annotation_lines(self, dataset_path: str, split: str) -> List[str]:
        """Read {split}.txt inside dataset_path (model.py:326-337)."""
        from transparent_object_detection_tpu.data.annotations import read_annotation_file

        return read_annotation_file(os.path.join(dataset_path, f"{split}.txt"))

    def train(
        self,
        dataset_path: Optional[str] = None,
        train_lines: Optional[Sequence[str]] = None,
        val_lines: Optional[Sequence[str]] = None,
        epochs: int = 100,
        batch_size: int = 16,
        lr: float = 1e-3,
        save_dir: str = "./logs",
        train_cfg: Optional[TrainConfig] = None,
        eval_period: int = 10,
        freeze_train: bool = False,
    ) -> List[Dict[str, float]]:
        """Train on annotation files (reference FOCUS.train, model.py:79-153:
        Adam lr=1e-3, mosaic+mixup 0.5, EMA, LossHistory + EvalCallback,
        save_period=10)."""
        from transparent_object_detection_tpu.eval.callbacks import EvalCallback, LossHistory
        from transparent_object_detection_tpu.train.checkpoints import CheckpointManager
        from transparent_object_detection_tpu.train.trainer import Trainer

        if train_lines is None:
            train_lines = self._annotation_lines(dataset_path, "train")
        if val_lines is None:
            val_lines = self._annotation_lines(dataset_path, "val")

        tc = train_cfg or TrainConfig(
            seed=self.seed,
            init_epoch=0,
            freeze_epoch=0 if not freeze_train else 50,
            unfreeze_epoch=epochs,
            freeze_train=freeze_train,
            freeze_batch_size=batch_size,
            unfreeze_batch_size=batch_size,
            optimizer_type="adam",
            init_lr=lr * 64 / batch_size,  # undo fit_lr batch scaling -> lr
            save_period=10,
            save_dir=save_dir,
            eval_period=eval_period,
        )
        # Training always runs the differentiable bf16 compute path: the
        # int8 projections use round() (zero gradient) and are serving-only.
        # The parameter tree is identical, so the trained weights drop back
        # into this object's (possibly int8) serving model unchanged.
        if self.model_cfg.int8_dense or self.model_cfg.int8_attn or self.model_cfg.int8_1x1:
            import dataclasses

            from transparent_object_detection_tpu.models.detector import build_model

            train_cfg_model = dataclasses.replace(
                self.model_cfg, int8_dense=False, int8_attn=False, int8_1x1=False
            )
            train_model = build_model(train_cfg_model)
            trainer = Trainer(train_cfg_model, tc, model=train_model, variables=self.variables)
        else:
            trainer = Trainer(self.model_cfg, tc, model=self.model, variables=self.variables)
        callbacks = [
            LossHistory(save_dir),
            EvalCallback(
                self.model_cfg,
                val_lines,
                self.class_names,
                save_dir,
                period=tc.eval_period,
                eval_flag=tc.eval_flag,
            ),
        ]
        ckpt = CheckpointManager(save_dir, save_ema=tc.ema)
        history = trainer.fit(train_lines, val_lines, callbacks=callbacks, checkpointer=ckpt)
        # adopt the trained (EMA) weights for subsequent prediction
        self.variables = trainer.ema_variables if tc.ema else trainer.variables
        self._predictor = None
        return history

    def fine_tune(self, dataset_path: Optional[str] = None, epochs: int = 50,
                  lr: float = 1e-4, **kwargs) -> List[Dict[str, float]]:
        """Lower-lr short schedule (reference model.py:155-166)."""
        return self.train(dataset_path=dataset_path, epochs=epochs, lr=lr, **kwargs)

    # ------------------------------------------------------------------ predict

    @property
    def predictor(self):
        if self._predictor is None:
            from transparent_object_detection_tpu.inference import Predictor

            self._predictor = Predictor(
                self.model, self.variables, self.model_cfg, self.predict_cfg
            )
        return self._predictor

    def serve_mesh(self, devices=None, axis_name: str = "data", tp: int = 1):
        """Switch serving to a device mesh.

        tp=1 (default): a 1-D 'data' mesh over all (or the given) devices —
        pure data parallelism. Registers it as the compute mesh so every
        Pallas serving kernel (flash/int8 attention, fused int8 matmul) runs
        under shard_map, and rebuilds the predictor with replicated weights
        + batch-sharded inputs. Aggregate throughput scales as chips x
        per-chip (the serving path has no cross-image communication); the
        reference has no multi-device serving at all (predict.py:16-189).

        tp>1: a 2-D ('data', 'model') mesh with a tp-way model axis — the
        neck TEBs run Megatron tensor-parallel (ops/teb_tp.py) with their
        weights stored sharded, cutting per-chip weight + TEB-activation
        HBM by ~1/tp. This is how phi='l'/'x' (whose 640² serving footprint
        exceeds one chip) run at all; see docs/ROADMAP.md for the HBM
        budget. Batch sizes must divide the data-axis size (devices / tp).

        Returns the mesh-aware Predictor.
        """
        import jax as _jax

        from transparent_object_detection_tpu.inference import Predictor
        from transparent_object_detection_tpu.parallel.mesh import make_mesh
        from transparent_object_detection_tpu.parallel.tp import make_2d_mesh

        devices = devices if devices is not None else _jax.devices()
        if tp > 1:
            mesh = make_2d_mesh(tp, devices)
        else:
            mesh = make_mesh(devices, axis_name)
        self._predictor = Predictor(
            self.model, self.variables, self.model_cfg, self.predict_cfg,
            mesh=mesh,
        )
        return self._predictor

    def predict(self, source: str, **kwargs):
        """Extension dispatch (model.py:168-179): image file -> detections,
        video file -> annotated video, directory -> batch predict."""
        ext = os.path.splitext(source)[1].lower()
        if os.path.isdir(source):
            return self.predict_dir(source, **kwargs)
        if ext in IMAGE_EXTS:
            return self.predict_image(source, **kwargs)
        if ext in VIDEO_EXTS:
            return self.predict_video(source, **kwargs)
        raise ValueError(f"unsupported source {source!r}")

    def detect_image(self, image, draw: bool = False, crop: bool = False,
                     count: bool = False, crop_dir: str = "img_crop"):
        """PIL image (or path) -> detections [{box, score, class}] in original
        pixels; optionally returns (detections, annotated image).

        crop/count mirror the reference detect_image options (predict.py:60-75):
        crop saves each detection's pixels under crop_dir; count prints
        per-class detection counts.
        """
        from PIL import Image

        if isinstance(image, str):
            image = Image.open(image)
        rows = self.predictor.predict_image(image)
        if count:
            tally: Dict[str, int] = {}
            for r in rows:
                name = self.class_names[r["class"]]
                tally[name] = tally.get(name, 0) + 1
            print("class counts:", tally or "{}")
        if crop and rows:
            os.makedirs(crop_dir, exist_ok=True)
            rgb = image.convert("RGB")
            for i, r in enumerate(rows):
                x1, y1, x2, y2 = (int(max(v, 0)) for v in r["box"])
                rgb.crop((x1, y1, x2, y2)).save(
                    os.path.join(crop_dir, f"crop_{i}.png")
                )
        if draw:
            return rows, self.draw_detections(image, rows)
        return rows

    predict_image = detect_image  # reference exposes both spellings (B7)

    def draw_detections(self, image, rows: List[Dict[str, Any]]):
        from PIL import Image, ImageDraw

        img = image.convert("RGB").copy()
        d = ImageDraw.Draw(img)
        for r in rows:
            x1, y1, x2, y2 = r["box"]
            name = self.class_names[r["class"]] if r["class"] < len(self.class_names) else "?"
            d.rectangle([x1, y1, x2, y2], outline=(255, 0, 0), width=2)
            d.text((x1 + 2, max(y1 - 12, 0)), f"{name} {r['score']:.2f}", fill=(255, 0, 0))
        return img

    def predict_dir(self, dir_in: str, dir_out: Optional[str] = None,
                    batch_size: int = 8) -> Dict[str, List[Dict[str, Any]]]:
        """Folder batch prediction (predict.py dir_predict mode) using the
        batched device pipeline; optionally writes annotated images."""
        from PIL import Image

        paths = sorted(
            os.path.join(dir_in, f)
            for f in os.listdir(dir_in)
            if os.path.splitext(f)[1].lower() in IMAGE_EXTS
        )
        results: Dict[str, List[Dict[str, Any]]] = {}
        for p in paths:
            img = Image.open(p)
            rows = self.predictor.predict_image(img)
            results[p] = rows
            if dir_out:
                os.makedirs(dir_out, exist_ok=True)
                self.draw_detections(img, rows).save(
                    os.path.join(dir_out, os.path.basename(p))
                )
        return results

    def predict_video(self, source, output_path: Optional[str] = None,
                      max_frames: Optional[int] = None) -> float:
        """Video/camera loop with FPS overlay (predict.py video mode).
        Returns mean FPS."""
        import cv2
        from PIL import Image

        cap = cv2.VideoCapture(int(source) if str(source).isdigit() else source)
        if not cap.isOpened():
            raise IOError("failed to open video source")
        writer = None
        if output_path:
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            fps_in = cap.get(cv2.CAP_PROP_FPS) or 25.0
            size = (
                int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            )
            writer = cv2.VideoWriter(output_path, fourcc, fps_in, size)
        fps, n = 0.0, 0
        try:
            while True:
                ok, frame = cap.read()
                if not ok or (max_frames is not None and n >= max_frames):
                    break
                t0 = time.time()
                rows = self.predictor.predict_image(
                    Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                )
                fps = 0.9 * fps + 0.1 * (1.0 / max(time.time() - t0, 1e-6)) if n else (
                    1.0 / max(time.time() - t0, 1e-6)
                )
                n += 1
                for r in rows:
                    x1, y1, x2, y2 = map(int, r["box"])
                    cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 0, 255), 2)
                    cv2.putText(
                        frame,
                        f"{self.class_names[r['class']]} {r['score']:.2f}",
                        (x1, max(y1 - 5, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX,
                        0.5,
                        (0, 0, 255),
                        1,
                    )
                cv2.putText(frame, f"fps = {fps:.2f}", (10, 25),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 0), 2)
                if writer is not None:
                    writer.write(frame)
        finally:
            cap.release()
            if writer is not None:
                writer.release()
        return fps

    def get_fps(self, image=None, test_interval: int = 100, batch_size: int = 1) -> float:
        """Latency benchmark (predict.py fps mode / model 'fps' capability):
        mean seconds/inference over test_interval compiled runs."""
        import jax
        import jax.numpy as jnp
        from PIL import Image

        if image is None:
            image = Image.new("RGB", self.model_cfg.input_shape[::-1], (128, 128, 128))
        from transparent_object_detection_tpu.utils.image import cvt_color, resize_image

        h, w = self.model_cfg.input_shape
        boxed = resize_image(cvt_color(image), (w, h), True)
        arr = jnp.asarray(
            np.tile(np.asarray(boxed, np.float32)[None] / 255.0, (batch_size, 1, 1, 1))
        )
        shapes = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (batch_size, 1))
        # value fetch (not just block_until_ready) so relayed/tunneled
        # backends report true round-trip completion
        dets = self.predictor.detect_letterboxed(arr, shapes)  # compile
        float(np.asarray(dets["num_detections"]).sum())
        t0 = time.time()
        for _ in range(test_interval):
            dets = self.predictor.detect_letterboxed(arr, shapes)
        float(np.asarray(dets["num_detections"]).sum())
        return (time.time() - t0) / test_interval

    def detect_heatmap(self, image, out_path: Optional[str] = None) -> np.ndarray:
        """Class-activation heatmap (predict.py heatmap mode)."""
        import jax.numpy as jnp
        from PIL import Image

        if isinstance(image, str):
            image = Image.open(image)
        from transparent_object_detection_tpu.utils.image import cvt_color, resize_image

        h, w = self.model_cfg.input_shape
        boxed = resize_image(cvt_color(image), (w, h), True)
        arr = jnp.asarray(np.asarray(boxed, np.float32)[None] / 255.0)
        heat = np.asarray(self.predictor.class_activation_map(arr))[0]
        if out_path:
            try:
                import matplotlib

                matplotlib.use("Agg")
                from matplotlib import pyplot as plt

                plt.figure()
                plt.imshow(boxed)
                plt.imshow(
                    np.kron(heat, np.ones((8, 8))), alpha=0.5, cmap="jet",
                    extent=(0, w, h, 0),
                )
                plt.axis("off")
                plt.savefig(out_path, bbox_inches="tight")
                plt.close("all")
            except Exception:
                pass
        return heat

    # ------------------------------------------------------------------ eval / export

    def evaluate(self, val_lines: Sequence[str], batch_size: int = 8,
                 confidence: float = 0.001, nms_iou: float = 0.65) -> Dict[str, float]:
        """Standalone COCO-protocol evaluation (dataset/coco/get_map.py:150
        thresholds)."""
        from transparent_object_detection_tpu.eval.callbacks import EvalCallback

        cb = EvalCallback(
            self.model_cfg,
            val_lines,
            self.class_names,
            log_dir=".",
            confidence=confidence,
            nms_iou=nms_iou,
            batch_size=batch_size,
        )
        return cb.evaluate(self.model, self.variables)

    def export(self, path: str) -> str:
        """Serialize the jitted forward+decode program as StableHLO bytes via
        jax.export — the TPU-native analog of export_onnx (model.py:316-324)."""
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        h, w = self.model_cfg.input_shape

        def forward(images):
            return self.model.apply(self.variables, images, train=False)["decoded"]

        exp = jexport.export(jax.jit(forward))(
            jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
        )
        data = exp.serialize()
        with open(path, "wb") as f:
            f.write(data)
        return path

    export_onnx = export  # capability-name alias for reference users

    def fuse(self) -> "FOCUS":
        """Fold BN into convs for deployment (reference BaseModel.fuse,
        base.py:26-33, repaired per bug B1)."""
        from transparent_object_detection_tpu.models.blocks import fuse_conv_bn

        p, s = fuse_conv_bn(self.variables["params"], self.variables["batch_stats"])
        self.variables = {"params": p, "batch_stats": s}
        self._predictor = None
        return self

    def summary(self, batch_size: int = 1) -> Dict[str, float]:
        """Parameter count + analytic FLOPs via XLA cost analysis
        (reference summary.py:9-45, thop x2-MAC convention replaced by the
        compiler's own cost model)."""
        import jax
        import jax.numpy as jnp

        from transparent_object_detection_tpu.models.detector import count_params

        h, w = self.model_cfg.input_shape

        def forward(images):
            return self.model.apply(self.variables, images, train=False)["decoded"]

        lowered = jax.jit(forward).lower(
            jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)
        )
        cost = lowered.cost_analysis() or {}
        out = {
            "params": count_params(self.variables["params"]),
            "flops": float(cost.get("flops", -1.0)),
            "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
        }
        print(
            f"params: {out['params'] / 1e6:.2f}M  "
            f"flops: {out['flops'] / 1e9:.2f}G (batch {batch_size})"
        )
        return out
