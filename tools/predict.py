#!/usr/bin/env python
"""Prediction driver (reference predict.py:16-189) — all six modes:

  predict      single image (REPL if --source omitted)
  video        video file or camera index, FPS overlay
  fps          latency benchmark over --test-interval runs
  dir_predict  batch a folder
  heatmap      class-activation heatmap
  export       serialize the compiled program (StableHLO; ONNX analog)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["predict", "video", "fps", "dir_predict", "heatmap",
                                    "export"])
    p.add_argument("--source", default=None, help="image/video/dir path or camera index")
    p.add_argument("--output", default=None, help="output path (video/dir/heatmap/export)")
    p.add_argument("--classes", default="model_data/coco_classes.txt")
    p.add_argument("--phi", default="s", choices=list("nsmlx"))
    p.add_argument("--model-path", default=None)
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--confidence", type=float, default=0.5)
    p.add_argument("--nms-iou", type=float, default=0.4)
    p.add_argument("--test-interval", type=int, default=100)
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--int8", action="store_true",
                   help="quantized serving path (int8 TEBs + int8 flash "
                        "attention); same checkpoints, zero measured mAP drift")
    args = p.parse_args()

    from transparent_object_detection_tpu.api import FOCUS
    from transparent_object_detection_tpu.config import PredictConfig

    focus = FOCUS(
        phi=args.phi,
        model_path=args.model_path,
        classes_path=args.classes,
        input_shape=tuple(args.input_shape),
        compute_dtype=args.compute_dtype,
        int8=args.int8,
        predict_cfg=PredictConfig(confidence=args.confidence, nms_iou=args.nms_iou),
    )

    if args.mode == "predict":
        from PIL import Image

        if args.source:
            rows, drawn = focus.detect_image(Image.open(args.source), draw=True)
            out = args.output or "prediction.png"
            drawn.save(out)
            print(f"{len(rows)} detections -> {out}")
            for r in rows:
                print(r)
        else:
            while True:
                path = input("Input image filename (or 'quit'): ").strip()
                if path in ("quit", "exit", ""):
                    break
                try:
                    rows, drawn = focus.detect_image(Image.open(path), draw=True)
                    drawn.show()
                    print(f"{len(rows)} detections")
                except Exception as e:  # noqa: BLE001 - REPL resilience
                    print(f"open/predict failed: {e}")
    elif args.mode == "video":
        fps = focus.predict_video(args.source or 0, args.output)
        print(f"mean fps: {fps:.2f}")
    elif args.mode == "fps":
        from PIL import Image

        img = Image.open(args.source) if args.source else None
        sec = focus.get_fps(img, args.test_interval)
        print(f"{sec:.4f} seconds / image, {1.0 / sec:.2f} FPS @ batch 1")
    elif args.mode == "dir_predict":
        res = focus.predict_dir(args.source or "img/", args.output or "img_out/")
        print(f"predicted {len(res)} images")
    elif args.mode == "heatmap":
        focus.detect_heatmap(args.source, args.output or "heatmap.png")
        print(f"heatmap -> {args.output or 'heatmap.png'}")
    elif args.mode == "export":
        out = focus.export(args.output or "model.stablehlo")
        print(f"exported -> {out}")


if __name__ == "__main__":
    main()
