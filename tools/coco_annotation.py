#!/usr/bin/env python
"""COCO instances json -> per-line txt annotations
(reference dataset/coco/annotation.py:52-109).

    python tools/coco_annotation.py --json instances_train2017.json \
        --image-dir train2017/ --out train.txt
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--keep-crowd", action="store_true")
    args = p.parse_args()

    from transparent_object_detection_tpu.data.annotations import (
        coco_to_annotation_lines,
        write_annotation_file,
    )

    lines = coco_to_annotation_lines(
        args.json, args.image_dir, skip_crowd=not args.keep_crowd
    )
    write_annotation_file(lines, args.out)
    print(f"wrote {len(lines)} lines -> {args.out}")


if __name__ == "__main__":
    main()
