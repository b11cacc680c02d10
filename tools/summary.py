#!/usr/bin/env python
"""Architecture inspection (reference summary.py:9-45): parameter count and
FLOPs from the XLA cost model, plus the module tree."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--phi", default="s", choices=list("nsmlx"))
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--num-classes", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--tabulate", action="store_true", help="print per-module table")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from transparent_object_detection_tpu.config import ModelConfig
    from transparent_object_detection_tpu.models.detector import build_model, init_variables, count_params

    cfg = ModelConfig(num_classes=args.num_classes, phi=args.phi,
                      input_shape=tuple(args.input_shape))
    model = build_model(cfg)

    if args.tabulate:
        h, w = cfg.input_shape
        print(
            model.tabulate(
                jax.random.key(0),
                jnp.zeros((1, h, w, 3), jnp.float32),
                train=False,
                depth=2,
            )
        )

    variables = init_variables(model, cfg)
    h, w = cfg.input_shape

    def forward(images):
        return model.apply(variables, images, train=False)["decoded"]

    lowered = jax.jit(forward).lower(
        jax.ShapeDtypeStruct((args.batch_size, h, w, 3), jnp.float32)
    )
    cost = lowered.cost_analysis() or {}
    n_params = count_params(variables["params"])
    print(f"phi={args.phi} input={cfg.input_shape} classes={args.num_classes}")
    print(f"params:         {n_params / 1e6:.2f} M")
    print(f"flops (XLA):    {float(cost.get('flops', -1)) / 1e9:.2f} G @ batch {args.batch_size}")
    print(f"bytes accessed: {float(cost.get('bytes accessed', -1)) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
