#!/usr/bin/env python
"""Per-shape micro-benchmark of the fused int8 matmul kernel (ops/quant_matmul.py).

Isolates where the 140-240-of-394 TOPS gap lives by timing variants of the
same (M, K, N) TEB projection shapes (phi='s', batch 32):

  QMM_MODE=base     production quant_matmul (prologue + dot + epilogue)
  QMM_MODE=dot      dot + epilogue only — x pre-quantized OUTSIDE the timed
                    region and passed as int8 args (prologue share = base - dot)
  QMM_MODE=dotraw   dot only, raw int32 -> bf16 write (epilogue share)
  QMM_MODE=xla      XLA int8 dot_general + XLA dequant (compiler baseline)
  QMM_MODE=xladot   XLA int8 dot_general alone on PRE-quantized int8 args —
                    the raw MXU int8 rate XLA can reach on this shape
  QMM_MODE=xlafull  XLA int8 dot + the FULL production epilogue (per-row
                    dequant, bias, act, residual, bf16 store) on
                    pre-quantized args — the honest raw-XLA ceiling for the
                    production direct-consumer semantics (r4 VERDICT #4)
  QMM_MODE=direct   the production groups==1 x_quant direct consumer
                    (_qmm_call), layout overridable: QMM_MINNER=0/1,
                    QMM_BM, QMM_BN — the mlp2/attn-out seam sweep harness
  QMM_MODE=bf16     XLA bf16 matmul (the non-quantized reference)

Env: QMM_SHAPES=h2.qkv,h2.ao,... (default: the 6 dominant shapes),
QMM_ITERS (10), QMM_BM/QMM_BN (override the block picker in dot modes). Run ONE mode per process on the
tunneled TPU (runs must stay well under their timeout — see memory notes).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# (tag, M, K, N, ln, act, residual) — phi='s' batch-32 TEB projections
SHAPES = [
    ("h2.qkv", 204800, 1536, 4608, True, None, False),
    ("h2.ao", 204800, 1536, 1536, False, None, True),
    ("h2.mlp1", 204800, 1536, 6144, True, "gelu", False),
    ("h2.mlp2", 204800, 6144, 1536, False, None, True),
    ("h1.qkv", 51200, 2048, 6144, True, None, False),
    ("h1.mlp2", 51200, 8192, 2048, False, None, True),
]


def timed(f, *a, iters=10):
    o = f(*a)
    jax.block_until_ready(o)
    float(jnp.asarray(o).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    float(jnp.asarray(o).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def timed_serial(f, xq, xs, *rest, iters=10):
    """Like timed(), but the calls DEPEND on each other: a scalar from
    call i's output folds into call i+1's row-scales (negligible traffic,
    hard serialization, value-preserving: xs * (1 + o[0,0]*1e-30)), so the
    device cannot overlap call i+1's prologue/DMA warmup with call i's
    drain the way `timed`'s independent dispatches allow (QMM_SERIAL=1).
    Models the in-model regime: TEB calls sit on a serial dependency chain
    inside the compiled step. Dispatch stays ASYNC — a Python loop with no
    per-iter sync and ONE value fetch at the end — so host/tunnel dispatch
    overlaps device execution (a lax.scan wrapper would be cleaner but
    hangs indefinitely at compile on the tunneled axon backend, even at
    toy shapes; the same chain compiles in <1 s on CPU)."""
    fold = jax.jit(lambda c, o: c * (1.0 + o[0, 0].astype(c.dtype) * 1e-30))

    def run():
        c = xs
        for _ in range(iters):
            o = f(xq, c, *rest)
            c = fold(c, o)
        # value fetch, not block_until_ready: on the tunneled backend the
        # latter can return before execution (same reason bench.py
        # fetches num_detections). One fetch RTT per iters-deep chain.
        return float(jnp.asarray(c)[0, 0])

    run()  # warm both programs
    reps = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        reps.append(time.perf_counter() - t0)
    return min(reps) / iters


def _dot_kernel(x_ref, w_ref, ws_ref, o_ref, *, epilogue: bool):
    """Pre-quantized int8 dot (+ dequant epilogue) — no prologue. The x scale
    is a scalar here (vs the production per-row vector — one extra broadcast
    multiply, negligible for timing isolation)."""
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if epilogue:
        o_ref[...] = (
            acc.astype(jnp.float32) * 0.0123 * ws_ref[0:1, :]
        ).astype(o_ref.dtype)
    else:
        o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "epilogue"))
def _dot_call(xq, wq, ws, *, bm, bn, epilogue):
    from jax.experimental.pallas import tpu as pltpu

    m, k = xq.shape
    n = wq.shape[1]
    return pl.pallas_call(
        functools.partial(_dot_kernel, epilogue=epilogue),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((k, bn), lambda mi, ni: (0, ni)),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xq, wq, ws)


def main():
    import numpy as np

    from transparent_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from transparent_object_detection_tpu.ops.quant_matmul import (
        _pick_blocks,
        quant_matmul,
        quantize_weights,
    )

    mode = os.environ.get("QMM_MODE", "base")
    iters = int(os.environ.get("QMM_ITERS", "10"))
    sel = os.environ.get("QMM_SHAPES")
    shapes = SHAPES if not sel else [s for s in SHAPES if s[0] in sel.split(",")]
    # QMM_BATCH rescales the M dim (SHAPES are batch-32 production shapes;
    # QMM_BATCH=1 gives the batch-1 latency shapes — 6400 rows at P3)
    qb = int(os.environ.get("QMM_BATCH", "32"))
    if qb != 32:
        shapes = [
            (tag, m // 32 * qb, k, n, ln, act, residual)
            for tag, m, k, n, ln, act, residual in shapes
        ]

    rng = np.random.default_rng(0)
    for tag, m, k, n, ln, act, residual in shapes:
        x = jnp.asarray(rng.normal(size=(m, k)) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.float32)
        bias = jnp.zeros((n,), jnp.float32)
        res = (
            jnp.asarray(rng.normal(size=(m, n)) * 0.5, jnp.bfloat16)
            if residual else None
        )
        ln_s = jnp.ones((k,), jnp.float32) if ln else None
        ln_b = jnp.zeros((k,), jnp.float32) if ln else None
        tops = 2.0 * m * k * n

        if mode == "base":
            if residual:
                f = jax.jit(lambda x, w, r: quant_matmul(x, w, bias=bias, residual=r))
                t = timed(f, x, w, res, iters=iters)
            else:
                f = jax.jit(
                    lambda x, w: quant_matmul(
                        x, w, bias=bias, ln_scale=ln_s, ln_bias=ln_b, act=act
                    )
                )
                t = timed(f, x, w, iters=iters)
        elif mode == "lnhandoff":
            # The r3 LN handoff pair: *.ao shapes time the ln_quant_out
            # PRODUCER (value + normalized payload + scales epilogue);
            # *.mlp1 shapes time the zero-prologue direct CONSUMER
            # (x_quant_normalized, LN affine folded into weights, quant_out
            # for the mlp2 link). Timed against 'base' these isolate what
            # the handoff buys per shape.
            if residual and not ln:  # attn_out: producer side
                f = jax.jit(
                    lambda x, w, r: quant_matmul(
                        x, w, bias=bias, residual=r, ln_quant_out=True
                    )[1]
                )
                t = timed(f, x, w, res, iters=iters)
            elif ln and act:  # mlp1: consumer side
                xf = x.astype(jnp.float32)
                mu = xf.mean(axis=1, keepdims=True)
                d = xf - mu
                amax = jnp.maximum(jnp.abs(d).max(axis=1, keepdims=True), 1e-12)
                rstd = jax.lax.rsqrt(
                    jnp.maximum((xf * xf).mean(axis=1, keepdims=True) - mu * mu, 0.0)
                    + 1e-6
                )
                payload = jnp.round(d * (127.0 / amax)).astype(jnp.int8)
                scales = (amax / 127.0 * rstd).astype(jnp.float32)
                f = jax.jit(
                    lambda p, s, w: quant_matmul(
                        None, w, bias=bias, ln_scale=ln_s, ln_bias=ln_b,
                        act=act, x_quant=(p, s), x_quant_normalized=True,
                        quant_out=True,
                    )[0]
                )
                t = timed(f, payload, scales, w, iters=iters)
            else:
                continue
        elif mode in ("dot", "dotraw"):
            blocks = _pick_blocks(m, k, n)
            assert blocks, (tag, m, k, n)
            bm, bn = blocks
            bm = int(os.environ.get("QMM_BM", bm))
            bn = int(os.environ.get("QMM_BN", bn))
            wq, ws = quantize_weights(w)

            @jax.jit  # fused: no 5 GB f32 intermediates in HBM
            def _prep(x):
                xf = x.astype(jnp.float32)
                xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
                return jnp.round(xf / xs).astype(jnp.int8)

            xq = _prep(x)
            f = functools.partial(_dot_call, bm=bm, bn=bn, epilogue=mode == "dot")
            t = timed(f, xq, wq, ws, iters=iters)
        elif mode == "xladot":
            wq, ws = quantize_weights(w)

            @jax.jit
            def _prep(x):
                xf = x.astype(jnp.float32)
                xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
                return jnp.round(xf / xs).astype(jnp.int8)

            xq = _prep(x)

            def xla_dot(xq, wq):
                acc = jax.lax.dot_general(
                    xq, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return acc.astype(jnp.bfloat16)

            f = jax.jit(xla_dot)
            t = timed(f, xq, wq, iters=iters)
        elif mode in ("xlafull", "direct"):
            # Both modes time the PRODUCTION direct-consumer semantics
            # (pre-quantized int8 x + per-row scales -> dot -> rank-1
            # dequant -> bias [-> act] [-> +residual] -> bf16), differing
            # only in who runs the dot: XLA's own schedule vs _qmm_call.
            from transparent_object_detection_tpu.ops.quant_matmul import (
                _pick_layout_prequant,
                _qmm_call,
            )

            wq, ws = quantize_weights(w)

            @jax.jit
            def _prep(x):
                xf = x.astype(jnp.float32)
                xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
                return jnp.round(xf / xs).astype(jnp.int8), xs

            xq, xs = _prep(x)
            if mode == "xlafull":

                def xla_full(xq, xs, wq, ws, res=None):
                    acc = jax.lax.dot_general(
                        xq, wq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    out = acc.astype(jnp.float32) * xs * ws + bias
                    if act == "gelu":
                        out = jax.nn.gelu(out)
                    if res is not None:
                        out = out + res.astype(jnp.float32)
                    return out.astype(jnp.bfloat16)

                f = jax.jit(xla_full)
                tfn = (
                    timed_serial
                    if os.environ.get("QMM_SERIAL", "0") == "1"
                    else timed
                )
                t = (
                    tfn(f, xq, xs, wq, ws, res, iters=iters)
                    if residual
                    else tfn(f, xq, xs, wq, ws, iters=iters)
                )
            else:
                layout = _pick_layout_prequant(m, k, n, 1, residual)
                if layout is None:
                    # below the kernel's tiling minimums — production routes
                    # this shape to XLA (QMM_BATCH=1 h1.* rows hit this)
                    print(json.dumps({"tag": tag, "mode": mode,
                                      "skipped": "no kernel layout"}),
                          flush=True)
                    continue
                m_inner, bm, bn = layout
                m_inner = bool(int(os.environ.get("QMM_MINNER", int(m_inner))))
                bm = int(os.environ.get("QMM_BM", bm))
                bn = int(os.environ.get("QMM_BN", bn))
                print(
                    json.dumps(
                        {"tag": tag, "layout": [m_inner, bm, bn]}
                    ),
                    flush=True,
                )
                f = functools.partial(
                    _qmm_call, out_dtype=jnp.bfloat16, bm=bm, bn=bn,
                    ln=False, act=act, residual=residual, ln_eps=1e-6,
                    groups=1,
                )
                tfn = (
                    timed_serial
                    if os.environ.get("QMM_SERIAL", "0") == "1"
                    else timed
                )
                t = tfn(
                    f, xq, xs, wq, ws, bias, res if residual else None,
                    iters=iters,
                )
        elif mode == "pquant":
            # Pallas one-pass [LN+]quant kernel -> XLA raw int8 dot with the
            # rank-1 dequant/bias/act fused by XLA into the dot consumer.
            # Differs from the REJECTED 'XLA pre-quantize' experiment: there
            # the quant pass itself ran as unfused XLA reductions (multiple
            # HBM round trips); here it is one Pallas pass, and the dot gets
            # XLA's own int8 schedule (measured 267 TOPS on qkv vs our
            # kernel's 233).
            from jax.experimental.pallas import tpu as pltpu

            wq, ws = quantize_weights(w)
            # bq*K*(bf16 in x2 + int8 out + f32 transient) must fit scoped
            # VMEM (~12 MB usable): bq <= 12e6 / (9*K), lane-aligned.
            bq = 512 if k <= 2048 else (256 if k <= 6144 else 128)
            while m % bq:
                bq //= 2

            def _quant_kernel(x_ref, xq_ref, xs_ref, *, ln_: bool):
                xf = x_ref[...].astype(jnp.float32)
                if ln_:
                    mu = jnp.mean(xf, axis=1, keepdims=True)
                    m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
                    d = xf - mu
                    var = jnp.maximum(m2 - mu * mu, 0.0)
                    rstd = jax.lax.rsqrt(var + 1e-6)
                else:
                    d = xf
                    rstd = 1.0
                amax = jnp.maximum(
                    jnp.max(jnp.abs(d), axis=1, keepdims=True), 1e-12
                )
                xq_ref[...] = jnp.round(d * (127.0 / amax)).astype(jnp.int8)
                xs_ref[...] = amax * (1.0 / 127.0) * rstd

            @jax.jit
            def pq_full(x, wq, ws, res=None):
                xq, xs = pl.pallas_call(
                    functools.partial(_quant_kernel, ln_=ln),
                    grid=(m // bq,),
                    in_specs=[pl.BlockSpec((bq, k), lambda mi: (mi, 0))],
                    out_specs=[
                        pl.BlockSpec((bq, k), lambda mi: (mi, 0)),
                        pl.BlockSpec((bq, 1), lambda mi: (mi, 0)),
                    ],
                    out_shape=[
                        jax.ShapeDtypeStruct((m, k), jnp.int8),
                        jax.ShapeDtypeStruct((m, 1), jnp.float32),
                    ],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel",),
                    ),
                )(x)
                acc = jax.lax.dot_general(
                    xq, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                out = acc.astype(jnp.float32) * xs * ws + bias
                if act == "gelu":
                    out = jax.nn.gelu(out)
                if res is not None:
                    out = out + res.astype(jnp.float32)
                return out.astype(jnp.bfloat16)

            if residual:
                t = timed(pq_full, x, wq, ws, res, iters=iters)
            else:
                t = timed(pq_full, x, wq, ws, iters=iters)
        elif mode == "xla":
            wq, ws = quantize_weights(w)

            def xla_int8(x, wq, ws):
                xf = x.astype(jnp.float32)
                xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
                xq = jnp.round(xf / xs).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

            f = jax.jit(xla_int8)
            t = timed(f, x, wq, ws, iters=iters)
        elif mode == "bf16":
            wb = w.astype(jnp.bfloat16)
            f = jax.jit(lambda x, w: jax.lax.dot(x, w).astype(jnp.bfloat16))
            t = timed(f, x, wb, iters=iters)
        else:
            raise SystemExit(f"unknown QMM_MODE {mode}")

        rec = {
            "tag": tag, "mode": mode, "m": m, "k": k, "n": n,
            "ms": round(t * 1e3, 3),
            "tops": round(tops / t / 1e12, 1),
        }
        if os.environ.get("QMM_SERIAL", "0") == "1":
            rec["serial"] = True
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
