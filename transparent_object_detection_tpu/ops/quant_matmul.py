"""Fused LN + dynamic-quant int8 matmul + epilogue — Pallas TPU kernel.

The int8 serving path (TEB projections, models/blocks.py) originally emitted
each step as separate XLA ops, every one a full HBM pass over
activation-sized tensors:

    LayerNorm (2 reduce passes) -> absmax reduce -> quantize -> int8 dot ->
    int32 dequant multiply -> bias add -> gelu -> residual add

Profiling the batch-32 serving step showed 34.5 ms/step of convert+reduce
fusions (LN statistics + quantization absmax) plus ~15 ms of dequant /
activation elementwise — pure HBM bandwidth with zero MXU work.

This kernel fuses the whole pipeline into one pallas_call:

  grid (M/bm, N/bn), N innermost:
    ni == 0:  read the (bm, K) bf16 activation tile once; quantize to int8
              in VMEM (Mosaic skips the x DMA on ni > 0 — block index
              unchanged)
    every ni: int8 x int8 -> int32 MXU dot (2x the bf16 rate on v5e) against
              the streamed (K, bn) weight tile; epilogue = rank-1 dequant
              (+bias) (+gelu) (+residual) in registers; write bf16

The LayerNorm is algebraically split so the prologue's VPU cost stays low
(the per-m-tile prologue is the kernel's serial bottleneck on narrow-N
projections):

  * the affine (gamma, beta) folds into the weights at trace time:
        LN(x) @ W + b  ==  z @ (gamma[:, None] * W) + (beta @ W + b)
    where z is the normalized-but-unscaled activation — zero per-element
    cost in the kernel (see _fold_ln);
  * the 1/sqrt(var) factor never touches the elements: the int8 payload is
    round(127 * d / amax(d)) with d = x - mean (identical for z since
    rsqrt > 0 scales rows uniformly), and rsqrt rides the per-row dequant
    scale  s = amax(d)/127 * rsqrt(var + eps).

Net prologue: two fused mean reductions, one subtract, one absmax, one
round-multiply — no per-element divide, no affine pass.

Weights are quantized at trace time (per-output-channel symmetric int8, one
O(K*N) pass per call — negligible against the O(M*K*N) dot).

Replaces the reference's fp32 torch.nn.Linear + LayerNorm stack in the neck
transformer blocks (reference model/blocks.py:257-289).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

# Flip to run through the Pallas interpreter (CPU tests).
INTERPRET = False


def quantize_weights(kernel: Array) -> Tuple[Array, Array]:
    """fp32 (K, N) kernel -> (int8 (K, N), f32 (1, N) per-channel scale)."""
    w_scale = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0  # (1, N)
    wq = jnp.round(kernel / jnp.maximum(w_scale, 1e-12)).astype(jnp.int8)
    return wq, w_scale


def _fold_ln(
    w: Array, bias: Optional[Array], ln_scale: Array, ln_bias: Array
) -> Tuple[Array, Array]:
    """Fold the LN affine into the projection: returns (w_eff, bias_eff)
    with LN(x) @ w + bias == z @ w_eff + bias_eff for normalized z."""
    w_eff = w * ln_scale.reshape(-1, 1)
    bias_eff = ln_bias.reshape(-1) @ w
    if bias is not None:
        bias_eff = bias_eff + bias
    return w_eff, bias_eff


def _qmm_kernel(
    *refs, ln: bool, has_bias: bool, act: Optional[str], residual: bool,
    ln_eps: float, groups: int = 0, quant_out: bool = False,
    m_inner: bool = False, ln_out: bool = False,
):
    """One (m-tile, n-tile) grid step.

    Grid order: (M/bm, N/bn) with N the inner sequential axis by default;
    `m_inner` flips to (N/bn, M/bm) — the weight block is then read once per
    OUTER step (k*n bytes total) instead of once per m-tile, which is what
    the wide-K mlp2 shapes need (their int8 weights exceed VMEM, and the
    N-inner layout re-streams them (m/bm)*k*n bytes per call — several GB).

    `groups` selects the input mode:
      0   bf16 x: fused [LN ->] dynamic per-row int8 quantize prologue.
      1   pre-quantized int8 x with per-row scales (x_quant handoff from a
          quant_out producer whose tile was full-width): dot directly, no
          prologue, no scratch.
      >1  pre-quantized int8 x with per-(row, k-group) scales: the prologue
          rescales each group onto the row-max scale and re-rounds (one
          extra <=0.4%-of-rowmax rounding — the bf16 path's per-row
          quantize rounds at the same magnitude, so the handoff adds no
          drift class) so the dot keeps a single per-row dequant scale.

    `quant_out` swaps the bf16 store for int8 payload + per-(row, n-tile)
    scale stores — the consumer reads half the bytes and skips its
    quantize prologue (see quant_matmul docstring).

    `ln_out` keeps the bf16 store AND adds an LN-normalized int8 payload +
    per-row scale (rsqrt folded in, same algebra as the input prologue) —
    the attn_out -> mlp1 handoff: the residual stream continues in bf16
    while mlp1 ingests the normalized payload directly (its LN affine folds
    into its weights). Requires a full-width tile (bn == n): the LN row
    statistics need the whole channel axis in VMEM.

    Ref order: x, [x_scales], w, w_scale, [bias], [residual], out,
    [out_scales | ln_payload, ln_scales], [xq_scratch, xs_scratch].
    """
    assert not (quant_out and ln_out)
    it = iter(refs)
    x_ref = next(it)
    pxs_ref = next(it) if groups >= 1 else None
    w_ref = next(it)
    ws_ref = next(it)
    b_ref = next(it) if has_bias else None
    r_ref = next(it) if residual else None
    o_ref = next(it)
    os_ref = next(it) if quant_out else None
    p_ref = next(it) if ln_out else None
    ps_ref = next(it) if ln_out else None
    direct = groups == 1  # int8 x used as-is, no scratch allocated
    xq_scr = next(it) if not direct else None
    xs_scr = next(it) if not direct else None

    inner_i = pl.program_id(1)

    def _requant_prologue():
        # Requantize the per-(row, group) payload onto the row-max
        # scale so the dot dequantizes with one rank-1 multiply.
        s = pxs_ref[...]  # (bm, G)
        smax = jnp.maximum(jnp.max(s, axis=1, keepdims=True), 1e-30)
        xs_scr[:, 0:1] = smax
        g = x_ref.shape[1] // groups
        for gi in range(groups):
            sl = pl.ds(gi * g, g)
            ratio = s[:, gi : gi + 1] / smax  # (bm, 1) <= 1
            xq_scr[:, sl] = jnp.round(
                x_ref[:, sl].astype(jnp.float32) * ratio
            ).astype(jnp.int8)

    def _bf16_prologue():
        # Chunked over row slabs: the f32 intermediates then occupy
        # (chunk, K) instead of (bm, K) of VMEM spill, which is what lets
        # _pick_blocks choose bm=1024 (fewer per-m-tile serializations —
        # the prologue stalls the MXU once per m-tile).
        bm = x_ref.shape[0]
        chunk = 256 if bm % 256 == 0 else 128
        if bm <= chunk:
            chunk = bm

        def slab(i, carry):
            sl = pl.ds(i * chunk, chunk)
            xf = x_ref[sl, :].astype(jnp.float32)
            if ln:
                mu = jnp.mean(xf, axis=1, keepdims=True)
                m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
                d = xf - mu
                var = jnp.maximum(m2 - mu * mu, 0.0)
                rstd = jax.lax.rsqrt(var + ln_eps)
            else:
                d = xf
                rstd = 1.0
            amax = jnp.maximum(
                jnp.max(jnp.abs(d), axis=1, keepdims=True), 1e-12
            )  # (chunk, 1)
            # |d| * 127/amax <= 127 exactly -> no clip needed for int8
            xq_scr[sl, :] = jnp.round(d * (127.0 / amax)).astype(jnp.int8)
            xs_scr[sl, 0:1] = amax * (1.0 / 127.0) * rstd
            return carry

        jax.lax.fori_loop(0, bm // chunk, slab, 0, unroll=False)

    if not direct:
        body = _requant_prologue if groups > 1 else _bf16_prologue
        if m_inner:
            # every inner step is a fresh m-tile — prologue runs each step
            body()
        else:
            pl.when(inner_i == 0)(body)

    xq = x_ref[...] if direct else xq_scr[...]
    acc = jax.lax.dot_general(
        xq,
        w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bm, bn) int32 on the MXU at the int8 rate
    row_scale = pxs_ref[:, 0:1] if direct else xs_scr[:, 0:1]
    out = acc.astype(jnp.float32) * row_scale * ws_ref[0:1, :]
    if has_bias:
        out = out + b_ref[0:1, :]
    if act == "gelu":
        out = jax.nn.gelu(out)
    elif act == "silu":
        out = out * jax.nn.sigmoid(out)
    if residual:
        out = out + r_ref[...].astype(jnp.float32)
    if quant_out:
        amax = jnp.maximum(
            jnp.max(jnp.abs(out), axis=1, keepdims=True), 1e-30
        )
        # the scales block spans the full (narrow) scales array width and is
        # revisited across n-steps; a dynamic column store can't be proven
        # lane-aligned, so each step one-hot-selects its column into the
        # block (G <= 16 lanes — one cheap VPU select per tile)
        sval = amax * (1.0 / 127.0)
        if os_ref.shape[1] == 1:
            os_ref[...] = sval
        else:
            n_idx = pl.program_id(0) if m_inner else pl.program_id(1)
            col = jax.lax.broadcasted_iota(jnp.int32, os_ref.shape, 1)
            os_ref[...] = jnp.where(col == n_idx, sval, os_ref[...])
        o_ref[...] = jnp.round(out * (127.0 / amax)).astype(jnp.int8)
    else:
        if ln_out:
            # full-width tile (bn == n): LN row stats are exact in-tile
            mu = jnp.mean(out, axis=1, keepdims=True)
            m2 = jnp.mean(out * out, axis=1, keepdims=True)
            d = out - mu
            var = jnp.maximum(m2 - mu * mu, 0.0)
            rstd = jax.lax.rsqrt(var + ln_eps)
            amax = jnp.maximum(
                jnp.max(jnp.abs(d), axis=1, keepdims=True), 1e-12
            )
            p_ref[...] = jnp.round(d * (127.0 / amax)).astype(jnp.int8)
            ps_ref[...] = amax * (1.0 / 127.0) * rstd
        o_ref[...] = out.astype(o_ref.dtype)


def _pick_blocks(
    m: int, k: int, n: int, residual: bool = True,
    x_bytes: int = 2, out_bytes: int = 2,
    align: Optional[Tuple[int, int]] = None,
    full_width_only: bool = False,
) -> Optional[Tuple[int, int]]:
    """(bm, bn) fitting VMEM, MXU-aligned and dividing (m, n).

    First preference (r3 sweep): bn = n FULL WIDTH. The weight block index
    is then constant across the whole grid, so Mosaic keeps the quantized
    weights VMEM-RESIDENT — zero re-streaming of W per m-tile (the r2
    layout re-read all of W for every m-tile: for the 1536x1536 attn_out
    that was 2.4 MB x 200 tiles = 0.5 GB/call). Measured on v5e: the
    square-shape dot went 155 -> 183 TOPS at (256, 1536). Falls back to
    the r2 streaming layout (tall-m for narrow shapes, wide-bn otherwise)
    when W + tiles exceed VMEM."""
    def vmem(bm: int, bn: int) -> int:
        chunk = min(bm, 256)
        # Mosaic double-buffers every input/output block (x, w, out, and
        # the optional residual), plus the xq int8 scratch, the chunked
        # fp32 prologue temp, and the int32 accumulator vregs. Calibrated
        # against a measured 16.3M scoped allocation for (bm=1024, bn=512,
        # k=1536) vs the 16M limit.
        resident = bn == n  # constant block index -> single-buffered W
        return (
            2 * bm * k * x_bytes  # x, double-buffered
            + bm * k             # xq int8 scratch
            + chunk * k * 4      # fp32 prologue temp (row-chunked)
            + (1 if resident else 2) * k * bn  # w int8
            + 2 * bm * bn * out_bytes  # out, double-buffered
            + (2 * bm * bn * 2 if residual else 0)  # residual bf16
            + bm * bn * 4        # int32 accumulator
        )

    import os

    forced = os.environ.get("TOD_QMM_FORCE")
    if forced:  # bench-only layout override ("bm,bn"), benchmarks/bench_qmm.py
        fm, fn = (int(v) for v in forced.split(","))
        if m % fm == 0 and n % fn == 0:
            return fm, fn
    budget = 15 * 1024 * 1024 + 512 * 1024
    # Weight-resident full-width layout (see docstring), tallest fitting
    # m-tile first: the quantize prologue runs once per m-tile and
    # serializes the MXU, so taller tiles amortize it — decisive on
    # narrow-N shapes (the 1x1 reduce convs: only ~1 us of dot per
    # 256-row tile vs several us of prologue). bm=256 measured 138 -> 170
    # TOPS on the square attn_out; bm=128 (the only fit for the 4608-wide
    # qkv at bf16 width) measured a wash vs streaming THERE, but with int8
    # x/out (the handoff paths) the smaller buffers make residency the
    # clear win — W streaming dominates those shapes' traffic — so 128 is
    # allowed whenever either side is int8.
    def bn_ok(bn: int) -> bool:
        # quant_out scale-group alignment for downstream sectioned
        # consumers (the fused qkv -> attention handoff): a full-width
        # tile gives per-row scales (always fine); otherwise the group
        # must tile the section and cover whole heads.
        if align is None or bn == n:
            return True
        section, dh = align
        return section % bn == 0 and bn % dh == 0

    resident_bms = (1024, 512, 256) if x_bytes == 2 and out_bytes == 2 else (
        1024, 512, 256, 128)
    for bm in resident_bms:
        if m % bm == 0 and vmem(bm, n) <= budget:
            return bm, n
    if full_width_only:  # ln_out needs the whole row in-tile; no fallback
        return None
    # Measured on v5e (204800-row TEB shapes): narrow projections with few
    # wide-bn steps per m-tile are prologue-bound — tall m-tiles win (the
    # square 1536x1536 attn_out: 7.9 -> 6.9 ms at (1024, 256)). Everything
    # else is MXU/stream-bound and prefers the widest bn (wide-bn at
    # (512, 768) beats tall-narrow by 4-20% on the 3072/4608/6144-wide and
    # k=3072 shapes).
    if n <= 1536 and k <= 2048:
        for bm in (1024, 512, 256, 128):
            if m % bm:
                continue
            for bn in (768, 512, 256):
                if n % bn == 0 and bn_ok(bn) and vmem(bm, bn) <= budget:
                    return bm, bn
    else:
        for bn in (768, 512, 256):
            if n % bn or not bn_ok(bn):
                continue
            for bm in (512, 256, 128):
                if m % bm == 0 and vmem(bm, bn) <= budget:
                    return bm, bn
    return None


def _pick_layout_prequant(
    m: int, k: int, n: int, groups: int, residual: bool,
) -> Optional[Tuple[bool, int, int]]:
    """(m_inner, bm, bn) for a pre-quantized-x consumer, minimizing modeled
    HBM traffic subject to VMEM.

    The decision that matters is WEIGHT STREAMING: with N innermost the
    weight block re-reads k*n bytes per m-tile — for the wide-K mlp2
    shapes that is (m/bm) * 16.8 MB = several GB per call, the real reason
    those shapes plateaued near 200 TOPS. Options modeled:

      * N-inner, bn == n (weight-resident): W read once; best when it fits.
      * N-inner streaming: W re-read per m-tile.
      * M-inner (grid (N/bn, M/bm)): W read once per outer step (k*n total),
        x re-read (n/bn) times — cheap now that x is int8 — and the requant
        prologue re-runs per step (VPU, overlappable).
    """
    g = k // groups

    def vmem(bm: int, bn: int, m_in: bool) -> int:
        resident = (not m_in) and bn == n
        scratch = 0 if groups == 1 else bm * k + bm * 128 * 4
        temp = 0 if groups == 1 else bm * g * 4
        return (
            2 * bm * k           # x int8, double-buffered
            + scratch            # xq int8 + row-scale scratch
            + temp               # f32 requant temp (one group slice)
            + (1 if resident else 2) * k * bn  # w int8
            + 2 * bm * bn * 2    # out bf16, double-buffered
            + (2 * bm * bn * 2 if residual else 0)
            + bm * bn * 4        # int32 accumulator
        )

    budget = 15 * 1024 * 1024 + 512 * 1024
    best = None  # (traffic, m_inner, bm, bn)
    for bm in (1024, 512, 256, 128):
        if m % bm:
            continue
        for bn in dict.fromkeys((n, 768, 512, 256)):
            if n % bn:
                continue
            for m_in in (False, True):
                if m_in and bn == n:
                    continue  # identical to N-inner resident
                if vmem(bm, bn, m_in) > budget:
                    continue
                if m_in:
                    traffic = (n // bn) * m * k + k * n
                else:
                    w_bytes = k * n if bn == n else (m // bm) * k * n
                    traffic = m * k + w_bytes
                # secondary preference: taller tiles (fewer prologue runs)
                key = (traffic, -bm)
                if best is None or key < best[0]:
                    best = (key, m_in, bm, bn)
    if best is None:
        return None
    return best[1], best[2], best[3]


def ln_quant_out_supported(m: int, k: int, n: int, residual: bool = True) -> bool:
    """True when a `ln_quant_out=True` call on these dims would run the fused
    kernel (full-width weight-resident tiles). On non-Pallas backends the
    reference twin computes the triple anyway (test paths), so this gate only
    matters on TPU — callers should keep the plain bf16->fused-LN route when
    it returns False there, since the twin's epilogue is an extra XLA pass."""
    import jax as _jax

    if not (_jax.default_backend() in ("tpu", "axon") or INTERPRET):
        return True
    if k % 128 or n % 256:
        return True  # dispatch falls back to the twin for the whole call
    return _pick_blocks(
        m, k, n, residual=residual, out_bytes=3, full_width_only=True
    ) is not None


def _quant_rows_kernel(
    x_ref, xq_ref, xs_ref, *, ln: bool, ln_eps: float, qmax: float = 127.0
):
    """One-pass [LN-normalize +] per-row dynamic int8 quantization.

    Emits the int8 payload and the per-row dequant scale (with rsqrt folded
    in, same algebra as _qmm_kernel's prologue) for the SPLIT path: the dot
    itself then runs as a plain XLA int8 dot_general, which schedules the
    MXU better than the fused kernel on wide-N shapes (see _prefer_split).

    qmax=7 produces an int4-RANGE payload (still stored int8; the caller
    narrows with .astype(int4) fused into its dot program) for the w4a4
    path — the v5e MXU runs i4 x i4 dots up to +40% over int8 on the mlp1
    shape class (benchmarks/bench_int4.py calibration)."""
    xf = x_ref[...].astype(jnp.float32)
    if ln:
        mu = jnp.mean(xf, axis=1, keepdims=True)
        m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
        d = xf - mu
        var = jnp.maximum(m2 - mu * mu, 0.0)
        rstd = jax.lax.rsqrt(var + ln_eps)
    else:
        d = xf
        rstd = 1.0
    amax = jnp.maximum(jnp.max(jnp.abs(d), axis=1, keepdims=True), 1e-12)
    xq_ref[...] = jnp.round(d * (qmax / amax)).astype(jnp.int8)
    xs_ref[...] = amax * (1.0 / qmax) * rstd


def _prefer_split(m: int, k: int, n: int, ln: bool, act, residual) -> bool:
    """Measured r3 routing (bench_qmm base vs pquant on v5e): the split
    quant-pass + XLA int8 dot wins on the wide-N qkv projections
    (n == 3k, LN, no act/residual: 212.9 -> 236.7 TOPS on the 1536->4608
    h2 qkv, 187.3 -> 196.6 on the 2048->6144 h1 qkv); the fused kernel
    wins everywhere else (attn_out 152.5 vs 131.4, mlp1 225.6 vs 219.0,
    mlp2 203.9 vs 208.5 within noise)."""
    return (
        ln and act is None and residual is None
        and n == 3 * k and m >= 51200 and m % 512 == 0
    )


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "ln", "act", "ln_eps")
)
def _pquant_call(x2d, wq, w_scale, bias, *, out_dtype, ln, act, ln_eps):
    from jax.experimental.pallas import tpu as pltpu

    m, k = x2d.shape
    # bq * K * (bf16 in, double-buffered + int8 out + f32 transient) must
    # fit scoped VMEM (~12 MB usable)
    bq = 512 if k <= 2048 else (256 if k <= 6144 else 128)
    while m % bq:
        bq //= 2
    xq, xs = pl.pallas_call(
        functools.partial(_quant_rows_kernel, ln=ln, ln_eps=ln_eps),
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
        interpret=INTERPRET,
    )(x2d)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * w_scale
    if bias is not None:
        out = out + bias.reshape(1, -1)
    if act == "gelu":
        out = jax.nn.gelu(out)
    elif act == "silu":
        out = out * jax.nn.sigmoid(out)
    return out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_dtype", "bm", "bn", "ln", "act", "residual", "ln_eps",
        "groups", "quant_out", "m_inner", "ln_out",
    ),
)
def _qmm_call(
    x2d, xs2d, wq, w_scale, bias, res2d, *,
    out_dtype, bm, bn, ln, act, residual, ln_eps,
    groups=0, quant_out=False, m_inner=False, ln_out=False,
):
    m, k = x2d.shape
    n = wq.shape[1]
    from jax.experimental.pallas import tpu as pltpu

    # index maps: grid is (M/bm, N/bn) by default, (N/bn, M/bm) when
    # m_inner (weights then stream once per OUTER step — see
    # _pick_layout_prequant)
    if m_inner:
        at_m, at_n, at_mn = (
            lambda ni, mi: (mi, 0),
            lambda ni, mi: (0, ni),
            lambda ni, mi: (mi, ni),
        )
        grid = (n // bn, m // bm)
        semantics = ("arbitrary", "arbitrary")
    else:
        at_m, at_n, at_mn = (
            lambda mi, ni: (mi, 0),
            lambda mi, ni: (0, ni),
            lambda mi, ni: (mi, ni),
        )
        grid = (m // bm, n // bn)
        semantics = ("parallel", "arbitrary")

    has_bias = bias is not None
    operands = [x2d]
    in_specs = [pl.BlockSpec((bm, k), at_m)]
    if groups >= 1:
        operands.append(xs2d)
        in_specs.append(pl.BlockSpec((bm, groups), at_m))
    operands += [wq, w_scale.astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((k, bn), at_n),
        pl.BlockSpec((1, bn), at_n),
    ]
    if has_bias:
        operands.append(bias.reshape(1, n).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, bn), at_n))
    if residual:
        operands.append(res2d)
        in_specs.append(pl.BlockSpec((bm, bn), at_mn))

    if quant_out:
        out_specs = [
            pl.BlockSpec((bm, bn), at_mn),
            pl.BlockSpec((bm, n // bn), at_m),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((m, n), jnp.int8),
            jax.ShapeDtypeStruct((m, n // bn), jnp.float32),
        ]
    elif ln_out:
        assert bn == n, "ln_out needs full-width tiles (LN row stats)"
        out_specs = [
            pl.BlockSpec((bm, bn), at_mn),
            pl.BlockSpec((bm, bn), at_mn),
            pl.BlockSpec((bm, 1), at_m),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((m, n), out_dtype),
            jax.ShapeDtypeStruct((m, n), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ]
    else:
        out_specs = pl.BlockSpec((bm, bn), at_mn)
        out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)

    scratch_shapes = (
        []
        if groups == 1
        else [
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ]
    )

    return pl.pallas_call(
        functools.partial(
            _qmm_kernel, ln=ln, has_bias=has_bias, act=act, residual=residual,
            ln_eps=ln_eps, groups=groups, quant_out=quant_out,
            m_inner=m_inner, ln_out=ln_out,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        # NOTE: no pl.CostEstimate here — declared costs show up in XLA's
        # cost_analysis() and would double-count with the trace-time FLOP log
        # (ops/attention.py log_custom_flops), which MFU accounting relies on
        # to charge int8 work against the int8 MXU peak.
        interpret=INTERPRET,
    )(*operands)


def quantize_weights4(kernel: Array) -> Tuple[Array, Array]:
    """fp32 (K, N) kernel -> (int4 (K, N), f32 (1, N) per-channel scale)."""
    w_scale = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 7.0
    wq = jnp.round(kernel / jnp.maximum(w_scale, 1e-12)).astype(jnp.int4)
    return wq, w_scale


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "ln", "act", "ln_eps", "quant_out")
)
def _w4a4_call(x2d, wq4, w_scale, bias, *, out_dtype, ln, act, ln_eps,
               quant_out):
    """w4a4 split path: Pallas one-pass [LN+] per-row INT4-RANGE quantize,
    then a raw XLA i4 x i4 dot (the +40% MXU rate on mlp1-class shapes —
    benchmarks/bench_int4.py) with the dequant/bias/act epilogue and the
    int8->int4 narrowing fused by XLA into the same program (int4 arrays
    cannot cross a jit boundary on this backend). With quant_out, the
    output re-quantizes per-row to the int8 handoff contract mlp2 consumes
    (x_quant, groups=1)."""
    from jax.experimental.pallas import tpu as pltpu

    m, k = x2d.shape
    bq = 512 if k <= 2048 else (256 if k <= 6144 else 128)
    while m % bq:
        bq //= 2
    xq, xs = pl.pallas_call(
        functools.partial(_quant_rows_kernel, ln=ln, ln_eps=ln_eps, qmax=7.0),
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
        interpret=INTERPRET,
    )(x2d)
    acc = jax.lax.dot_general(
        xq.astype(jnp.int4), wq4, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * w_scale
    if bias is not None:
        out = out + bias.reshape(1, -1)
    if act == "gelu":
        out = jax.nn.gelu(out)
    elif act == "silu":
        out = out * jax.nn.sigmoid(out)
    if quant_out:
        amax = jnp.maximum(jnp.max(jnp.abs(out), axis=1, keepdims=True), 1e-30)
        payload = jnp.round(out * (127.0 / amax)).astype(jnp.int8)
        return payload, (amax * (1.0 / 127.0)).astype(jnp.float32)
    return out.astype(out_dtype)


def w4a4_supported(m: int, k: int, n: int) -> bool:
    """True when quant_matmul_w4a4 runs its real TPU program on these dims
    (int4 dots need a TPU backend; the CPU twin exists only for tests)."""
    return (
        jax.default_backend() in ("tpu", "axon")
        and k % 128 == 0 and n % 128 == 0 and m % 128 == 0
    )


def quant_matmul_w4a4(
    x: Array,
    w: Array,
    bias: Optional[Array] = None,
    ln_scale: Optional[Array] = None,
    ln_bias: Optional[Array] = None,
    ln_eps: float = 1e-6,
    act: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    quant_out: bool = False,
):
    """[LayerNorm ->] dynamic per-row INT4 quant -> i4 x i4 MXU matmul ->
    [bias/act] [-> int8 quant_out handoff].

    The w4a4 prototype for the mlp1-class shapes (VERDICT r4 #3): int4
    weights per-output-channel, int4 activations per-row dynamic. The
    i4 x i4 dot measured +40% over i8 x i8 on 204800x1536x6144
    (benchmarks/bench_int4.py); the accuracy cost of 4-bit activations is
    measured by the hard-set drift gate (E2E_HARD=1 benchmarks/
    validate_e2e.py), NOT assumed. Gated per-call by the caller
    (TOD_W4A4_MLP1 in the TEB); everything else stays int8.

    Off-TPU this runs an identical-math twin with int8 containers holding
    the [-7, 7] values (bit-identical accumulation)."""
    ln = ln_scale is not None
    if ln:
        w, bias = _fold_ln(w, bias, ln_scale, ln_bias)
    m = 1
    for d in x.shape[:-1]:
        m *= d
    k, n = w.shape
    x2d = x.reshape(m, k)
    if w4a4_supported(m, k, n):
        from transparent_object_detection_tpu.ops.attention import log_custom_flops

        wq4, ws4 = quantize_weights4(w)
        # The i4 dot is an XLA dot_general, so XLA's cost analysis already
        # counts its 2mkn as (bf16-rate) flops — log a negative bf16
        # correction and charge the same work as int8-class MXU ops instead
        # (no separate int4 peak on the sheet; the de facto calibration
        # handles the real rate). Same pattern as the split path in
        # _qmm_dispatch.
        log_custom_flops(-2.0 * m * k * n, int8=False)
        log_custom_flops(2.0 * m * k * n, int8=True)
        out = _w4a4_call(
            x2d, wq4, ws4, bias, out_dtype=out_dtype, ln=ln, act=act,
            ln_eps=ln_eps, quant_out=quant_out,
        )
    else:
        # reference twin: int8 containers holding [-7, 7] values — same
        # accumulation math as the TPU i4 x i4 program, runs anywhere
        ws4 = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 7.0
        wq = jnp.round(w / jnp.maximum(ws4, 1e-12)).astype(jnp.int8)
        xf = x2d.astype(jnp.float32)
        if ln:
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
            d = xf - mu
            rstd = jax.lax.rsqrt(jnp.maximum(m2 - mu * mu, 0.0) + ln_eps)
        else:
            d = xf
            rstd = 1.0
        amax = jnp.maximum(jnp.max(jnp.abs(d), axis=-1, keepdims=True), 1e-12)
        xq = jnp.round(d * (7.0 / amax)).astype(jnp.int8)
        xs = amax * (1.0 / 7.0) * rstd
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        val = acc.astype(jnp.float32) * xs * ws4
        if bias is not None:
            val = val + bias.reshape(1, -1)
        if act == "gelu":
            val = jax.nn.gelu(val)
        elif act == "silu":
            val = val * jax.nn.sigmoid(val)
        if quant_out:
            amax_o = jnp.maximum(
                jnp.max(jnp.abs(val), axis=-1, keepdims=True), 1e-30
            )
            out = (
                jnp.round(val * (127.0 / amax_o)).astype(jnp.int8),
                (amax_o * (1.0 / 127.0)).astype(jnp.float32),
            )
        else:
            out = val.astype(out_dtype)
    if quant_out:
        payload, scales = out
        return (
            payload.reshape(*x.shape[:-1], n),
            scales.reshape(*x.shape[:-1], 1),
        )
    return out.reshape(*x.shape[:-1], n)


def dequantize(payload: Array, scales: Array, dtype=jnp.bfloat16) -> Array:
    """(..., N) int8 + (..., G) f32 -> (..., N) value array (handoff escape
    hatch for consumers that can't ingest x_quant directly)."""
    n = payload.shape[-1]
    g = n // scales.shape[-1]
    p3 = payload.reshape(*payload.shape[:-1], scales.shape[-1], g)
    return (
        p3.astype(jnp.float32) * scales[..., None]
    ).reshape(payload.shape).astype(dtype)


def _qmm_reference(x, wq, w_scale, bias, res, *,
                   ln, act, residual, ln_eps, out_dtype,
                   x_scales=None, quant_out_group=None, ln_out=False):
    """Pure-JAX twin of the kernel math (CPU fallback + oracle for tests).

    Takes the already-folded weights (wq/w_scale/bias from _fold_ln +
    quantize_weights) and mirrors the kernel's normalize-only LN. With
    `x_scales` (the int8-handoff consumer), x is an int8 payload with
    per-(row, k-group) scales and the twin mirrors the kernel's
    requantize-onto-rowmax prologue. With `quant_out_group`, returns
    (int8 payload, per-(row, n-group) f32 scales) instead of the value.
    With `ln_out`, returns (value, LN-normalized int8 payload, per-row
    scales with rsqrt folded in) — the kernel's ln_out epilogue."""
    if x_scales is not None:
        groups = x_scales.shape[-1]
        if groups == 1:
            xq = x
            s = x_scales
        else:
            g = x.shape[-1] // groups
            smax = jnp.maximum(
                jnp.max(x_scales, axis=-1, keepdims=True), 1e-30
            )
            ratio = (x_scales / smax)[..., :, None]  # (..., G, 1)
            x3 = x.reshape(*x.shape[:-1], groups, g).astype(jnp.float32)
            xq = jnp.round(x3 * ratio).reshape(x.shape).astype(jnp.int8)
            s = smax
    else:
        xf = x.astype(jnp.float32)
        if ln:
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
            d = xf - mu
            rstd = jax.lax.rsqrt(jnp.maximum(m2 - mu * mu, 0.0) + ln_eps)
        else:
            d = xf
            rstd = 1.0
        amax = jnp.maximum(jnp.max(jnp.abs(d), axis=-1, keepdims=True), 1e-12)
        xq = jnp.round(d * (127.0 / amax)).astype(jnp.int8)
        s = amax * (1.0 / 127.0) * rstd
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s * w_scale
    if bias is not None:
        out = out + bias
    if act == "gelu":
        out = jax.nn.gelu(out)
    elif act == "silu":
        out = out * jax.nn.sigmoid(out)
    if residual:
        out = out + res.astype(jnp.float32)
    if quant_out_group is not None:
        go = quant_out_group
        n = out.shape[-1]
        o3 = out.reshape(*out.shape[:-1], n // go, go)
        amax_o = jnp.maximum(
            jnp.max(jnp.abs(o3), axis=-1, keepdims=True), 1e-30
        )
        payload = jnp.round(o3 * (127.0 / amax_o)).astype(jnp.int8)
        return (
            payload.reshape(*out.shape[:-1], n),
            (amax_o[..., 0] * (1.0 / 127.0)).astype(jnp.float32),
        )
    if ln_out:
        mu = jnp.mean(out, axis=-1, keepdims=True)
        m2o = jnp.mean(out * out, axis=-1, keepdims=True)
        d = out - mu
        var = jnp.maximum(m2o - mu * mu, 0.0)
        rstd = jax.lax.rsqrt(var + ln_eps)
        amax_o = jnp.maximum(jnp.max(jnp.abs(d), axis=-1, keepdims=True), 1e-12)
        return (
            out.astype(out_dtype),
            jnp.round(d * (127.0 / amax_o)).astype(jnp.int8),
            (amax_o * (1.0 / 127.0) * rstd).astype(jnp.float32),
        )
    return out.astype(out_dtype)


def _qmm_dispatch(x, wq, w_scale, bias, residual, *, ln, act, ln_eps,
                  out_dtype, x_scales=None, quant_out=False,
                  quant_out_align=None, ln_out=False):
    """Pallas-or-fallback on whatever shapes it receives (global, or the
    per-shard local shapes inside shard_map)."""
    k, n = wq.shape
    m = 1
    for d in x.shape[:-1]:
        m *= d
    groups = 0 if x_scales is None else x_scales.shape[-1]
    # NEGATIVE RESULT (r3, recorded so it isn't retried): routing the
    # groups==1 direct-handoff consumer (mlp1 full-width quant_out -> mlp2)
    # through a plain XLA int8 dot_general + fused dequant/residual measured
    # 132.1 imgs/s e2e vs 140.6 through the Pallas direct path — even though
    # the RAW XLA dot on the same (204800, 6144, 1536) shape with
    # HBM-resident int8 operands runs 333 TOPS vs ~208 for the Pallas
    # kernel. The raw rate does not survive contact with the Pallas-produced
    # operand layout + the dequant consumer fusion. Calibration table in
    # docs/ROADMAP.md.
    use_pallas = (
        (jax.default_backend() in ("tpu", "axon") or INTERPRET)
        and x.shape[-1] == k and k % 128 == 0 and n % 256 == 0
        and (groups == 0 or (k % groups == 0 and (k // groups) % 128 == 0))
    )
    if groups:
        layout = (
            _pick_layout_prequant(m, k, n, groups, residual is not None)
            if use_pallas else None
        )
        if ln_out and layout is not None and (layout[0] or layout[2] != n):
            layout = None  # ln_out needs the N-inner full-width layout
        blocks = None if layout is None else layout[1:]
        m_inner = False if layout is None else layout[0]
    else:
        blocks = (
            _pick_blocks(
                m, k, n, residual=residual is not None,
                out_bytes=1 if quant_out else (3 if ln_out else 2),
                align=quant_out_align if quant_out else None,
                full_width_only=ln_out,
            )
            if use_pallas else None
        )
        m_inner = False
    if blocks is None:
        return _qmm_reference(
            x, wq, w_scale, bias, residual,
            ln=ln, act=act, residual=residual is not None, ln_eps=ln_eps,
            out_dtype=out_dtype,
            x_scales=x_scales,
            quant_out_group=n if quant_out else None,
            ln_out=ln_out,
        )
    bm, bn = blocks

    from transparent_object_detection_tpu.ops.attention import log_custom_flops

    if (
        groups == 0 and not quant_out and not ln_out
        and _prefer_split(m, k, n, ln, act, residual)
    ):
        # Split path: the int8 dot is a plain XLA dot_general, so XLA's
        # cost analysis already counts its 2mkn as (bf16-rate) flops —
        # log a negative bf16 correction and the same work as int8 so
        # bench.py charges it against the int8 MXU peak.
        log_custom_flops(-2.0 * m * k * n, int8=False)
        log_custom_flops(2.0 * m * k * n, int8=True)
        out = _pquant_call(
            x.reshape(m, k), wq, w_scale.astype(jnp.float32), bias,
            out_dtype=out_dtype, ln=ln, act=act, ln_eps=ln_eps,
        )
        return out.reshape(*x.shape[:-1], n)

    log_custom_flops(2.0 * m * k * n, int8=True)
    out = _qmm_call(
        x.reshape(m, k),
        x_scales.reshape(m, groups) if groups else None,
        wq, w_scale, bias,
        residual.reshape(m, n) if residual is not None else None,
        out_dtype=out_dtype, bm=bm, bn=bn, ln=ln, act=act,
        residual=residual is not None, ln_eps=ln_eps,
        groups=groups, quant_out=quant_out, m_inner=m_inner,
        ln_out=ln_out,
    )
    if quant_out:
        payload, scales = out
        return (
            payload.reshape(*x.shape[:-1], n),
            scales.reshape(*x.shape[:-1], n // bn),
        )
    if ln_out:
        value, payload, scales = out
        return (
            value.reshape(*x.shape[:-1], n),
            payload.reshape(*x.shape[:-1], n),
            scales.reshape(*x.shape[:-1], 1),
        )
    return out.reshape(*x.shape[:-1], n)


def quant_matmul(
    x: Optional[Array],
    w: Array,
    bias: Optional[Array] = None,
    ln_scale: Optional[Array] = None,
    ln_bias: Optional[Array] = None,
    ln_eps: float = 1e-6,
    act: Optional[str] = None,
    residual: Optional[Array] = None,
    out_dtype=jnp.bfloat16,
    quant_out: bool = False,
    quant_out_align: Optional[Tuple[int, int]] = None,
    x_quant: Optional[Tuple[Array, Array]] = None,
    x_quant_normalized: bool = False,
    ln_quant_out: bool = False,
):
    """[LayerNorm ->] dynamic-int8-quant -> int8 matmul -> [bias/gelu/residual].

    x: (..., K) bf16; w: (K, N) fp32 kernel (quantized per-output-channel
    inside, LN affine folded in — see module docstring). Runs the fused
    Pallas kernel on TPU when shapes tile cleanly, else the identical-math
    XLA fallback.

    int8 HANDOFF between chained projections (mlp1 -> mlp2 in the TEB):

      * `quant_out=True`: returns (int8 payload (..., N), f32 scales
        (..., N/g)) instead of a bf16 value — the epilogue quantizes each
        output tile per-row (g = the kernel's n-tile width, discoverable as
        N // scales.shape[-1]). Halves the intermediate's HBM write.
      * `x_quant=(payload, scales)`: consumes such a pair (pass x=None) —
        halves the read, and replaces the consumer's bf16 quantize prologue
        with a cheap int8 rescale (or nothing, when the producer tile was
        full-width). The extra rounding is at the same <=0.4%-of-rowmax
        magnitude as the bf16 path's own per-row quantize, so the handoff
        does not change the quantization-noise class (e2e drift stays 0).

    LN HANDOFF one link earlier (attn_out -> mlp1 in the TEB):

      * `ln_quant_out=True`: returns (bf16 value, int8 payload (..., N),
        f32 scales (..., 1)) — the value is the usual epilogue output (the
        residual stream, which mlp2 still needs), and payload*scales is
        LayerNorm-NORMALIZED value rows (rsqrt folded into the per-row
        scale, affine NOT applied). ln_eps is the output-LN epsilon here.
        Needs full-width (bn == N) tiles; check ln_quant_out_supported
        first on TPU — the fallback twin costs an extra XLA pass.
      * consumer: pass `x_quant=(payload, scales), x_quant_normalized=True`
        TOGETHER WITH ln_scale/ln_bias — the affine folds into the weights
        exactly as the fused path does, and the kernel runs the zero-
        prologue direct int8 dot (its LN already happened in the producer).

    Under a registered compute mesh (ops/shard.py) with a batched input, the
    whole dispatch is wrapped in shard_map over the data axis — GSPMD cannot
    partition a pallas_call, so without this the int8 serving path would not
    run data-parallel. Block picking then sees the per-shard local M.
    """
    ln = ln_scale is not None
    assert not (quant_out and ln_quant_out)
    if x_quant is not None:
        assert x is None, "x_quant is exclusive with x"
        assert ln == x_quant_normalized, (
            "x_quant + LN params requires x_quant_normalized=True (the "
            "payload must be a producer's ln_quant_out); a raw payload "
            "cannot be LayerNormed in-kernel"
        )
        x, x_scales = x_quant
    else:
        x_scales = None
    if ln:
        w, bias = _fold_ln(w, bias, ln_scale, ln_bias)
        if x_quant_normalized:
            ln = False  # producer already normalized; affine now in weights
    wq, w_scale = quantize_weights(w)

    from transparent_object_detection_tpu.ops.shard import (
        get_compute_mesh,
        maybe_shard_map,
    )

    mesh, axis = get_compute_mesh()
    n_shards = dict(getattr(mesh, "shape", {})).get(axis, 1) if mesh is not None else 1
    if (
        n_shards > 1
        and x.ndim >= 2
        and x.shape[0] % n_shards == 0
        and (residual is None or residual.shape[0] == x.shape[0])
    ):
        has_bias, has_res = bias is not None, residual is not None
        has_xs = x_scales is not None

        def local_fn(*args):
            it = iter(args)
            x_l = next(it)
            xs_l = next(it) if has_xs else None
            wq_l, ws_l = next(it), next(it)
            b_l = next(it) if has_bias else None
            r_l = next(it) if has_res else None
            return _qmm_dispatch(
                x_l, wq_l, ws_l, b_l, r_l,
                ln=ln, act=act, ln_eps=ln_eps, out_dtype=out_dtype,
                x_scales=xs_l, quant_out=quant_out,
                quant_out_align=quant_out_align, ln_out=ln_quant_out,
            )

        operands = [x]
        batch_idx = {0}
        if has_xs:
            batch_idx.add(len(operands))
            operands.append(x_scales)
        operands += [wq, w_scale]
        if has_bias:
            operands.append(bias)
        if has_res:
            batch_idx.add(len(operands))
            operands.append(residual)
        return maybe_shard_map(
            local_fn, batch_arg_indices=batch_idx,
            n_out=2 if quant_out else (3 if ln_quant_out else 1),
        )(*operands)

    return _qmm_dispatch(
        x, wq, w_scale, bias, residual,
        ln=ln, act=act, ln_eps=ln_eps, out_dtype=out_dtype,
        x_scales=x_scales, quant_out=quant_out,
        quant_out_align=quant_out_align, ln_out=ln_quant_out,
    )
