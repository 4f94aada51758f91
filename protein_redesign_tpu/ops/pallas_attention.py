"""Pallas TPU kernel: fused masked/biased multi-head attention.

The denoiser's attention family (single attention with pair bias, triangle
attention over pair rows, SPAttention) all reduce to: per row r and head h,
``softmax(q k^T * scale + bias - inf*(1-mask)) v``. The XLA fallback
materializes the [rows, H, N, N] logits/probabilities in HBM — ~905 MB at
N=384 (B=1, H=4, f32) and the dominant HBM traffic of a denoiser step.
This kernel keeps each q-tile's [TQ, N] logits in VMEM and writes only the
[rows, N, H, C] output, making attention compute-bound on the MXU.

Complexes are bucketed to N in {64,128,...,512} (data/collate.py), so N is
always lane-aligned and small enough that a full key block fits VMEM; no
online-softmax chunking is needed.

Training: gradients flow through a custom VJP whose backward pass
recomputes via the plain einsum formulation (attention here is a small
fraction of backward FLOPs; correctness first).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(2.0**15)  # the reference's padding fill (`modules.py:220`)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, out_ref):
    """One (row, head, q-tile) program: full-key attention in VMEM."""
    q = q_ref[0, 0]            # [TQ, C]
    k = k_ref[0, 0]            # [N, C]
    v = v_ref[0, 0]            # [N, C]
    logits = jnp.dot(
        q, k.T, preferred_element_type=jnp.float32
    )                           # [TQ, N]
    if bias_ref is not None:
        logits += bias_ref[0, 0].astype(jnp.float32)
    mask = mask_ref[0, 0]       # [N]
    logits = jnp.where(mask[None, :] < 0.5, NEG_INF, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    out_ref[0, 0] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _attn_kernel_nomask(q_ref, k_ref, v_ref, bias_ref, out_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    if bias_ref is not None:
        logits += bias_ref[0, 0].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out_ref[0, 0] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _pick_tile(n: int) -> int:
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


def _make_rows_kernel(RB: int, H: int):
    """Row-blocked kernel: one program handles RB rows x H heads with the
    full key range in VMEM. Program count R/RB (vs R*H*tiles for the tiled
    kernel) — per-program launch overhead dominated the first design at
    pair-attention scale (R = B*N rows). Rows iterate via fori_loop (not
    unrolled) so only one row's intermediates are live — an unrolled
    RB x H body blew the 16 MB scoped-VMEM budget."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
        def row(b, _):
            mask = mask_ref[b, 0]  # [N]
            for h in range(H):     # static unroll over heads only
                q = q_ref[b, h]    # [N, C]
                k = k_ref[b, h]
                v = v_ref[b, h]
                logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
                logits = jnp.where(mask[None, :] < 0.5, NEG_INF, logits)
                probs = jax.nn.softmax(logits, axis=-1)
                out_ref[b, h] = jnp.dot(
                    probs.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, RB, row, 0)

    return kernel


def _make_rowhead_kernel(RB: int, fast: bool = False):
    """(row-block, head) grid: RB rows x ONE head per program, unrolled —
    small enough to keep VMEM bounded while letting Mosaic pipeline block
    DMAs across grid steps (the fori_loop variant serialized poorly).

    ``fast`` (cfg.fast_softmax, serving): softmax in bf16 — packed VPU
    exp/sum and HALF the per-row [N, N] VMEM. The MXU logits accumulator
    stays f32 (bf16 accumulation loses real accuracy; the cast happens
    AFTER the masked-fill, so NEG_INF = -2^15 is exactly representable).
    This is strictly tighter numerics than the XLA fast path
    (`_attention_reference` accumulates the logits gemm in bf16)."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
        for b in range(RB):
            mask = mask_ref[b, 0]
            q = q_ref[b, 0]
            k = k_ref[b, 0]
            v = v_ref[b, 0]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            logits = jnp.where(mask[None, :] < 0.5, NEG_INF, logits)
            if fast:
                logits = logits.astype(jnp.bfloat16)
            probs = jax.nn.softmax(logits, axis=-1)
            out_ref[b, 0] = jnp.dot(
                probs.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)

    return kernel


# Above this key length the full-key rows kernel's per-row [N, N] f32
# logits outgrow even the raised 100 MB scoped-VMEM grant (at N=2048:
# 16 MB logits x2 x RB=8 rows); switch to the K-chunked online-softmax
# variant whose VMEM is O(N * KCHUNK) at any N. Below it the full-key
# kernel is faster (N=1024: 323 vs 415 ms/step denoiser forward —
# BASELINE.md long-context table). PRD_KCHUNK_MIN_N lowers the switch
# point (benchmark sweeps; process-lifetime, like the other knobs).
ROWS_KCHUNK_MIN_N = int(os.environ.get("PRD_KCHUNK_MIN_N", 2048))
# f32 operands switch to the K-chunked kernel a rung earlier: the
# full-key kernel's per-row [N,N] VMEM buffering doubles at f32 and is
# measured SLOWER at N=1024 (406.7 ms full-key vs 323.8 ms K-chunked CN,
# round-3 probe) — bf16 keeps the full-key kernel through 1024 (323 ms
# vs 679 ms, BASELINE.md).
ROWS_KCHUNK_MIN_N_F32 = int(os.environ.get("PRD_KCHUNK_MIN_N_F32", 1024))
KCHUNK = 256

# Benchmark-sweep knobs, read ONCE at import: they are part of no jit
# cache key, so a trace-time read would silently ignore changes made
# after the first compile for a given shape. They are process-lifetime
# settings — run each sweep point in a fresh process (docs/SCALING.md).
_KCHUNK_ENV = os.environ.get("PRD_KCHUNK")
_KCHUNK_TARGET = int(_KCHUNK_ENV) if _KCHUNK_ENV else KCHUNK
_KCHUNK_RB_CAP = int(os.environ.get("PRD_KCHUNK_RB", 2))
# Full-key rows kernel row-block cap (sweep knob): the default 8 yields
# grid (R/8, H) — at N=384 that is 192 small programs and the isolated
# kernel runs at ~3.4% MFU (round-3 roofline probe); larger RB = fewer,
# bigger programs (VMEM: RB x [N,N] f32 logits, 100 MB grant).
_ROWS_RB_CAP = int(os.environ.get("PRD_ROWS_RB", 8))
_KCHUNK_GRID = os.environ.get("PRD_KCHUNK_GRID", "1") != "0"
# CN operand layout for the grid variant: operands/output as [R,H,C,N]
# (N minor). The [R,H,N,C] layout's C=16 minor dim is lane-padded 16->128
# by the kernel's layout constraint — an 8x HBM expansion (4 GB per
# operand at N=2048) that OOMed the chip by 258 MB with the whole model
# in residence. Transposed operands are UNPADDED (C=16 is a sublane
# multiple), so the same kernel math fits easily. Default ON; opt out
# with PRD_KCHUNK_CN=0.
_KCHUNK_CN = os.environ.get("PRD_KCHUNK_CN", "1") != "0"


def _make_rowhead_kchunk_kernel(RB: int, KC: int, NK: int):
    """RB rows x ONE head per program, keys visited in NK chunks of KC
    with a running-max/denominator (online softmax, exact up to fp
    reassociation). The logits tile is [N, KC] instead of [N, N], so
    VMEM stays bounded at any context length."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
        for b in range(RB):
            q = q_ref[b, 0]                       # [N, C]
            N = q.shape[0]
            C = v_ref.shape[-1]

            def kstep(i, carry):
                m_run, s_run, acc = carry
                k = k_ref[b, 0, pl.ds(i * KC, KC)]     # [KC, C]
                v = v_ref[b, 0, pl.ds(i * KC, KC)]     # [KC, C]
                mk = mask_ref[b, 0, pl.ds(i * KC, KC)]  # [KC]
                logits = jnp.dot(
                    q, k.T, preferred_element_type=jnp.float32
                )                                       # [N, KC]
                logits = jnp.where(mk[None, :] < 0.5, NEG_INF, logits)
                m_new = jnp.maximum(
                    m_run, jnp.max(logits, axis=-1, keepdims=True)
                )
                scale = jnp.exp(m_run - m_new)
                p = jnp.exp(logits - m_new)             # [N, KC]
                s_new = s_run * scale + jnp.sum(p, axis=-1, keepdims=True)
                acc_new = acc * scale + jnp.dot(
                    p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                )
                return m_new, s_new, acc_new

            m0 = jnp.full((N, 1), -jnp.inf, jnp.float32)
            s0 = jnp.zeros((N, 1), jnp.float32)
            a0 = jnp.zeros((N, C), jnp.float32)
            _, s_fin, acc = jax.lax.fori_loop(0, NK, kstep, (m0, s0, a0))
            out_ref[b, 0] = (acc / s_fin).astype(out_ref.dtype)

    return kernel


def _make_rowhead_kchunk_grid_kernel(RB: int):
    """K-chunked online softmax with the key axis as a GRID dimension:
    grid (R//RB, H, NK), carries (running max / denominator / output
    accumulator) in VMEM scratch persisted across the sequential k-chunk
    steps. Versus the fori_loop variant (`_make_rowhead_kchunk_kernel`)
    this lets Mosaic double-buffer the K/V chunk DMAs across grid steps
    (the fori_loop body's `pl.ds` loads serialize against compute) and
    keeps the kernel body small — the fori_loop variant FAILED to
    compile at N=2048 on v5e (remote tpu_compile_helper exit 1,
    BASELINE.md long-context table); this is the default K-chunked
    variant (opt out with PRD_KCHUNK_GRID=0)."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref,
               m_scr, s_scr, acc_scr):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            s_scr[...] = jnp.zeros(s_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        for b in range(RB):
            q = q_ref[b, 0]          # [N, C]
            k = k_ref[b, 0]          # [KC, C]
            v = v_ref[b, 0]          # [KC, C]
            mk = mask_ref[b, 0]      # [KC]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            logits = jnp.where(mk[None, :] < 0.5, NEG_INF, logits)
            m_run = m_scr[b]         # [N, 1]
            s_run = s_scr[b]
            acc = acc_scr[b]         # [N, C]
            m_new = jnp.maximum(
                m_run, jnp.max(logits, axis=-1, keepdims=True)
            )
            scale = jnp.exp(m_run - m_new)
            p = jnp.exp(logits - m_new)              # [N, KC]
            m_scr[b] = m_new
            s_scr[b] = s_run * scale + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[b] = acc * scale + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

        @pl.when(j == pl.num_programs(2) - 1)
        def _finalize():
            for b in range(RB):
                out_ref[b, 0] = (
                    acc_scr[b] / s_scr[b]
                ).astype(out_ref.dtype)

    return kernel


def _make_rowhead_kchunk_grid_cn_kernel(RB: int):
    """CN-layout variant of the grid K-chunked kernel: operands and
    output are [R, H, C, N] (N minor) so the HBM buffers are unpadded —
    the [R,H,N,C] layout's 16-wide minor dim is lane-padded 8x, which
    OOMed the chip at N=2048 (see _KCHUNK_CN). The math runs entirely
    in the transposed space: logits^T [KC, N] with a column-wise online
    softmax, accumulator [C, N]."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref,
               m_scr, s_scr, acc_scr):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            s_scr[...] = jnp.zeros(s_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        for b in range(RB):
            qT = q_ref[b, 0]         # [C, N]
            kT = k_ref[b, 0]         # [C, KC]
            vT = v_ref[b, 0]         # [C, KC]
            mk = mask_ref[b, 0]      # [KC]
            # logits^T[kc, n] = sum_c kT[c, kc] * qT[c, n]
            logitsT = jax.lax.dot_general(
                kT, qT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                        # [KC, N]
            logitsT = jnp.where(mk[:, None] < 0.5, NEG_INF, logitsT)
            m_run = m_scr[b]         # [1, N]
            s_run = s_scr[b]
            acc = acc_scr[b]         # [C, N]
            m_new = jnp.maximum(
                m_run, jnp.max(logitsT, axis=0, keepdims=True)
            )
            scale = jnp.exp(m_run - m_new)           # [1, N]
            p = jnp.exp(logitsT - m_new)             # [KC, N]
            m_scr[b] = m_new
            s_scr[b] = s_run * scale + jnp.sum(p, axis=0, keepdims=True)
            acc_scr[b] = acc * scale + jnp.dot(
                vT, p.astype(vT.dtype), preferred_element_type=jnp.float32
            )

        @pl.when(j == pl.num_programs(2) - 1)
        def _finalize():
            for b in range(RB):
                out_ref[b, 0] = (
                    acc_scr[b] / s_scr[b]
                ).astype(out_ref.dtype)

    return kernel


def _rows_attention_kchunk_grid_cn(qt, kt, vt, mask, kc, RB, interpret):
    """pallas_call wrapper for the CN-layout grid kernel: transposes
    [R,H,N,C] -> [R,H,C,N] around the call (XLA materializes the
    transposed operands UNPADDED; the N,C-minor forms it would otherwise
    constrain are 8x lane-padded in HBM)."""
    R, H, N, C = qt.shape
    NK = N // kc
    grid = (R // RB, H, NK)
    qtt = jnp.swapaxes(qt, -1, -2)
    ktt = jnp.swapaxes(kt, -1, -2)
    vtt = jnp.swapaxes(vt, -1, -2)
    out_t = pl.pallas_call(
        _make_rowhead_kchunk_grid_cn_kernel(RB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, 1, C, N), lambda i, h, j: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, C, kc), lambda i, h, j: (i, h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, C, kc), lambda i, h, j: (i, h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, kc), lambda i, h, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (RB, 1, C, N), lambda i, h, j: (i, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((R, H, C, N), qt.dtype),
        scratch_shapes=[
            pltpu.VMEM((RB, 1, N), jnp.float32),
            pltpu.VMEM((RB, 1, N), jnp.float32),
            pltpu.VMEM((RB, C, N), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * H * N * N * C,
            bytes_accessed=8 * R * N * H * C,
            transcendentals=R * H * N * N,
        ),
    )(qtt, ktt, vtt, mask[:, None, :])
    return jnp.swapaxes(out_t, -1, -2)


def _make_rowhead_kchunk_grid_cn_stats_kernel(RB: int):
    """CN-layout grid K-chunked forward that ALSO emits the row softmax
    stats ([1, N] per row-head): the flash backward's recompute pass.
    Same online-softmax math as `_make_rowhead_kchunk_grid_cn_kernel`.

    The stats are the row max `m` and `log s` SEPARATELY, not the single
    lse = m + log s: padding rows have m = NEG_INF = -2^15, where one
    f32 ulp is ~4e-3, so a fused lse would quantize log s and the
    backward's recomputed uniform probs exp(logits - lse) would be off
    by ~1e-3 relative (measured; dv of fully-masked rows). With the
    split, the backward's (logits - m) cancellation is exact."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, m_ref, logs_ref,
               m_scr, s_scr, acc_scr):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            s_scr[...] = jnp.zeros(s_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        for b in range(RB):
            qT = q_ref[b, 0]         # [C, N]
            kT = k_ref[b, 0]         # [C, KC]
            vT = v_ref[b, 0]         # [C, KC]
            mk = mask_ref[b, 0]      # [KC]
            logitsT = jax.lax.dot_general(
                kT, qT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                        # [KC, N]
            logitsT = jnp.where(mk[:, None] < 0.5, NEG_INF, logitsT)
            m_run = m_scr[b]         # [1, N]
            s_run = s_scr[b]
            acc = acc_scr[b]         # [C, N]
            m_new = jnp.maximum(
                m_run, jnp.max(logitsT, axis=0, keepdims=True)
            )
            scale = jnp.exp(m_run - m_new)           # [1, N]
            p = jnp.exp(logitsT - m_new)             # [KC, N]
            m_scr[b] = m_new
            s_scr[b] = s_run * scale + jnp.sum(p, axis=0, keepdims=True)
            acc_scr[b] = acc * scale + jnp.dot(
                vT, p.astype(vT.dtype), preferred_element_type=jnp.float32
            )

        @pl.when(j == pl.num_programs(2) - 1)
        def _finalize():
            for b in range(RB):
                out_ref[b, 0] = (
                    acc_scr[b] / s_scr[b]
                ).astype(out_ref.dtype)
                m_ref[b, 0] = m_scr[b]
                logs_ref[b, 0] = jnp.log(s_scr[b])

    return kernel


def _kchunk_grid_cn_stats_call(qtt, ktt, vtt, mask, kc, RB, interpret):
    """Stats pallas_call for the flash backward: operands ALREADY in CN
    layout [R, H, C, N]. Returns (out_t [R,H,C,N], m [R,H,1,N] f32,
    logs [R,H,1,N] f32) with lse = m + logs kept split (see the stats
    kernel docstring)."""
    R, H, C, N = qtt.shape
    NK = N // kc
    grid = (R // RB, H, NK)
    out_t, m, logs = pl.pallas_call(
        _make_rowhead_kchunk_grid_cn_stats_kernel(RB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, 1, C, N), lambda i, h, j: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, C, kc), lambda i, h, j: (i, h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, C, kc), lambda i, h, j: (i, h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, kc), lambda i, h, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((RB, 1, C, N), lambda i, h, j: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, 1, N), lambda i, h, j: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, 1, N), lambda i, h, j: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, H, C, N), qtt.dtype),
            jax.ShapeDtypeStruct((R, H, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((R, H, 1, N), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((RB, 1, N), jnp.float32),
            pltpu.VMEM((RB, 1, N), jnp.float32),
            pltpu.VMEM((RB, C, N), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * H * N * N * C,
            bytes_accessed=8 * R * N * H * C,
            transcendentals=R * H * N * N,
        ),
    )(qtt, ktt, vtt, mask[:, None, :])
    return out_t, m, logs


def _make_rowhead_kchunk_grid_cn_bwd_kernel(RB: int):
    """CN-layout K-chunked flash backward: grid (R//RB, H, NK). Probs are
    recomputed per key chunk from the stats pass's split (m, log s)
    stats (P^T = exp((L^T - m) - log s); split so padding rows at
    m = NEG_INF keep full precision), so VMEM stays O(KC * N) — the
    full-key backward's per-row
    [N, N] f32 intermediates (67 MB at N=2048) never materialize, and
    the CN operands keep HBM unpadded (the [R,H,N,C] layout's 8x lane
    padding OOMed the chip at N=2048, see _KCHUNK_CN).

    Gradient math (delta_i = dO_i . O_i = sum_j P_ij dP_ij):
      dS^T = P^T * (dP^T - delta), zeroed at masked key rows (the
      autodiff `where` filter — same semantics as the full-key backward
      kernel: a fully-masked row's uniform probs still feed dv, but its
      dq/dk are exactly zero);
      dv^T_kc = g^T P^T_kc^T, dk^T_kc = q^T dS^T_kc^T (per-chunk
      outputs), dq^T += k^T_kc dS^T_kc (VMEM accumulator across the
      sequential k-chunk grid axis)."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, m_ref, logs_ref,
               delta_ref, dq_ref, dk_ref, dv_ref, dq_scr):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

        for b in range(RB):
            qT = q_ref[b, 0]          # [C, N] (pre-scaled q)
            kT = k_ref[b, 0]          # [C, KC]
            vT = v_ref[b, 0]          # [C, KC]
            mk = mask_ref[b, 0]       # [KC]
            gT = g_ref[b, 0]          # [C, N] (dO)
            m = m_ref[b, 0]           # [1, N] f32
            logs = logs_ref[b, 0]     # [1, N] f32
            delta = delta_ref[b, 0]   # [1, N] f32
            logitsT = jax.lax.dot_general(
                kT, qT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                         # [KC, N]
            logitsT = jnp.where(mk[:, None] < 0.5, NEG_INF, logitsT)
            pT = jnp.exp((logitsT - m) - logs)       # [KC, N] f32
            dpT = jax.lax.dot_general(
                vT, gT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                         # [KC, N]
            dsT = pT * (dpT - delta)
            dsT = jnp.where(mk[:, None] < 0.5, 0.0, dsT)
            pTc = pT.astype(vT.dtype)
            dsTc = dsT.astype(qT.dtype)
            # dv^T[c, kc] = sum_n g^T[c, n] P^T[kc, n]
            dv_ref[b, 0] = jax.lax.dot_general(
                gT, pTc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            # dk^T[c, kc] = sum_n q^T[c, n] dS^T[kc, n]
            dk_ref[b, 0] = jax.lax.dot_general(
                qT, dsTc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)
            # dq^T[c, n] += sum_kc k^T[c, kc] dS^T[kc, n]
            dq_scr[b] = dq_scr[b] + jnp.dot(
                kT, dsTc, preferred_element_type=jnp.float32
            )

        @pl.when(j == pl.num_programs(2) - 1)
        def _fin():
            for b in range(RB):
                dq_ref[b, 0] = dq_scr[b].astype(dq_ref.dtype)

    return kernel


def _rows_attention_kchunk_bwd_cn(qt, kt, vt, mask, gt, kc, RB, interpret):
    """Flash backward for the K-chunked regime (N >= the kchunk switch
    point, where the full-key backward's [N,N] VMEM blocks and NC-minor
    HBM padding both stop fitting). Two passes, both O(KC*N) VMEM on
    unpadded CN operands: (1) stats recompute (forward + split m/log s
    row stats), (2) the gradient kernel. Inputs/outputs in [R, H, N, C]
    like the full-key backward; dq is w.r.t. the PRE-SCALED q.

    This no-stats entry is the fallback for bwd calls whose forward did
    not stash stats (PRD_KCHUNK_GRID=0 / PRD_KCHUNK_CN=0 configurations,
    or direct `_rows_attention_bwd` callers); the training default path
    saves (out, m, log s) from the custom-vjp forward instead
    (`_rows_attention_fwd_stats`) and skips this recompute pass."""
    R, H, N, C = qt.shape
    qtt = jnp.swapaxes(qt, -1, -2)
    ktt = jnp.swapaxes(kt, -1, -2)
    vtt = jnp.swapaxes(vt, -1, -2)
    gtt = jnp.swapaxes(gt, -1, -2)
    out_t, m, logs = _kchunk_grid_cn_stats_call(
        qtt, ktt, vtt, mask, kc, RB, interpret
    )
    # delta_i = dO_i . O_i (f32; cheap XLA reduction over C)
    delta = jnp.sum(
        gtt.astype(jnp.float32) * out_t.astype(jnp.float32),
        axis=2, keepdims=True,
    )                                 # [R, H, 1, N]
    return _kchunk_grid_cn_grads_call(
        qtt, ktt, vtt, mask, gtt, m, logs, delta, kc, RB, interpret
    )


def _kchunk_grid_cn_grads_call(qtt, ktt, vtt, mask, gtt, m, logs, delta,
                               kc, RB, interpret):
    """The gradient pallas_call of the K-chunked flash backward: CN
    operands [R,H,C,N], split stats m/logs and delta [R,H,1,N] f32.
    Returns (dq, dk, dv) in [R, H, N, C]."""
    R, H, C, N = qtt.shape
    NK = N // kc
    grid = (R // RB, H, NK)
    full_spec = pl.BlockSpec(
        (RB, 1, C, N), lambda i, h, j: (i, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    chunk_spec = pl.BlockSpec(
        (RB, 1, C, kc), lambda i, h, j: (i, h, 0, j),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (RB, 1, 1, N), lambda i, h, j: (i, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dq_t, dk_t, dv_t = pl.pallas_call(
        _make_rowhead_kchunk_grid_cn_bwd_kernel(RB),
        grid=grid,
        in_specs=[
            full_spec, chunk_spec, chunk_spec,
            pl.BlockSpec((RB, 1, kc), lambda i, h, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            full_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=(full_spec, chunk_spec, chunk_spec),
        out_shape=(
            jax.ShapeDtypeStruct((R, H, C, N), qtt.dtype),
            jax.ShapeDtypeStruct((R, H, C, N), ktt.dtype),
            jax.ShapeDtypeStruct((R, H, C, N), vtt.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((RB, C, N), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * R * H * N * N * C,
            bytes_accessed=16 * R * N * H * C,
            transcendentals=2 * R * H * N * N,
        ),
    )(qtt, ktt, vtt, mask[:, None, :], gtt, m, logs, delta)
    return (
        jnp.swapaxes(dq_t, -1, -2),
        jnp.swapaxes(dk_t, -1, -2),
        jnp.swapaxes(dv_t, -1, -2),
    )


def _rows_attention_kchunk_grid(qt, kt, vt, mask, kc, RB, interpret):
    """pallas_call wrapper for the grid-variant K-chunked kernel."""
    R, H, N, C = qt.shape
    NK = N // kc
    grid = (R // RB, H, NK)
    out = pl.pallas_call(
        _make_rowhead_kchunk_grid_kernel(RB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, 1, N, C), lambda i, h, j: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, kc, C), lambda i, h, j: (i, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, kc, C), lambda i, h, j: (i, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, kc), lambda i, h, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (RB, 1, N, C), lambda i, h, j: (i, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((R, H, N, C), qt.dtype),
        scratch_shapes=[
            pltpu.VMEM((RB, N, 1), jnp.float32),
            pltpu.VMEM((RB, N, 1), jnp.float32),
            pltpu.VMEM((RB, N, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # i and h are embarrassingly parallel; only the k-chunk axis
            # carries state (the VMEM scratch accumulators).
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * H * N * N * C,
            bytes_accessed=8 * R * N * H * C,
            transcendentals=R * H * N * N,
        ),
    )(qt, kt, vt, mask[:, None, :])
    return out


def _kchunk_select(N, dtype):
    """Chunk size for the K-chunked online-softmax regime, or 0 for the
    full-key kernels. Shared by the forward and the flash backward so
    both sides of a custom VJP land in the same regime."""
    kchunk_min_n = ROWS_KCHUNK_MIN_N
    if dtype == jnp.float32:
        kchunk_min_n = min(kchunk_min_n, ROWS_KCHUNK_MIN_N_F32)
    kc = 0
    if N >= kchunk_min_n:
        # Largest chunk divisor <= the target; buckets are multiples of
        # 128 so the ladder always finds one for auto-selected shapes.
        # PRD_KCHUNK overrides the chunk target (benchmark sweeps).
        for cand in (_KCHUNK_TARGET, _KCHUNK_TARGET // 2,
                     _KCHUNK_TARGET // 4, _KCHUNK_TARGET // 8):
            if cand > 0 and N % cand == 0:
                kc = cand
                break
        if kc == 0 and _KCHUNK_ENV:
            # An explicit sweep value whose ladder has no divisor of N
            # would silently select the full-key kernel — exactly the
            # configuration documented to fail TPU compilation at this
            # size. Fail loudly instead of with a remote compile error.
            raise ValueError(
                f"PRD_KCHUNK={_KCHUNK_ENV}: no chunk in its /2/4/8 "
                f"ladder divides N={N}; pick a divisor of N"
            )
    return kc


def _kchunk_rb(R):
    """Row block for the K-chunked kernels: their unrolled rows each
    hold live online-softmax carries ([N,1] m/s pad to [N,128] lanes +
    the [N,C] accumulator); at RB=8 and N>=1024 those plus grid
    double-buffering blow the scoped-VMEM budget (compile fails at any
    grid > (1,1)) — cap RB. PRD_KCHUNK_RB caps it (benchmark sweeps)."""
    cands = dict.fromkeys(
        c for c in (_KCHUNK_RB_CAP, 2, 1) if 0 < c <= _KCHUNK_RB_CAP
    )
    for cand in cands:
        if R % cand == 0:
            return cand
    return 1


def _rows_attention_impl(qt, kt, vt, mask, interpret, fast=False):
    """No-bias masked attention via the row-blocked kernel.

    qt/kt/vt: [R, H, N, C] (q pre-scaled); mask: [R, N].
    ``fast``: bf16 softmax in the FULL-KEY kernel (serving,
    cfg.fast_softmax); the K-chunked online-softmax regimes keep their
    f32 running max/denominator either way (a bf16 carry would compound
    across N/KC chunk updates rather than one reduction)."""
    R, H, N, C = qt.shape
    kc = _kchunk_select(N, qt.dtype)
    kchunked = kc > 0
    if kchunked:
        rb_cands = (_kchunk_rb(R),)
    else:
        rb_cands = tuple(dict.fromkeys(
            c for c in (_ROWS_RB_CAP, 8, 4, 2, 1) if c <= _ROWS_RB_CAP
        ))
    RB = 1
    for cand in rb_cands:
        if R % cand == 0:
            RB = cand
            break
    if kchunked and _KCHUNK_GRID:
        if _KCHUNK_CN:
            return _rows_attention_kchunk_grid_cn(qt, kt, vt, mask, kc,
                                                  RB, interpret)
        return _rows_attention_kchunk_grid(qt, kt, vt, mask, kc, RB,
                                           interpret)
    grid = (R // RB, H)
    spec_qkv = pl.BlockSpec(
        (RB, 1, N, C), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM
    )
    if kchunked:
        kernel = _make_rowhead_kchunk_kernel(RB, kc, N // kc)
    else:
        kernel = _make_rowhead_kernel(RB, fast)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec_qkv, spec_qkv, spec_qkv,
            pl.BlockSpec((RB, 1, N), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec_qkv,
        out_shape=jax.ShapeDtypeStruct((R, H, N, C), qt.dtype),
        interpret=interpret,
        # The default 16 MB scoped-VMEM budget is what failed N=1024 (and
        # f32 inputs at N=768): the unrolled rows' [N,N]-logits stacks
        # exceed it ("Scoped allocation ... exceeded scoped vmem limit").
        # v5e has 128 MB of VMEM; grant the kernel most of it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * H * N * N * C,
            bytes_accessed=8 * R * N * H * C,
            transcendentals=R * H * N * N,
        ),
    )(qt, kt, vt, mask[:, None, :])
    return out


def _make_rowhead_bwd_kernel(RB: int):
    """Flash-style backward of the full-key rows kernel: one (row-block,
    head) program recomputes this block's probs in VMEM and emits
    dq/dk/dv directly — the einsum-reference VJP instead materializes
    the [R, H, N, N] probs AND their cotangent in HBM, which is why
    training previously kept the XLA path (resolve_attention_plan).

    Gradient semantics match jax.vjp of `_attention_reference` exactly:
    - dv = P^T dO (fully-masked rows contribute their uniform probs,
      as the reference's constant-NEG_INF softmax does);
    - dS is zeroed at masked key columns (autodiff's `where` filter) —
      for partially-masked rows probs already underflow to 0 there, but
      a FULLY-masked row has uniform probs, and without the filter its
      dq/dk would be spuriously nonzero."""

    def kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
               dq_ref, dk_ref, dv_ref):
        for b in range(RB):
            mask = mask_ref[b, 0]  # [N]
            q = q_ref[b, 0]        # [N, C], pre-scaled
            k = k_ref[b, 0]
            v = v_ref[b, 0]
            g = g_ref[b, 0]        # dO [N, C]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            logits = jnp.where(mask[None, :] < 0.5, NEG_INF, logits)
            probs = jax.nn.softmax(logits, axis=-1)      # [N, N] f32
            pv = probs.astype(v.dtype)
            dv_ref[b, 0] = jnp.dot(
                pv.T, g, preferred_element_type=jnp.float32
            ).astype(dv_ref.dtype)
            dp = jnp.dot(
                g, v.T, preferred_element_type=jnp.float32
            )                                            # [N, N]
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            ds = jnp.where(mask[None, :] < 0.5, 0.0, ds)
            dsd = ds.astype(q.dtype)
            dq_ref[b, 0] = jnp.dot(
                dsd, k, preferred_element_type=jnp.float32
            ).astype(dq_ref.dtype)
            dk_ref[b, 0] = jnp.dot(
                dsd.T, q, preferred_element_type=jnp.float32
            ).astype(dk_ref.dtype)

    return kernel


def _rows_attention_bwd_impl(qt, kt, vt, mask, gt, interpret):
    """Backward pallas_call for `_rows_attention`. Mirrors the forward's
    regime split (`_kchunk_select`): below the K-chunk switch point the
    full-key kernel recomputes each row block's [N, N] probs in VMEM;
    at/above it the CN-layout K-chunked flash backward takes over
    (`_rows_attention_kchunk_bwd_cn` — stats pass + O(KC*N)-VMEM
    gradient kernel on unpadded [R,H,C,N] operands). Returns
    (dqt, dkt, dvt) in [R, H, N, C] layout, dqt w.r.t. the PRE-SCALED
    q."""
    R, H, N, C = qt.shape
    kc = _kchunk_select(N, qt.dtype)
    if kc > 0:
        return _rows_attention_kchunk_bwd_cn(
            qt, kt, vt, mask, gt, kc, _kchunk_rb(R), interpret
        )
    # Four live [N, N] f32 intermediates per unrolled row (logits/probs
    # reuse aside: budget conservatively) — pick the largest row block
    # that stays within ~64 MB so the 100 MB grant also covers grid
    # double-buffering of the six [RB, N, C] operands.
    budget = 64 * 1024 * 1024
    RB = 1
    for cand in (8, 4, 2):
        if R % cand == 0 and cand * 4 * N * N * 4 <= budget:
            RB = cand
            break
    grid = (R // RB, H)
    spec = pl.BlockSpec(
        (RB, 1, N, C), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM
    )
    mspec = pl.BlockSpec(
        (RB, 1, N), lambda i, h: (i, 0, 0), memory_space=pltpu.VMEM
    )
    shp = jax.ShapeDtypeStruct((R, H, N, C), qt.dtype)
    dq, dk, dv = pl.pallas_call(
        _make_rowhead_bwd_kernel(RB),
        grid=grid,
        in_specs=[spec, spec, spec, mspec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shp, shp, shp),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * R * H * N * N * C,
            bytes_accessed=16 * R * N * H * C,
            transcendentals=R * H * N * N,
        ),
    )(qt, kt, vt, mask[:, None, :], gt)
    return dq, dk, dv


# --------------------------------------------------------------- GSPMD
# The attention kernels are embarrassingly parallel over their leading
# rows axis (R = B*N for triangle attention, R = B for single/SP
# attention): under a 'data'-sharded mesh each device can simply run the
# kernel on its local row shard. GSPMD cannot repartition a bare
# pallas_call, so every kernel entry point is wrapped in
# jax.experimental.custom_partitioning with an einsum-style sharding
# rule that shards ONLY the rows factor — this is what lets mesh
# data-parallel sampling (SamplingRunner(mesh=...)) and mesh training
# keep the measured-fastest kernel paths instead of falling back to
# XLA. The partition callback pins every operand/result to a
# leading-dim-only sharding, so a stray proposal to shard N/H/C (which
# the full-key kernels cannot honor) is resharded away by GSPMD instead
# of producing wrong numerics. Verified sharded-vs-unsharded bit-exact
# on an 8-device mesh (tests/test_pallas.py::TestShardedKernels).

def _lead_only(mesh, sharding):
    from jax.sharding import NamedSharding, PartitionSpec

    spec = getattr(sharding, "spec", None)
    lead = spec[0] if spec is not None and len(spec) > 0 else None
    return NamedSharding(mesh, PartitionSpec(lead))


def _rows_partition(interpret, fast, mesh, arg_shapes, result_shape):
    args_sh = tuple(_lead_only(mesh, s.sharding) for s in arg_shapes)
    out_sh = _lead_only(mesh, arg_shapes[0].sharding)

    def impl(qt, kt, vt, mask):
        return _rows_attention_impl(qt, kt, vt, mask, interpret, fast)

    return mesh, impl, out_sh, args_sh


def _rows_infer(interpret, fast, mesh, arg_shapes, shape):
    return _lead_only(mesh, arg_shapes[0].sharding)


_rows_attention = functools.partial(
    custom_partitioning, static_argnums=(4, 5)
)(_rows_attention_impl)
_rows_attention.def_partition(
    partition=_rows_partition,
    infer_sharding_from_operands=_rows_infer,
    # Distinct query (m) / key (n) factors: the kernel needs the FULL key
    # range per row, so nothing but r may shard.
    sharding_rule="r h m c, r h n c, r h n c, r n -> r h m c",
)


def _rows_bwd_partition(interpret, mesh, arg_shapes, result_shape):
    args_sh = tuple(_lead_only(mesh, s.sharding) for s in arg_shapes)
    lead = _lead_only(mesh, arg_shapes[0].sharding)

    def impl(qt, kt, vt, mask, gt):
        return _rows_attention_bwd_impl(qt, kt, vt, mask, gt, interpret)

    return mesh, impl, (lead, lead, lead), args_sh


def _rows_bwd_infer(interpret, mesh, arg_shapes, shape):
    lead = _lead_only(mesh, arg_shapes[0].sharding)
    return (lead, lead, lead)


_rows_attention_bwd = functools.partial(
    custom_partitioning, static_argnums=(5,)
)(_rows_attention_bwd_impl)
_rows_attention_bwd.def_partition(
    partition=_rows_bwd_partition,
    infer_sharding_from_operands=_rows_bwd_infer,
    sharding_rule=(
        "r h m c, r h n c, r h n c, r n, r h m c "
        "-> r h m c, r h n c, r h n c"
    ),
)


def _rows_attention_fwd_stats_impl(qt, kt, vt, mask, interpret):
    """Forward for the K-chunked flash-backward regime: the CN stats
    kernel emits (out, m, log s) in ONE pass so the custom-vjp forward
    can stash them as residuals and the backward skips its stats
    recompute — one full forward's QK/softmax/PV per grad step
    (~4 of the ~15 N^2*C matmul-units of fwd+bwd) saved in the regime
    where steps cost seconds (N>=2048; f32 N>=1024). Only called when
    `_kchunk_select` > 0 and the CN grid variant is enabled.

    qt/kt/vt: [R, H, N, C] (q pre-scaled); mask [R, N].
    Returns (out [R,H,N,C], m [R,H,N] f32, log s [R,H,N] f32)."""
    R, H, N, C = qt.shape
    kc = _kchunk_select(N, qt.dtype)
    RB = _kchunk_rb(R)
    out_t, m, logs = _kchunk_grid_cn_stats_call(
        jnp.swapaxes(qt, -1, -2),
        jnp.swapaxes(kt, -1, -2),
        jnp.swapaxes(vt, -1, -2),
        mask, kc, RB, interpret,
    )
    return jnp.swapaxes(out_t, -1, -2), m[:, :, 0, :], logs[:, :, 0, :]


def _rows_stats_partition(interpret, mesh, arg_shapes, result_shape):
    args_sh = tuple(_lead_only(mesh, s.sharding) for s in arg_shapes)
    lead = _lead_only(mesh, arg_shapes[0].sharding)

    def impl(qt, kt, vt, mask):
        return _rows_attention_fwd_stats_impl(qt, kt, vt, mask, interpret)

    return mesh, impl, (lead, lead, lead), args_sh


def _rows_stats_infer(interpret, mesh, arg_shapes, shape):
    lead = _lead_only(mesh, arg_shapes[0].sharding)
    return (lead, lead, lead)


_rows_attention_fwd_stats = functools.partial(
    custom_partitioning, static_argnums=(4,)
)(_rows_attention_fwd_stats_impl)
_rows_attention_fwd_stats.def_partition(
    partition=_rows_stats_partition,
    infer_sharding_from_operands=_rows_stats_infer,
    sharding_rule=(
        "r h m c, r h n c, r h n c, r n -> r h m c, r h m, r h m"
    ),
)


def _rows_attention_bwd_stats_impl(qt, kt, vt, mask, gt, out, m, logs,
                                   interpret):
    """K-chunked flash backward fed by forward-stashed stats: skips the
    stats-recompute pallas_call of `_rows_attention_kchunk_bwd_cn`.
    out/m/logs are `_rows_attention_fwd_stats`'s outputs ([R,H,N,C] /
    [R,H,N] f32); dq is w.r.t. the PRE-SCALED q."""
    R, H, N, C = qt.shape
    kc = _kchunk_select(N, qt.dtype)
    RB = _kchunk_rb(R)
    # delta_i = dO_i . O_i (f32; cheap XLA reduction over C) — layout-
    # free, so compute it on the NC residuals before transposing.
    delta = jnp.sum(
        gt.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, :, None, :]                  # [R, H, 1, N]
    return _kchunk_grid_cn_grads_call(
        jnp.swapaxes(qt, -1, -2),
        jnp.swapaxes(kt, -1, -2),
        jnp.swapaxes(vt, -1, -2),
        mask,
        jnp.swapaxes(gt, -1, -2),
        m[:, :, None, :], logs[:, :, None, :], delta,
        kc, RB, interpret,
    )


def _rows_bwd_stats_partition(interpret, mesh, arg_shapes, result_shape):
    args_sh = tuple(_lead_only(mesh, s.sharding) for s in arg_shapes)
    lead = _lead_only(mesh, arg_shapes[0].sharding)

    def impl(qt, kt, vt, mask, gt, out, m, logs):
        return _rows_attention_bwd_stats_impl(
            qt, kt, vt, mask, gt, out, m, logs, interpret
        )

    return mesh, impl, (lead, lead, lead), args_sh


_rows_attention_bwd_st = functools.partial(
    custom_partitioning, static_argnums=(8,)
)(_rows_attention_bwd_stats_impl)
_rows_attention_bwd_st.def_partition(
    partition=_rows_bwd_stats_partition,
    infer_sharding_from_operands=_rows_bwd_infer,
    sharding_rule=(
        "r h m c, r h n c, r h n c, r n, r h m c, r h m c, r h m, r h m "
        "-> r h m c, r h n c, r h n c"
    ),
)


def _make_fused_gated_kernel(RB: int, H: int, cdt):
    """Fully-fused gated row attention: one program = RB rows, each row
    LN -> per-head QKV/gate projections -> masked softmax -> gating ->
    out-projection, accumulated across heads. Nothing but the pair rows
    is read from HBM and nothing but the final [N, D] rows is written —
    the XLA path round-trips LN(x), q, k, v, gate, probs and the gated
    output through HBM (~7 extra passes over [R, N, H*C] per call)."""

    def kernel(
        p_ref, m_ref, wq_ref, wk_ref, wv_ref, wg_ref, bg_ref,
        wo_ref, bo_ref, out_ref,
    ):
        C = wq_ref.shape[-1]
        scale = 1.0 / math.sqrt(C)
        for b in range(RB):
            x = p_ref[b].astype(jnp.float32)          # [N, D]
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            xl = ((x - mu) * jax.lax.rsqrt(var + 1e-5)).astype(cdt)
            mask = m_ref[b, 0]                        # [N]
            acc = None
            for h in range(H):
                q = jnp.dot(
                    xl, wq_ref[h], preferred_element_type=jnp.float32
                ) * scale
                k = jnp.dot(
                    xl, wk_ref[h], preferred_element_type=jnp.float32
                )
                v = jnp.dot(
                    xl, wv_ref[h], preferred_element_type=jnp.float32
                )
                g = jax.nn.sigmoid(
                    jnp.dot(
                        xl, wg_ref[h], preferred_element_type=jnp.float32
                    )
                    + bg_ref[h]
                )
                logits = jnp.dot(
                    q.astype(cdt), k.astype(cdt).T,
                    preferred_element_type=jnp.float32,
                )                                      # [N, N]
                logits = jnp.where(mask[None, :] < 0.5, NEG_INF, logits)
                probs = jax.nn.softmax(logits, axis=-1)
                o = jnp.dot(
                    probs.astype(cdt), v.astype(cdt),
                    preferred_element_type=jnp.float32,
                )                                      # [N, C]
                contrib = jnp.dot(
                    (g * o).astype(cdt), wo_ref[h],
                    preferred_element_type=jnp.float32,
                )                                      # [N, D]
                acc = contrib if acc is None else acc + contrib
            out_ref[b] = (acc + bo_ref[...]).astype(out_ref.dtype)

    return kernel


def _fused_gated_reference(pair, mask, wq, wk, wv, wg, bg, wo, bo, num_heads):
    """Pure-JAX math of fused_gated_rows_attention (the GatedAttention
    module path) — backward oracle for the custom VJP."""
    R, N, D = pair.shape
    H = num_heads
    C = wq.shape[-1] // H
    dt = pair.dtype
    x = pair.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xl = ((x - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt)
    q = (xl @ wq.astype(dt)).reshape(R, N, H, C)
    k = (xl @ wk.astype(dt)).reshape(R, N, H, C)
    v = (xl @ wv.astype(dt)).reshape(R, N, H, C)
    g = jax.nn.sigmoid(xl @ wg.astype(dt) + bg.astype(dt))
    o = _attention_reference(q, k, v, mask, None, 1.0 / math.sqrt(C))
    o = g * o.reshape(R, N, H * C)
    return o @ wo.astype(dt) + bo.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_gated_rows_attention(
    pair: jnp.ndarray,   # [R, N, D] rows (pre-LN)
    mask: jnp.ndarray,   # [R, N]
    wq: jnp.ndarray,     # [D, H*C] (q_proj kernel)
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wg: jnp.ndarray,
    bg: jnp.ndarray,     # [H*C]
    wo: jnp.ndarray,     # [H*C, D] (out_proj kernel)
    bo: jnp.ndarray,     # [D]
    num_heads: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-GatedAttention forward for the no-bias row case (triangle
    attention, reference `modules.py:170-243`) as one Pallas kernel.
    Inference only — training keeps the XLA path (resolve_attention_plan);
    gradients recompute via the pure-JAX reference math."""
    return _fused_gated_impl(
        pair, mask, wq, wk, wv, wg, bg, wo, bo, num_heads, interpret
    )


def _fused_gated_impl(
    pair, mask, wq, wk, wv, wg, bg, wo, bo, num_heads, interpret
):
    R, N, D = pair.shape
    H = num_heads
    C = wq.shape[-1] // H
    cdt = jnp.bfloat16 if not interpret else jnp.float32

    def per_head(w):  # [D, H*C] -> [H, D, C]
        return jnp.swapaxes(w.reshape(D, H, C), 0, 1).astype(cdt)

    wq_h, wk_h, wv_h, wg_h = map(per_head, (wq, wk, wv, wg))
    wo_h = wo.reshape(H, C, D).astype(cdt)
    bg_h = bg.reshape(H, 1, C).astype(jnp.float32)
    bo_r = bo.reshape(1, D).astype(jnp.float32)

    RB = 1
    for cand in (8, 4, 2):
        if R % cand == 0:
            RB = cand
            break
    grid = (R // RB,)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        _make_fused_gated_kernel(RB, H, cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((H, D, C)), wspec((H, D, C)), wspec((H, D, C)),
            wspec((H, D, C)), wspec((H, 1, C)),
            wspec((H, C, D)), wspec((1, D)),
        ],
        out_specs=pl.BlockSpec((RB, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, N, D), pair.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * H * N * N * C + 10 * R * N * D * H * C,
            bytes_accessed=4 * R * N * D,
            transcendentals=R * H * N * N,
        ),
    )(pair, mask[:, None, :], wq_h, wk_h, wv_h, wg_h, bg_h, wo_h, bo_r)
    return out


def _fused_gated_fwd(pair, mask, wq, wk, wv, wg, bg, wo, bo, nh, interp):
    out = _fused_gated_impl(
        pair, mask, wq, wk, wv, wg, bg, wo, bo, nh, interp
    )
    return out, (pair, mask, wq, wk, wv, wg, bg, wo, bo)


def _fused_gated_bwd(nh, interp, res, g):
    pair, mask, wq, wk, wv, wg, bg, wo, bo = res
    _, vjp = jax.vjp(
        lambda p, q, k, v, w, b, o, ob: _fused_gated_reference(
            p, mask, q, k, v, w, b, o, ob, nh
        ),
        pair, wq, wk, wv, wg, bg, wo, bo,
    )
    dp, dwq, dwk, dwv, dwg, dbg, dwo, dbo = vjp(g)
    return dp, None, dwq, dwk, dwv, dwg, dbg, dwo, dbo


fused_gated_rows_attention.defvjp(_fused_gated_fwd, _fused_gated_bwd)


def _attention_reference(q, k, v, mask, bias, scale, fast_softmax=False):
    """Plain einsum formulation (used for the VJP backward and as the
    numerics reference). fast_softmax keeps logits/probs in the compute
    dtype (bf16) — halves the dominant HBM traffic at serving time."""
    acc = q.dtype if fast_softmax else jnp.float32
    logits = jnp.einsum(
        "rihc,rjhc->rhij", q * scale, k, preferred_element_type=acc
    )
    if bias is not None:
        logits = logits + bias.astype(acc)
    if mask is not None:
        logits = jnp.where(
            mask[:, None, None, :] < 0.5, jnp.asarray(NEG_INF, acc), logits
        )
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "rhij,rjhc->rihc", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_attention(
    q: jnp.ndarray,            # [R, N, H, C]
    k: jnp.ndarray,            # [R, N, H, C]
    v: jnp.ndarray,            # [R, N, H, C]
    mask: Optional[jnp.ndarray],   # [R, N] or None
    bias: Optional[jnp.ndarray],   # [R, H, N, N] or None
    scale: float = 1.0,
    interpret: bool = False,
    kernel_bwd: bool = False,
    fast_softmax: bool = False,
) -> jnp.ndarray:
    """``kernel_bwd``: differentiate the no-bias masked rows case through
    the flash-style Pallas backward kernel instead of the einsum VJP —
    the training-path enablement (cfg.use_pallas_bwd). The bias'd case
    (single attention with pair bias) keeps the einsum VJP either way:
    its dbias output is itself [R, H, N, N], so there is nothing to
    save by avoiding the materialization.

    ``fast_softmax``: bf16 softmax inside the FULL-KEY rows kernel
    (serving lever, cfg.fast_softmax — f32 MXU logits accumulation, so
    tighter than the XLA fast path's bf16-accumulated gemm). Inference
    only: the stats/backward kernels and the K-chunked online-softmax
    regimes keep f32 softmax state regardless. When ``kernel_bwd`` is
    set the fast flag is dropped HERE TOO (mirroring ``_fwd``), so a
    no-grad forward under a training config produces the same numerics
    as the forward actually being differentiated (advisor r4)."""
    return _fused_attention_fwd_impl(
        q, k, v, mask, bias, scale, interpret,
        fast_softmax and not kernel_bwd,
    )


def _fused_attention_fwd_impl(q, k, v, mask, bias, scale, interpret,
                              fast=False):
    # [R, H, N, C] layout for row/head-major blocking.
    qt = jnp.swapaxes(q * scale, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if bias is None and mask is not None:
        # Triangle-attention shape (R = B*N rows): row-blocked kernel.
        out = _rows_attention(qt, kt, vt, mask, interpret, fast)
    elif mask is not None:
        out = _tiled_attention_mb(qt, kt, vt, mask, bias, interpret)
    elif bias is not None:
        out = _tiled_attention_b(qt, kt, vt, bias, interpret)
    else:
        out = _tiled_attention_nb(qt, kt, vt, interpret)
    return jnp.swapaxes(out, 1, 2)  # [R, N, H, C]


def _tiled_attention_impl(qt, kt, vt, mask, bias, interpret):
    """(row, head, q-tile)-grid kernel for the bias'd cases
    (single/SP attention). qt/kt/vt [R, H, N, C] (q pre-scaled);
    mask [R, N] or None; bias [R, H, N, N] or None."""
    R, H, N, C = qt.shape
    TQ = _pick_tile(N)
    grid = (R, H, N // TQ)
    in_specs = [
        pl.BlockSpec((1, 1, TQ, C), lambda r, h, i: (r, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N, C), lambda r, h, i: (r, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N, C), lambda r, h, i: (r, h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qt, kt, vt]
    if mask is not None:
        # [R, 1, N] so the trailing block dims are (1, N) == array dims
        # (TPU tiling requires trailing block dims divisible or full).
        in_specs.append(
            pl.BlockSpec((1, 1, N), lambda r, h, i: (r, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask[:, None, :])
        kernel = _attn_kernel
    else:
        kernel = _attn_kernel_nomask
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, TQ, N), lambda r, h, i: (r, h, i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kern = kernel
    else:
        # Partially apply bias_ref=None.
        if kernel is _attn_kernel:
            def kern(q_ref, k_ref, v_ref, mask_ref, out_ref):
                _attn_kernel(q_ref, k_ref, v_ref, mask_ref, None, out_ref)
        else:
            def kern(q_ref, k_ref, v_ref, out_ref):
                _attn_kernel_nomask(q_ref, k_ref, v_ref, None, out_ref)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, TQ, C), lambda r, h, i: (r, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((R, H, N, C), qt.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * R * H * N * N * C,
            bytes_accessed=(3 * R * N * H * C + R * N * H * C) * 2,
            transcendentals=R * H * N * N,
        ),
    )(*args)
    return out  # [R, H, N, C]


def _tiled_partition(n_args, interpret, mesh, arg_shapes, result_shape):
    args_sh = tuple(_lead_only(mesh, s.sharding) for s in arg_shapes)
    out_sh = _lead_only(mesh, arg_shapes[0].sharding)

    def impl(*ops):
        qt, kt, vt = ops[:3]
        mask = ops[3] if n_args == 5 else None
        bias = ops[-1] if n_args >= 4 else None
        return _tiled_attention_impl(qt, kt, vt, mask, bias, interpret)

    return mesh, impl, out_sh, args_sh


def _tiled_infer(interpret, mesh, arg_shapes, shape):
    return _lead_only(mesh, arg_shapes[0].sharding)


_tiled_attention_mb = functools.partial(
    custom_partitioning, static_argnums=(5,)
)(lambda qt, kt, vt, mask, bias, interpret: _tiled_attention_impl(
    qt, kt, vt, mask, bias, interpret))
_tiled_attention_mb.def_partition(
    partition=functools.partial(_tiled_partition, 5),
    infer_sharding_from_operands=_tiled_infer,
    sharding_rule="r h m c, r h n c, r h n c, r n, r h m n -> r h m c",
)

_tiled_attention_b = functools.partial(
    custom_partitioning, static_argnums=(4,)
)(lambda qt, kt, vt, bias, interpret: _tiled_attention_impl(
    qt, kt, vt, None, bias, interpret))
_tiled_attention_b.def_partition(
    partition=functools.partial(_tiled_partition, 4),
    infer_sharding_from_operands=_tiled_infer,
    sharding_rule="r h m c, r h n c, r h n c, r h m n -> r h m c",
)

_tiled_attention_nb = functools.partial(
    custom_partitioning, static_argnums=(3,)
)(lambda qt, kt, vt, interpret: _tiled_attention_impl(
    qt, kt, vt, None, None, interpret))
_tiled_attention_nb.def_partition(
    partition=functools.partial(_tiled_partition, 3),
    infer_sharding_from_operands=_tiled_infer,
    sharding_rule="r h m c, r h n c, r h n c -> r h m c",
)


def _fwd(q, k, v, mask, bias, scale, interpret, kernel_bwd, fast_softmax):
    if (
        kernel_bwd
        and bias is None
        and mask is not None
        and _KCHUNK_GRID
        and _KCHUNK_CN
        and _kchunk_select(q.shape[1], q.dtype) > 0
    ):
        # K-chunked flash-backward regime: run the stats-emitting CN
        # forward once and stash (out, m, log s) so the backward skips
        # its stats recompute (a full extra forward per grad step).
        # Under remat this fwd rule runs inside the rematerialized
        # backward pass, so the residuals are transient.
        qt = jnp.swapaxes(q * scale, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        out_h, m, logs = _rows_attention_fwd_stats(qt, kt, vt, mask,
                                                   interpret)
        out = jnp.swapaxes(out_h, 1, 2)  # [R, N, H, C]
        return out, (q, k, v, mask, bias, (out_h, m, logs))
    # Differentiated full-key path: drop the bf16 fast softmax so the
    # forward matches the flash backward's f32 probs recompute (the
    # fast flag is a serving lever; training numerics stay f32).
    out = _fused_attention_fwd_impl(q, k, v, mask, bias, scale, interpret,
                                    fast_softmax and not kernel_bwd)
    return out, (q, k, v, mask, bias, None)


def _bwd(scale, interpret, kernel_bwd, fast_softmax, residuals, g):
    q, k, v, mask, bias, stats = residuals

    # The rows backward covers BOTH kernel regimes: full-key below the
    # K-chunk switch point, the CN-layout K-chunked flash backward
    # at/above it (matching the forward's _kchunk_select split).
    flashable = bias is None and mask is not None
    if flashable and not kernel_bwd:
        # A caller differentiating an inference-mode model (kernel fwd,
        # kernel_bwd off) silently pays the einsum VJP, which
        # re-materializes the [R, H, N, N] logits in HBM — measured as a
        # net train-step LOSS vs plain XLA (BASELINE.md flash-backward
        # table). Trace-time warning: fires once per compile.
        import warnings

        warnings.warn(
            "fused_attention: differentiating through the Pallas forward "
            "with the einsum-VJP backward (re-materializes the attention "
            "logits in HBM). For training, set use_pallas_bwd=True "
            "(cfg.training_mode selects it by default) or use the XLA "
            "attention path."
            + (
                " Note: fast_softmax is on, so these gradients are "
                "gradients of the f32 reference forward, NOT of the bf16 "
                "fast forward actually evaluated (serving lever; advisor "
                "r4)."
                if fast_softmax
                else ""
            ),
            stacklevel=2,
        )
    if kernel_bwd and flashable:
        # Flash-style backward in VMEM (same rows-kernel regime split as
        # the forward — full-key or CN K-chunked via _kchunk_select).
        qt = jnp.swapaxes(q, 1, 2) * scale
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        gt = jnp.swapaxes(g, 1, 2)
        if stats is not None:
            out_h, m, logs = stats
            dqt, dkt, dvt = _rows_attention_bwd_st(
                qt, kt, vt, mask, gt, out_h, m, logs, interpret
            )
        else:
            dqt, dkt, dvt = _rows_attention_bwd(
                qt, kt, vt, mask, gt, interpret
            )
        return (
            jnp.swapaxes(dqt, 1, 2) * scale,  # d(q)/d(qt) chain: qt = q*scale
            jnp.swapaxes(dkt, 1, 2),
            jnp.swapaxes(dvt, 1, 2),
            None,
            None,
        )

    def ref_fn(q, k, v, bias):
        return _attention_reference(q, k, v, mask, bias, scale)

    if bias is None:
        _, vjp = jax.vjp(lambda q, k, v: ref_fn(q, k, v, None), q, k, v)
        dq, dk, dv = vjp(g)
        dbias = None
    else:
        _, vjp = jax.vjp(ref_fn, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, None, dbias


fused_attention.defvjp(_fwd, _bwd)


def gated_attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    scale: float,
    use_pallas: bool,
    interpret: bool = False,
    fast_softmax: bool = False,
    kernel_bwd: bool = False,
) -> jnp.ndarray:
    """Dispatch between the Pallas kernel and the einsum fallback.

    All inputs row-flattened: q/k/v [R, N, H, C]; mask [R, N];
    bias [R, H, N, N]. Output [R, N, H, C].
    """
    if use_pallas:
        return fused_attention(
            q, k, v, mask, bias, scale, interpret, kernel_bwd, fast_softmax
        )
    return _attention_reference(q, k, v, mask, bias, scale, fast_softmax)
