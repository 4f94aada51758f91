"""The SE(3)-equivariant denoiser trunk.

TPU-native redesign of the reference network (`/root/reference/ProteinReDiff/
modules.py:228-404` and `models/AF2_modules.py:369-545`): same math, flax
modules, bf16 compute, `jax.checkpoint` per FoldingBlock (replacing
torch.utils.checkpoint at `modules.py:399-401`), einsums laid out for MXU
batch-matmul lowering, and optional Pallas kernels for the O(N^3) triangle
ops.

Reference quirks reproduced deliberately for checkpoint parity
(SURVEY.md §7.3):
- SPAttention computes no key-padding mask bias — padded positions are
  attended (`AF2_modules.py:447` computes it but never appends it).
- SPAttention's per-head width equals single_dim (`modules.py:366-371`),
  so its QKV projections are single_dim -> num_heads*single_dim.
- SPAttention output is ``ln(x) + mha(ln(x))`` — the residual wraps the
  *normed* input (`AF2_modules.py:465-470`).
- OuterProductUpdate divides the post-linear (bias included) update by the
  mask outer product + 1e-3 (`AF2_modules.py:536-543`).
- Final pair symmetrization 0.5*(P + P^T) (`modules.py:403`).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .layers import (
    GatedAttention,
    LayerNorm,
    PRLinear,
    TransitionMLP,
    attention_core,
)

Dtype = Any


class TriangleAttention(nn.Module):
    """Row-wise ('starting') or column-wise ('ending') attention over pair
    rows (reference `modules.py:228-243`)."""

    head_dim: int
    num_heads: int
    mode: str  # "starting" | "ending"
    use_pallas: bool = False
    fused_gated: bool = False
    fast_softmax: bool = False
    attn_chunk: int = 0
    kernel_bwd: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pair: jnp.ndarray, mask_2d: jnp.ndarray) -> jnp.ndarray:
        if self.mode not in ("starting", "ending"):
            raise ValueError(f"Invalid mode: {self.mode}")
        if self.mode == "ending":
            pair = jnp.swapaxes(pair, -2, -3)
            mask_2d = jnp.swapaxes(mask_2d, -1, -2)
        out = GatedAttention(
            self.head_dim, self.num_heads, use_pallas=self.use_pallas,
            fused_gated=self.fused_gated,
            fast_softmax=self.fast_softmax, attn_chunk=self.attn_chunk,
            kernel_bwd=self.kernel_bwd,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(pair, mask_2d)
        if self.mode == "ending":
            out = jnp.swapaxes(out, -2, -3)
        return out


# Shared param-declaration helpers (moved to layers.py in round 2 so
# GatedAttention's fused path can use them too); aliases keep old names.
from .layers import DenseHandle as _DenseHandle  # noqa: E402


class TriangleMultiplication(nn.Module):
    """Gated triangle multiplicative update — the O(N^3) hot op
    (reference `modules.py:246-274`).

    XLA path: the einsum is arranged as a d-batched matmul
    ([d, N, N] x [d, N, N]) which XLA lowers straight onto the MXU.
    ``use_pallas``: the WHOLE op (LN -> gated projections -> triangle
    product -> LN -> gated out-projection) runs as one fused Pallas
    kernel (`ops/pallas_trimul.py`), eliminating the HBM round-trips of
    the gated [N,N,2D] activations and the f32 product; backward
    differentiates the reference math (custom_vjp).
    """

    mode: str  # "outgoing" | "incoming"
    use_pallas: bool = False
    fast_accum: bool = False  # bf16 einsum output (serving precision mode)
    dmajor: bool = False  # channel-major [d,N,N] contraction layout
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pair: jnp.ndarray, mask_2d: jnp.ndarray) -> jnp.ndarray:
        if self.mode not in ("outgoing", "incoming"):
            raise ValueError(f"Invalid mode: {self.mode}")
        D = pair.shape[-1]
        if self.use_pallas:
            from ..ops.pallas_trimul import triangle_multiply

            params = {}
            for name, dout, init in (
                ("ab_gate", 2 * D, "gating"),
                ("ab_proj", 2 * D, "default"),
                ("out_gate", D, "gating"),
                ("out_proj", D, "final"),
            ):
                kern, bias = _DenseHandle(
                    D, dout, init, param_dtype=self.param_dtype, name=name
                )()
                params[f"{name}_kernel"] = kern
                params[f"{name}_bias"] = bias
            return triangle_multiply(
                pair.astype(self.dtype),
                mask_2d.astype(self.dtype),
                params,
                self.mode,
            )
        # MXU accumulates f32 internally either way; fast_accum only lowers
        # the materialized [N,N,D] product's dtype (halves its HBM traffic).
        acc = self.dtype if self.fast_accum else jnp.float32
        pair = LayerNorm(affine=False, dtype=self.dtype)(pair)
        ab = mask_2d[..., None] * (
            jax.nn.sigmoid(
                PRLinear(2 * D, init="gating", dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ab_gate")(pair)
            )
            * PRLinear(2 * D, init="default", dtype=self.dtype,
                       param_dtype=self.param_dtype, name="ab_proj")(pair)
        )
        a, b = jnp.split(ab, 2, axis=-1)
        if self.dmajor:
            # Channel-major layout: transpose to [..., d, N, N] so the
            # O(N^3) contraction is a d-batched [N,N]x[N,N] dot with the
            # 128-lane axis as the CONTRACTED dim — the MXU sees D clean
            # NxN gemms instead of a d-minor (16/64-wide-lane) batched
            # dot. Costs two [N,N,D] transposes each way; pays when the
            # d-minor lowering is format-bound (measured on-chip,
            # BASELINE.md trimul layout sweep).
            at = jnp.moveaxis(a, -1, -3)
            bt = jnp.moveaxis(b, -1, -3)
            if self.mode == "outgoing":
                prod = jnp.einsum(
                    "...dik,...djk->...dij", at, bt,
                    preferred_element_type=acc,
                )
            else:
                prod = jnp.einsum(
                    "...dki,...dkj->...dij", at, bt,
                    preferred_element_type=acc,
                )
            prod = jnp.moveaxis(prod, -3, -1)
        elif self.mode == "outgoing":
            # out[i,j,d] = sum_k a[i,k,d] * b[j,k,d]
            prod = jnp.einsum(
                "...ikd,...jkd->...ijd", a, b,
                preferred_element_type=acc,
            )
        else:
            # out[i,j,d] = sum_k a[k,i,d] * b[k,j,d]
            prod = jnp.einsum(
                "...kid,...kjd->...ijd", a, b,
                preferred_element_type=acc,
            )
        prod = LayerNorm(affine=False, dtype=self.dtype, name="ab_norm")(prod)
        out = jax.nn.sigmoid(
            PRLinear(D, init="gating", dtype=self.dtype,
                     param_dtype=self.param_dtype, name="out_gate")(pair)
        ) * PRLinear(D, init="final", dtype=self.dtype,
                     param_dtype=self.param_dtype, name="out_proj")(prod)
        return out


class OuterLinear(nn.Module):
    """Pair update from single: Linear(cat[x_i*x_j, x_i-x_j])
    (reference `modules.py:277-287`).

    ``factored``: algebraic reassociation of the same Linear — with
    W = [W1; W2] split along the concat axis,

        out[i,j] = (x_i * x_j) @ W1 + (x_i - x_j) @ W2 + b
                 = einsum('isd,js->ijd', x[:, :, None] * W1, x)
                   + u_i - u_j + b,   u = x @ W2.

    The difference half collapses from O(N^2 S D) to O(N S D) FLOPs
    (half the op's total), and nothing [N, N, 2S]-shaped is ever
    materialized (~302 MB bf16 at N=384 vs the 19 MB output the
    default path's concat features cost in HBM traffic). Same
    parameters/tree as the default path (checkpoint-compatible);
    numerics differ only by float reassociation (f32 accumulation).

    ``use_pallas``: fused kernel (ops/pallas_outer.py) — also avoids
    the concat materialization but recomputes projections in-kernel;
    measured LOSS end-to-end (BASELINE.md fused aux-kernel sweep)."""

    pair_dim: int
    use_pallas: bool = False
    factored: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            from ..ops.pallas_outer import fused_outer_linear

            w, b = _DenseHandle(
                2 * x.shape[-1], self.pair_dim, "final",
                param_dtype=self.param_dtype, name="linear",
            )()
            return fused_outer_linear(
                x.astype(self.dtype), w, b,
                jax.default_backend() == "cpu",
            )
        if self.factored:
            S = x.shape[-1]
            x = LayerNorm(affine=False, dtype=self.dtype)(x)
            w, b = _DenseHandle(
                2 * S, self.pair_dim, "final",
                param_dtype=self.param_dtype, name="linear",
            )()
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
            u = x @ w[S:]  # [..., N, D]
            diff = u[..., :, None, :] - u[..., None, :, :]
            y = x[..., :, :, None] * w[:S]  # [..., N, S, D]
            prod = jnp.einsum(
                "...isd,...js->...ijd", y, x,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            return prod + diff + b.astype(self.dtype)
        x = LayerNorm(affine=False, dtype=self.dtype)(x)
        x_i = x[..., :, None, :]
        x_j = x[..., None, :, :]
        feats = jnp.concatenate(
            [x_i * x_j, x_i - x_j], axis=-1
        )
        return PRLinear(
            self.pair_dim, init="final", dtype=self.dtype,
            param_dtype=self.param_dtype, name="linear",
        )(feats)


class SPAttention(nn.Module):
    """AF2 single-representation attention with pair bias
    (reference `AF2_modules.py:369-473`).

    Inherits the reference's DISCREPANCY: c_hidden is the FULL channel
    width per head (single_dim), and no padding-mask bias is applied.
    """

    single_dim: int
    pair_dim: int
    num_heads: int
    use_pallas: bool = False
    fast_softmax: bool = False
    attn_chunk: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        single: jnp.ndarray,
        pair: jnp.ndarray,
        mask: jnp.ndarray,  # accepted but unused, matching the reference
    ) -> jnp.ndarray:
        H, C = self.num_heads, self.single_dim
        m = LayerNorm(affine=True, dtype=self.dtype, name="layer_norm_m")(single)

        # Pair bias: affine LN -> heads, to [*, H, i, j]
        z = LayerNorm(affine=True, dtype=self.dtype, name="z_norm")(pair)
        z = PRLinear(
            H, use_bias=False, init="normal", dtype=self.dtype,
            param_dtype=self.param_dtype, name="linear_z",
        )(z)
        bias = jnp.moveaxis(z, -1, -3)  # [..., H, i, j]

        def proj(name: str, init: str, use_bias: bool) -> jnp.ndarray:
            y = PRLinear(
                H * C, use_bias=use_bias, init=init, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name,
            )(m)
            return y.reshape(y.shape[:-1] + (H, C))

        q = proj("linear_q", "glorot", False) / math.sqrt(C)
        k = proj("linear_k", "glorot", False)
        v = proj("linear_v", "glorot", False)
        g = jax.nn.sigmoid(proj("linear_g", "gating", True))

        # quirk: no padding mask — padded positions are attended
        o = attention_core(
            q, k, v, mask=None, attn_bias=bias, scale=1.0,
            use_pallas=self.use_pallas, fast_softmax=self.fast_softmax,
            attn_chunk=self.attn_chunk,
        ).astype(self.dtype)
        o = g * o
        o = o.reshape(o.shape[:-2] + (H * C,))
        o = PRLinear(
            self.single_dim, init="final", dtype=self.dtype,
            param_dtype=self.param_dtype, name="linear_o",
        )(o)
        # Residual wraps the *normed* input (reference `AF2_modules.py:465-470`).
        return m + o


class OuterProductUpdate(nn.Module):
    """AF2 outer-product-mean pair update (reference
    `AF2_modules.py:476-545`); c_hidden = single_dim // 4
    (`modules.py:372-374`)."""

    pair_dim: int
    hidden_dim: int
    eps: float = 1e-3
    factored: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, single: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        ln = LayerNorm(affine=True, dtype=self.dtype, name="layer_norm")(single)
        m = mask[..., None].astype(self.dtype)
        a = PRLinear(self.hidden_dim, init="default", dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_1")(ln) * m
        b = PRLinear(self.hidden_dim, init="default", dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_2")(ln) * m
        if self.factored:
            # Same reassociation as OuterLinear.factored: fold linear_out's
            # kernel into a before the position-outer contraction, so the
            # [N, N, hidden] outer tensor is never materialized —
            # out[i,j,d] = sum_c a[i,c] W[c,d] b[j,c] + bias.
            w, bias = _DenseHandle(
                self.hidden_dim, self.pair_dim, "final",
                param_dtype=self.param_dtype, name="linear_out",
            )()
            y = a[..., :, :, None] * w.astype(self.dtype)  # [..., N, C, D]
            outer = jnp.einsum(
                "...icd,...jc->...ijd", y, b,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype) + bias.astype(self.dtype)
        else:
            # outer[i,j,c] = a[i,c] * b[j,c]; then a channel linear to pair.
            outer = jnp.einsum(
                "...ic,...jc->...ijc", a, b,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            outer = PRLinear(
                self.pair_dim, init="final", dtype=self.dtype,
                param_dtype=self.param_dtype, name="linear_out",
            )(outer)
        norm = (
            jnp.einsum("...ic,...jc->...ijc", m, m)
            + self.eps
        )  # [..., i, j, 1]
        return outer / norm


class FoldingBlock(nn.Module):
    """One denoiser block (reference `modules.py:290-343`)."""

    single_dim: int
    pair_dim: int
    head_dim: int
    num_heads: int
    transition_factor: int
    use_pallas: bool = False
    fast_softmax: bool = False
    use_pallas_trimul: bool = False
    trimul_dmajor: bool = False
    use_pallas_transition: bool = False
    use_pallas_outer: bool = False
    outer_factored: bool = False
    use_pallas_fused_gated: bool = False
    attn_chunk: int = 0
    kernel_bwd: bool = False
    pair_stream_bf16: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        single: jnp.ndarray,
        pair: jnp.ndarray,
        mask: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        mask_2d = mask[..., :, None] * mask[..., None, :]

        attn_bias = LayerNorm(affine=False, dtype=self.dtype)(pair)
        attn_bias = PRLinear(
            self.num_heads, init="normal", name="attn_bias_proj", **kw
        )(attn_bias)
        attn_bias = jnp.moveaxis(attn_bias, -1, -3)  # [..., H, i, j]

        single = single + GatedAttention(
            self.head_dim, self.num_heads, use_pallas=self.use_pallas,
            fast_softmax=self.fast_softmax, attn_chunk=self.attn_chunk,
            name="single_attn", **kw
        )(single, mask, attn_bias=attn_bias)
        single = single + TransitionMLP(
            self.single_dim * self.transition_factor, self.single_dim,
            use_pallas=self.use_pallas_transition, name="single_fc", **kw,
        )(single)
        pair = pair + OuterLinear(
            self.pair_dim, use_pallas=self.use_pallas_outer,
            factored=self.outer_factored,
            name="outer_linear", **kw,
        )(single)
        # The bf16 pair stream extends through the trimul's materialized
        # [N,N,D] triangle product (fast_accum): at N=512/D=64 that f32
        # buffer is 67 MB written+read per trimul — the binding HBM term
        # of the corrected roofline's 2.24x-over-bw-SOL row (BASELINE.md
        # round-4; VERDICT r4 #3). MXU accumulation stays f32 either
        # way; the bf16pair quality gate covers the rounding.
        trimul_fast = self.fast_softmax or self.pair_stream_bf16
        pair = pair + TriangleMultiplication(
            "outgoing", self.use_pallas_trimul, fast_accum=trimul_fast,
            dmajor=self.trimul_dmajor, name="pair_mul_outgoing", **kw
        )(pair, mask_2d)
        pair = pair + TriangleMultiplication(
            "incoming", self.use_pallas_trimul, fast_accum=trimul_fast,
            dmajor=self.trimul_dmajor, name="pair_mul_incoming", **kw
        )(pair, mask_2d)
        pair = pair + TriangleAttention(
            self.head_dim, self.num_heads, "starting",
            use_pallas=self.use_pallas,
            fused_gated=self.use_pallas_fused_gated,
            fast_softmax=self.fast_softmax,
            attn_chunk=self.attn_chunk,
            kernel_bwd=self.kernel_bwd,
            name="pair_attn_starting", **kw,
        )(pair, mask_2d)
        pair = pair + TriangleAttention(
            self.head_dim, self.num_heads, "ending",
            use_pallas=self.use_pallas,
            fused_gated=self.use_pallas_fused_gated,
            fast_softmax=self.fast_softmax,
            attn_chunk=self.attn_chunk,
            kernel_bwd=self.kernel_bwd,
            name="pair_attn_ending", **kw,
        )(pair, mask_2d)
        pair = pair + TransitionMLP(
            self.pair_dim * self.transition_factor, self.pair_dim,
            use_pallas=self.use_pallas_transition, name="pair_fc", **kw,
        )(pair)
        return single, pair


def _shard_complex_axis(x: jnp.ndarray) -> jnp.ndarray:
    """Sequence/context parallelism: constrain the first complex axis of a
    [B, N, ...] activation to the mesh 'model' axis. GSPMD propagates the
    sharding through the block and inserts the all-gathers the triangle
    ops need over the k axis (SURVEY §5 long-context; the reference's only
    mitigation was a warning at 384 nodes, `generate.py:127-128`)."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, "model") if x.ndim >= 2 else P()
    return jax.lax.with_sharding_constraint(x, spec)


# Kernel ceiling for TRAINING (inclusive): the flash backward is
# compile-proven and measured through N=2048 — at the K-chunk switch
# point (N >= 2048) the backward is the CN-layout K-chunked flash
# kernel with O(KC*N) VMEM, measured 302.3 ms/grad-step (~40 TF/s) at
# the op level where the query-chunked VJP FAILS to compile outright;
# at N=1024 it is 3.47x the chunked VJP (52.5 vs 182.4 ms/grad-step)
# (`r3_probes.py attnbwd`, BASELINE.md). NOTE the FULL train step at
# 2048 exceeds one v5e's HBM either way (the pair stack's activations
# alone) — the op-level gate matters for bigger-HBM chips and future
# multi-device layouts.
PALLAS_TRAIN_MAX_N = 2048
# Kernel ceiling for INFERENCE: the whole data ladder. Round 3 fixed the
# N=2048 failure — it was an HBM OOM from the NC-minor operand layouts'
# 8x lane padding, not a compile limitation — with the CN-layout grid
# K-chunked kernel (unpadded [R,H,C,N] operands): measured 1642.6
# ms/step at N=2048 vs 5540 ms on the chunk-128 fallback (3.37x,
# BASELINE.md long-context table).
PALLAS_INFER_MAX_N = 2048  # inclusive: kernel proven AT 2048
# From this size up, the unchunked XLA lowering stops being viable
# (~3.6 GB bf16 triangle logits at 768; fails to compile at 1024), so
# non-kernel modes (sequence-parallel, n > PALLAS_TRAIN_MAX_N)
# fall back to query-chunked attention. Below it they keep plain XLA.
LONGCTX_CHUNK_MIN_N = 768


def resolve_attention_plan(cfg: ModelConfig, n: int) -> Tuple[bool, int]:
    """(use_pallas, attn_chunk) for a padded complex axis of n.

    Explicit settings win: `cfg.use_pallas` forces the fused kernel,
    `cfg.attn_chunk` forces query-chunked attention. Otherwise, measured
    on v5e (BASELINE.md long-context table + paper-bucket sweep):

    - n < pallas_auto_min_n (default 384): plain XLA — it beats the
      kernel at small buckets (1.63 vs 3.01 ms at N=128; launch overhead
      dominates) through N=256.
    - NARROW-HEAD inference (head_dim < 32, the checkpoint layout) at
      384 <= n < 2048: the fused Pallas kernel — 1.15x at N=384, 1.39x
      at N=512, 2.05x at N=768, 1.83x at N=1024 (it never materializes
      the [rows,H,N,N] logits; the rows kernel runs with a 100 MB
      scoped-VMEM grant — the earlier 0.95x verdict was the default
      16 MB budget starving it).
    - WIDE-HEAD (head_dim >= 64, the recommended h64x1 layout): round 4
      reversed the round-3 exclusion (a dispatch-floor measurement
      artifact): the kernel joins for TRAINING at 384 <= n < 768
      (1.08x/1.23x whole-step at 384/512) and INFERENCE at
      512 <= n < 768 (1.13x at 512; a tie at 384 keeps XLA there).
      768+ and head_dim 32..63 are unmeasured and keep the XLA/chunked
      plans (r4_probes.py stepkern, BASELINE.md round-4). TRAINING at
      narrow-head 384 <= n < 768 also uses the kernel by default, via
      the flash-style Pallas backward (cfg.use_pallas_bwd; 1.21x at
      N=384, 1.48x at N=512 over the XLA train step — NOTE an exotic
      caller differentiating an inference-mode model gets the einsum-VJP
      backward instead, which re-materializes the logits).
      Sequence-parallel keeps XLA/chunked (GSPMD cannot repartition the
      kernel). Training runs the kernel through N=2048 INCLUSIVE: in
      the K-chunk regime the CN flash backward is the only path that
      compiles at the op level (302.3 ms/grad-step at 2048 where the
      chunked VJP fails; 3.47x at 1024 — `r3_probes.py attnbwd`).
    - long-context training / sequence-parallel: query-chunked attention
      (chunk 128) from N=768 up — per-chunk remat bounds the backward.
    - everything else: plain XLA while the unchunked triangle logits
      (~H * N^3 bytes-per-element at B=1) stay under ~4 GB — measured
      FASTER than chunked for wide heads even at N=1024 (h64x1: 263 vs
      293 ms) — and query-chunked beyond that (h16x4's 8.6 GB bf16
      logits fail to compile at 1024).
    """
    if cfg.use_pallas:
        return True, 0
    if cfg.attn_chunk > 0:
        return False, cfg.attn_chunk
    if cfg.pallas_auto_min_n <= 0:
        return False, 0
    inference = not cfg.training_mode and not cfg.sequence_parallel
    # Training joins the kernel regime through the flash-style Pallas
    # backward (cfg.use_pallas_bwd, DEFAULT ON — measured 1.21x at N=384
    # / 1.48x at N=512 over the XLA train step, BASELINE.md): without it
    # the custom-vjp backward re-materializes the [rows, H, N, N] logits
    # via the einsum reference and the forward win washes out (measured
    # 0.89x/0.98x). Round 3 compile-proved and measured the kernel train
    # step at the long-context rungs too — 1.90x at N=768 (681.9 vs
    # 1297.3 ms/step) and 2.00x at N=1024 (1464.4 vs 2935.2 ms/step)
    # over the chunked fallback, identical losses (BASELINE.md flash-
    # backward long-context rows) — and op-level at 2048 the CN
    # K-chunked flash backward is the only compiling path, so the gate
    # runs to PALLAS_TRAIN_MAX_N inclusive.
    trainable = (
        cfg.training_mode
        and cfg.use_pallas_bwd
        and not cfg.sequence_parallel
        and n <= PALLAS_TRAIN_MAX_N
    )
    ceiling = (PALLAS_INFER_MAX_N if inference else PALLAS_TRAIN_MAX_N) + 1
    if (
        (inference or trainable)
        and cfg.head_dim < 32
        and cfg.pallas_auto_min_n <= n < ceiling
    ):
        return True, 0
    # WIDE-HEAD (C >= 64, the recommended h64x1 training layout): the
    # round-3 "kernel loses at head_dim 64" exclusion was an artifact of
    # the uncorrected dispatch floor (BASELINE.md round-4 roofline).
    # Whole-program stepkern probe (r4_probes.py, v5e): TRAIN kernel
    # 1.08x at N=384 (60.2 vs 65.2 ms) and 1.23x at N=512 (115.2 vs
    # 142.2 ms); INFERENCE fwd 1.13x at N=512 (28.15 vs 31.91 ms) but a
    # tie at 384 (13.27 vs 13.12) — so inference joins at 512. Gated to
    # the MEASURED sizes only (< LONGCTX_CHUNK_MIN_N): the 768+ rungs
    # keep their measured XLA/chunked plans until the C=64 kernel is
    # benchmarked there.
    # Inference joins a rung earlier (384) under the bf16 pair stream:
    # with the stream's HBM relief the kernel wins there too (12.35 ->
    # 11.77 ms whole-fwd, r4 bf16pair probe) where it tied at f32.
    # Round-5 long-context rungs (r5_probes.py widelong, v5e): the
    # C=64 single-head kernel also WINS the 768/1024 rungs — whole-fwd
    # 1.33x at 768 (83.98 vs 111.87 ms) and 1.46x at 1024 (162.96 vs
    # 237.41), train-remat 1.60x at 768 (364.8 vs 582.1 ms/step) — so
    # the h64x1 gate ceiling extends from LONGCTX_CHUNK_MIN_N to 1024
    # inclusive (2048 stays on the measured chunked/CN plans:
    # unmeasured at C=64 whole-program, and the train step exceeds one
    # v5e's HBM there). MULTI-head wide (h64x4, r5_probes widemh):
    # kernel fwd 1.19x/1.49x and train 1.25x at N=384/512 — and at 512
    # the no-remat XLA train step fails to compile server-side where
    # the kernel runs (238.4 ms) — so multi-head engages at the
    # MEASURED 384..512 only; its 768+ rungs stay unmeasured (the
    # per-row VMEM working set is H x the single-head case).
    # Single-head f32 inference ties at 384 (13.27 vs 13.12) so it
    # joins at 512; multi-head inference wins 384 outright (1.19x).
    wide_infer_min = (
        384 if (cfg.pair_stream_bf16 or cfg.num_heads > 1) else 512
    )
    wide_max_n = 1024 if cfg.num_heads == 1 else 512
    if (
        (inference or trainable)
        and cfg.head_dim >= 64
        and n <= wide_max_n
        and n >= max(cfg.pallas_auto_min_n, wide_infer_min if inference else 384)
    ):
        return True, 0
    if n >= LONGCTX_CHUNK_MIN_N:
        chunk = 128 if n % 128 == 0 else 0
        if cfg.training_mode or cfg.sequence_parallel:
            return False, chunk
        bpe = 2 if jnp.dtype(cfg.dtype) == jnp.bfloat16 else 4
        logits_gb = cfg.num_heads * n**3 * bpe / 1e9  # B=1 heuristic
        if logits_gb > 4.0:
            return False, chunk
    return False, 0


class Denoiser(nn.Module):
    """OPM + SPAttention + num_blocks FoldingBlocks + symmetrization
    (reference `modules.py:346-404`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        single: jnp.ndarray,
        pair: jnp.ndarray,
        mask: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        param_dtype = jnp.dtype(cfg.param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        mask_2d = mask[..., :, None] * mask[..., None, :]
        use_pallas, attn_chunk = resolve_attention_plan(
            cfg, single.shape[-2]
        )
        # GSPMD cannot repartition a pallas_call, so every fused kernel is
        # disabled when the complex axis is sharded (sequence parallelism) —
        # same reason resolve_attention_plan excludes it for attention.
        fused_ok = not cfg.sequence_parallel

        pair = pair + mask_2d[..., None] * OuterProductUpdate(
            cfg.pair_dim, cfg.single_dim // 4,
            factored=cfg.outer_factored, name="opm", **kw
        )(single, mask)
        single = SPAttention(
            cfg.single_dim, cfg.pair_dim, cfg.num_heads,
            use_pallas=use_pallas, fast_softmax=cfg.fast_softmax,
            attn_chunk=attn_chunk,
            name="spa_attn", **kw,
        )(single, pair, mask)

        if cfg.pair_stream_bf16:
            # Residual-stream demotion (opt-in, config.py pair_stream_bf16):
            # the [B,N,N,D] pair tensor is read+written by all six pair ops
            # per block; bf16 halves that HBM traffic. Module internals
            # already compute at cfg.dtype — this narrows only the
            # accumulator the residual adds land in.
            pair = pair.astype(jnp.bfloat16)

        BlockStack = nn.remat(FoldingBlock) if cfg.remat else FoldingBlock
        for i in range(cfg.num_blocks):
            if cfg.sequence_parallel:
                pair = _shard_complex_axis(pair)
                single = _shard_complex_axis(single)
            single, pair = BlockStack(
                cfg.single_dim,
                cfg.pair_dim,
                cfg.head_dim,
                cfg.num_heads,
                cfg.transition_factor,
                use_pallas,
                cfg.fast_softmax,
                use_pallas_trimul=cfg.use_pallas_trimul and fused_ok,
                trimul_dmajor=cfg.trimul_dmajor,
                use_pallas_transition=cfg.use_pallas_transition and fused_ok,
                use_pallas_outer=cfg.use_pallas_outer and fused_ok,
                outer_factored=cfg.outer_factored,
                use_pallas_fused_gated=(
                    cfg.use_pallas_fused_gated and fused_ok
                ),
                attn_chunk=attn_chunk,
                kernel_bwd=cfg.use_pallas_bwd and fused_ok,
                pair_stream_bf16=cfg.pair_stream_bf16,
                name=f"folding_blocks_{i}",
                **kw,
            )(single, pair, mask)
        if cfg.sequence_parallel:
            pair = _shard_complex_axis(pair)

        pair = pair.astype(dtype)  # restore cfg.dtype post-stack
        pair = 0.5 * (pair + jnp.swapaxes(pair, -2, -3))
        return single, pair
