"""Flax building blocks for the denoiser.

Re-implements the reference layer vocabulary TPU-first:

- ``PRLinear`` — the AF2-style init vocabulary (reference
  `ProteinReDiff/modules.py:100-167`).
- ``AtomEmbedding``/``BondEmbedding`` — reference `modules.py:35-70`, but
  fused into a single offset table so the F per-feature lookups become one
  gather (one HBM-friendly op instead of F small ones).
- ``RadialBasisProjection``/``SinusoidalProjection`` — reference
  `modules.py:73-97`; the non-trainable centers/frequencies are closure
  constants, not parameters.
- ``GatedAttention`` — the gated MHA of reference `modules.py:170-225`
  (scale 1/sqrt(head_dim), additive bias, -2^15 padding fill).

All modules take ``dtype`` (compute, default bf16 via config) and keep
parameters in ``param_dtype`` (f32): the TPU-natural mixed-precision policy
replacing the reference's AMP fp16 (`train.py:37`). LayerNorm statistics and
attention softmax are always computed in f32.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..chem.features import ATOM_FEATURE_SIZES, BOND_FEATURE_SIZES

Dtype = Any

TRUNC_STD_CORRECTION = 0.87962566103423978
ATTN_MASK_INF = 2.0**15


def make_initializer(init: str) -> nn.initializers.Initializer:
    """The reference's init vocabulary (`modules.py:129-167`) in JAX terms.

    flax Dense kernels are [in, out] so torch's (fan_out, fan_in) maps to
    variance_scaling's fan conventions directly.
    """
    if init == "default":
        return nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
    if init == "relu":
        return nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
    if init == "glorot":
        return nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
    if init == "normal":
        return nn.initializers.variance_scaling(1.0, "fan_in", "normal")
    if init in ("gating", "final"):
        return nn.initializers.zeros_init()
    raise ValueError(f"Invalid init: {init}")


class PRLinear(nn.Module):
    """Dense with the reference init names; 'gating' gets bias=1."""

    features: int
    use_bias: bool = True
    init: str = "default"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bias_init = (
            nn.initializers.ones_init()
            if self.init == "gating"
            else nn.initializers.zeros_init()
        )
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=make_initializer(self.init),
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class DenseParamsOnly(nn.Module):
    """Declares the exact kernel/bias a PRLinear->nn.Dense would, without
    any compute — lets fused Pallas paths share one parameter tree (and
    checkpoints) with the XLA path."""

    din: int
    features: int
    init: str
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", make_initializer(self.init),
            (self.din, self.features), self.param_dtype,
        )
        if not self.use_bias:
            return kernel, None
        bias_init = (
            nn.initializers.ones_init()
            if self.init == "gating"
            else nn.initializers.zeros_init()
        )
        bias = self.param(
            "bias", bias_init, (self.features,), self.param_dtype
        )
        return kernel, bias


class DenseHandle(nn.Module):
    """Nests DenseParamsOnly under 'Dense_0' to mirror PRLinear's tree."""

    din: int
    features: int
    init: str
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return DenseParamsOnly(
            self.din, self.features, self.init, self.use_bias,
            self.param_dtype, name="Dense_0",
        )()


class LayerNorm(nn.Module):
    """LayerNorm computed in f32; affine switchable.

    ``affine=False`` mirrors torch ``elementwise_affine=False`` (most
    reference norms); ``affine=True`` mirrors the AF2 LayerNorm used by
    SPAttention/OPM (`AF2_modules.py:161-182`, `AF2_modules.py:498`).
    """

    affine: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(
            epsilon=1e-5,
            use_bias=self.affine,
            use_scale=self.affine,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        return y.astype(self.dtype)


class FusedCategoricalEmbedding(nn.Module):
    """Mean of per-feature embeddings, scale 1/sqrt(F)
    (reference `modules.py:35-70`), as ONE offset-table gather."""

    sizes: Sequence[int]
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        total = int(sum(self.sizes))
        # int32 (not feats.dtype): int64 inputs would request a truncated
        # x64 dtype and warn; the gather index promotes fine either way.
        offsets = jnp.asarray(
            np.concatenate([[0], np.cumsum(self.sizes)[:-1]]).astype(np.int32)
        )
        table = self.param(
            "table",
            nn.initializers.normal(stddev=1.0),  # torch nn.Embedding default
            (total, self.features),
            self.param_dtype,
        )
        scale = 1.0 / math.sqrt(len(self.sizes))
        gathered = jnp.take(
            table.astype(self.dtype), feats + offsets, axis=0
        )  # [..., F, D]
        return scale * jnp.sum(gathered, axis=-2)


class AtomEmbedding(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, atom_feats: jnp.ndarray) -> jnp.ndarray:
        return FusedCategoricalEmbedding(
            ATOM_FEATURE_SIZES, self.features, self.dtype, self.param_dtype
        )(atom_feats)


class BondEmbedding(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, bond_feats: jnp.ndarray) -> jnp.ndarray:
        return FusedCategoricalEmbedding(
            BOND_FEATURE_SIZES, self.features, self.dtype, self.param_dtype
        )(bond_feats)


class Embed(nn.Module):
    """Plain categorical embedding with torch-default N(0,1) init
    (embed_relpos / embed_bond_distance, reference `model.py:95-103`)."""

    num_embeddings: int
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, idx: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "table",
            nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.features),
            self.param_dtype,
        )
        return jnp.take(table.astype(self.dtype), idx, axis=0)


class RadialBasisProjection(nn.Module):
    """Gaussian RBF on [0, 2] nm (reference `modules.py:73-82`)."""

    features: int
    min_val: float = 0.0
    max_val: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = (self.features - 1) / (self.max_val - self.min_val)
        center = jnp.linspace(
            self.min_val, self.max_val, self.features, dtype=self.dtype
        )
        return jnp.exp(
            -scale * jnp.square(x[..., None].astype(self.dtype) - center)
        )


class SinusoidalProjection(nn.Module):
    """Log-spaced sin/cos features (reference `modules.py:85-97`)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.features % 2 != 0:
            raise ValueError(f"features must be even: {self.features}.")
        weight = jnp.asarray(
            np.logspace(-4.0, 0.0, self.features // 2), dtype=self.dtype
        )
        wx = weight * x[..., None].astype(self.dtype)
        return jnp.concatenate([jnp.sin(wx), jnp.cos(wx)], axis=-1)


def masked_softmax(
    logits: jnp.ndarray, mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Softmax in f32 with the reference's -2^15 key-padding fill
    (`modules.py:219-221`). ``mask`` broadcasts over the key axis."""
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask < 0.5, -ATTN_MASK_INF, logits)
    return jax.nn.softmax(logits, axis=-1)


def attention_core(
    query: jnp.ndarray,   # [..., N, H, C]
    key: jnp.ndarray,
    value: jnp.ndarray,
    mask: Optional[jnp.ndarray],       # broadcastable to [..., N]
    attn_bias: Optional[jnp.ndarray],  # [..., H, N, N]
    scale: float,
    use_pallas: bool,
    fast_softmax: bool = False,
    attn_chunk: int = 0,
    kernel_bwd: bool = False,
) -> jnp.ndarray:
    """Row-flatten leading dims and dispatch to the Pallas fused-attention
    kernel (ops/pallas_attention.py) or the einsum fallback. With
    ``attn_chunk`` > 0 (and no Pallas), evaluate in query chunks instead —
    same numerics, O(N/chunk) less peak logits HBM (long-context buckets,
    ops/chunked_attention.py); inputs are NOT flattened/broadcast there."""
    from ..ops.pallas_attention import gated_attention_core

    if attn_chunk > 0 and not use_pallas:
        from ..ops.chunked_attention import chunked_attention

        return chunked_attention(
            query, key, value, mask, attn_bias, scale,
            chunk=attn_chunk, fast_softmax=fast_softmax,
        )

    lead = query.shape[:-3]
    N, H, C = query.shape[-3:]
    R = 1
    for d in lead:
        R *= d
    qf = query.reshape((R, N, H, C))
    kf = key.reshape((R, N, H, C))
    vf = value.reshape((R, N, H, C))
    maskf = None
    if mask is not None:
        maskf = jnp.broadcast_to(mask, lead + (N,)).reshape((R, N))
    biasf = None
    if attn_bias is not None:
        biasf = jnp.broadcast_to(
            attn_bias, lead + (H, N, N)
        ).reshape((R, H, N, N))
    interpret = jax.default_backend() == "cpu"
    out = gated_attention_core(
        qf, kf, vf, maskf, biasf, scale, use_pallas, interpret,
        fast_softmax, kernel_bwd,
    )
    return out.reshape(lead + (N, H, C))


class GatedAttention(nn.Module):
    """Per-head gated MHA with optional additive bias
    (reference `modules.py:170-225`).

    Works over arbitrary leading batch dims: the input's second-to-last
    axis is the sequence axis (pair-row attention passes [B, N, N, D]).
    """

    head_dim: int
    num_heads: int
    use_pallas: bool = False
    fused_gated: bool = False  # use_pallas variant: ONE kernel for
    #                            LN+projections+softmax+gating+out-proj
    #                            (opt-in until measured end-to-end;
    #                            cfg.use_pallas_fused_gated)
    fast_softmax: bool = False
    attn_chunk: int = 0
    kernel_bwd: bool = False  # with use_pallas: flash-style Pallas
    #                           backward for the no-bias rows case
    #                           (training enablement; cfg.use_pallas_bwd)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        H, C = self.num_heads, self.head_dim
        D = x.shape[-1]
        if (
            self.use_pallas
            and self.fused_gated
            and attn_bias is None
            and mask is not None
        ):
            from ..ops.pallas_attention import (
                ROWS_KCHUNK_MIN_N,
                fused_gated_rows_attention,
            )

            N = x.shape[-2]
            if N < ROWS_KCHUNK_MIN_N:
                # Fully-fused path (triangle attention): LN + projections
                # + softmax + gating + out-projection in ONE kernel. Same
                # parameter tree as the XLA path below (DenseHandle).
                handles = {}
                for name, init, use_bias in (
                    ("q_proj", "glorot", False),
                    ("k_proj", "glorot", False),
                    ("v_proj", "glorot", False),
                    ("gate_proj", "gating", True),
                ):
                    handles[name] = DenseHandle(
                        D, H * C, init, use_bias=use_bias,
                        param_dtype=self.param_dtype, name=name,
                    )()
                wo, bo = DenseHandle(
                    H * C, D, "final", param_dtype=self.param_dtype,
                    name="out_proj",
                )()
                lead = x.shape[:-2]
                R = 1
                for d in lead:
                    R *= d
                xf = x.reshape((R, N, D)).astype(self.dtype)
                maskf = jnp.broadcast_to(mask, lead + (N,)).reshape((R, N))
                out = fused_gated_rows_attention(
                    xf, maskf,
                    handles["q_proj"][0], handles["k_proj"][0],
                    handles["v_proj"][0], handles["gate_proj"][0],
                    handles["gate_proj"][1], wo, bo, H,
                    jax.default_backend() == "cpu",
                )
                return out.reshape(x.shape)
        x = LayerNorm(affine=False, dtype=self.dtype)(x)

        def proj(name: str, init: str, use_bias: bool) -> jnp.ndarray:
            y = PRLinear(
                H * C, use_bias=use_bias, init=init,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )(x)
            return y.reshape(y.shape[:-1] + (H, C))

        query = proj("q_proj", "glorot", False)  # [..., i, H, C]
        key = proj("k_proj", "glorot", False)
        value = proj("v_proj", "glorot", False)
        gate = jax.nn.sigmoid(proj("gate_proj", "gating", True))

        out = attention_core(
            query, key, value, mask, attn_bias,
            scale=1.0 / math.sqrt(C), use_pallas=self.use_pallas,
            fast_softmax=self.fast_softmax, attn_chunk=self.attn_chunk,
            kernel_bwd=self.kernel_bwd,
        ).astype(self.dtype)
        out = gate * out
        out = out.reshape(out.shape[:-2] + (H * C,))
        return PRLinear(
            D, init="final", dtype=self.dtype,
            param_dtype=self.param_dtype, name="out_proj",
        )(out)


class TransitionMLP(nn.Module):
    """LN -> expand -> ReLU -> contract, 'final'-init output
    (single_fc / pair_fc / seq_mlp / weight_radial pattern).

    ``use_pallas``: the whole transition runs as one fused kernel
    (ops/pallas_transition.py) — no HBM round-trip of the LN copy or
    the ``transition_factor``-x expanded hidden activations."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    out_bias: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            from ..ops.pallas_transition import fused_transition

            w1, b1 = DenseHandle(
                x.shape[-1], self.hidden, "relu",
                param_dtype=self.param_dtype, name="PRLinear_0",
            )()
            w2, b2 = DenseHandle(
                self.hidden, self.out, "final", use_bias=self.out_bias,
                param_dtype=self.param_dtype, name="PRLinear_1",
            )()
            return fused_transition(
                x.astype(self.dtype), w1, b1, w2, b2,
                jax.default_backend() == "cpu",
            )
        x = LayerNorm(affine=False, dtype=self.dtype)(x)
        x = PRLinear(
            self.hidden, init="relu", dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = jax.nn.relu(x)
        return PRLinear(
            self.out, use_bias=self.out_bias, init="final",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
