"""Query-chunked attention for long-context buckets (N >= 768).

The einsum attention path (`ops/pallas_attention._attention_reference`)
materializes [rows, H, N, N] logits in HBM. For triangle attention the
row count is itself B*N, so the logits tensor grows as N^3: ~1 GB at
N=512 (bf16, H=4) but ~8.6 GB at N=1024 — past a single chip's HBM once
activations and params join it. This module evaluates the same attention
(same operand order, accumulation dtypes, and -2^15 padding fill — the
reference semantics at `modules.py:211-223`) in ``chunk``-row query
slices under a `lax.scan`, so peak logits memory drops by N/chunk while
each chunk's matmuls stay MXU-sized. Each chunk body is `jax.checkpoint`ed:
the backward pass re-forms one chunk's probabilities at a time instead of
keeping all of them live.

Unlike the flattened kernel dispatch path, inputs keep their natural
leading dims and the pair-bias is SLICED per chunk, never broadcast to the
row axis — the broadcast alone would materialize the N^3 tensor the
chunking exists to avoid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .pallas_attention import NEG_INF


def chunked_attention(
    q: jnp.ndarray,                   # [..., N, H, C]
    k: jnp.ndarray,                   # [..., N, H, C]
    v: jnp.ndarray,                   # [..., N, H, C]
    mask: Optional[jnp.ndarray],      # broadcastable to [..., N]
    bias: Optional[jnp.ndarray],      # broadcastable to [..., H, N, N]
    scale: float,
    chunk: int,
    fast_softmax: bool = False,
) -> jnp.ndarray:
    """Numerically identical to `_attention_reference` (same einsum
    contraction order and dtypes), evaluated ``chunk`` query rows at a
    time. Requires 0 < chunk <= N and N % chunk == 0 (collate buckets are
    multiples of 64, so any power-of-two chunk <= 64 always divides)."""
    N = q.shape[-3]
    if not (0 < chunk <= N and N % chunk == 0):
        raise ValueError(
            f"attn_chunk={chunk} must divide the padded length N={N}"
        )
    acc = q.dtype if fast_softmax else jnp.float32
    maskb = None
    if mask is not None:
        maskb = mask[..., None, None, :]  # [..., 1, 1, N] over [..., H, q, N]

    def body(qc: jnp.ndarray, bc: Optional[jnp.ndarray]) -> jnp.ndarray:
        logits = jnp.einsum(
            "...qhc,...khc->...hqk", qc * scale, k,
            preferred_element_type=acc,
        )
        if bc is not None:
            logits = logits + bc.astype(acc)
        if maskb is not None:
            logits = jnp.where(
                maskb < 0.5, jnp.asarray(NEG_INF, acc), logits
            )
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "...hqk,...khc->...qhc", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    body = jax.checkpoint(body)

    def step(_, i):
        qc = jax.lax.dynamic_slice_in_dim(q, i * chunk, chunk, axis=-3)
        bc = (
            None if bias is None
            else jax.lax.dynamic_slice_in_dim(bias, i * chunk, chunk, axis=-2)
        )
        return None, body(qc, bc)

    _, outs = jax.lax.scan(step, None, jnp.arange(N // chunk))
    # [N/chunk, ..., chunk, H, C] -> [..., N/chunk, chunk, H, C] -> [..., N, H, C]
    outs = jnp.moveaxis(outs, 0, -4)
    return outs.reshape(outs.shape[:-4] + (N,) + outs.shape[-2:])
