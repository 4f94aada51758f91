"""Graph-batching helpers (reference `ProteinReDiff/models/utils.py`).

The reference carries these GVP-era utilities (flatten_graph /
unflatten_graph / rbf / norm) although nothing imports them
(SURVEY.md §2.1 marks them as residue of an abandoned GVP encoder).
Provided here in JAX for surface completeness; also generally useful for
padded-graph <-> flat-graph conversions.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False,
         eps: float = 1e-8) -> jnp.ndarray:
    """Safe L2 norm."""
    return jnp.sqrt(
        jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims) + eps
    )


def rbf(d: jnp.ndarray, d_min: float = 0.0, d_max: float = 20.0,
        d_count: int = 16) -> jnp.ndarray:
    """Gaussian radial basis expansion of distances."""
    mu = jnp.linspace(d_min, d_max, d_count, dtype=d.dtype)
    sigma = (d_max - d_min) / d_count
    return jnp.exp(-jnp.square((d[..., None] - mu) / sigma))


def flatten_graph(
    node_feats: jnp.ndarray,   # [B, N, ...]
    node_mask: jnp.ndarray,    # [B, N]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate a padded node batch into one flat graph.

    Returns (flat_feats [B*N, ...], flat_mask [B*N], batch_index [B*N]) —
    padded entries keep mask 0 so downstream ops stay static-shape.
    """
    B, N = node_mask.shape
    flat_feats = node_feats.reshape((B * N,) + node_feats.shape[2:])
    flat_mask = node_mask.reshape(B * N)
    batch_index = jnp.repeat(jnp.arange(B), N)
    return flat_feats, flat_mask, batch_index


def unflatten_graph(
    flat_feats: jnp.ndarray, batch_size: int
) -> jnp.ndarray:
    """Inverse of ``flatten_graph`` for statically padded graphs."""
    BN = flat_feats.shape[0]
    N = BN // batch_size
    return flat_feats.reshape((batch_size, N) + flat_feats.shape[1:])
