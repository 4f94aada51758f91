"""Sequence-masking subsystem (reference `ProteinReDiff/mask_utils.py`).

TPU-native redesign: the reference masks with host-side torch/numpy RNG and
dynamic ``topk``/``randperm`` sizes; here everything is jit-safe with static
shapes. Dynamic "choose k positions" becomes a rank-threshold: positions are
scored, ranked, and masked where ``rank < k`` — identical distribution, no
dynamic shapes.

Semantics preserved:
- Random masking draws the count from the *whole batch's* valid-residue
  total and selects across the flattened batch (`mask_utils.py:77-95`).
- Spatial masking removes the top-k residues nearest the ligand centroid,
  with k drawn from U(0, max_p) * median(residues per sample)
  (`mask_utils.py:25-62`).
- ESM-token masking writes token 32 (ESM-2 <mask>) at masked positions and
  1 (<pad>) at padding (`mask_utils.py:65-69,104-108`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

ESM_MASK_TOKEN = 32
ESM_PAD_TOKEN = 1
_INF = 1e10


def _rank(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Dense rank (0 = smallest) along an axis."""
    order = jnp.argsort(x, axis=axis)
    ranks = jnp.argsort(order, axis=axis)
    return ranks


def random_mask(
    key: jax.Array,
    residue_mask: jnp.ndarray,  # [B, N]
    mask_fraction: jnp.ndarray,  # scalar in [0, 1]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero a random ``mask_fraction`` of valid residues, selected uniformly
    over the flattened batch (reference `mask_utils.py:77-102`).

    Returns (residue_extra_mask, residue_inv_extra_mask): the surviving-mask
    and its complement restricted to the selected positions.
    """
    B, N = residue_mask.shape
    valid = residue_mask > 0.5
    num_valid = jnp.sum(valid)
    num_to_mask = jnp.floor(num_valid * mask_fraction).astype(jnp.int32)
    scores = jax.random.uniform(key, (B * N,))
    scores = jnp.where(valid.reshape(-1), scores, _INF)
    ranks = _rank(scores)
    selected = (ranks < num_to_mask).reshape(B, N) & valid
    extra_mask = residue_mask * (1.0 - selected.astype(residue_mask.dtype))
    inv_mask = selected.astype(residue_mask.dtype)
    return extra_mask, inv_mask


def spatial_mask(
    key: jax.Array,
    residue_ca_pos: jnp.ndarray,  # [B, N, 3]
    residue_mask: jnp.ndarray,    # [B, N]
    atom_pos: jnp.ndarray,        # [B, N, 3]
    atom_mask: jnp.ndarray,       # [B, N]
    max_p: jnp.ndarray,           # scalar
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask the k residues nearest the ligand centroid per sample
    (reference `mask_utils.py:25-62`); k ~ U(0, max_p) * median(n_res)."""
    n_res = jnp.sum(residue_mask, axis=-1)  # [B]
    n_median = jnp.median(n_res)
    k_key, p_key = jax.random.split(key)
    frac = jax.random.uniform(p_key, ()) * max_p
    top_k = jnp.floor(frac * n_median).astype(jnp.int32)

    centroid = jnp.sum(atom_mask[..., None] * atom_pos, axis=-2) / jnp.maximum(
        jnp.sum(atom_mask, axis=-1, keepdims=True), 1e-12
    )  # [B, 3]
    d = jnp.sqrt(
        jnp.sum(jnp.square(centroid[:, None, :] - residue_ca_pos), axis=-1)
        + 1e-12
    )
    d = d + (1.0 - residue_mask) * _INF
    ranks = _rank(d, axis=-1)
    selected = (ranks < top_k) & (residue_mask > 0.5)
    extra_mask = residue_mask * (1.0 - selected.astype(residue_mask.dtype))
    inv_mask = selected.astype(residue_mask.dtype)
    return extra_mask, inv_mask


def mask_esm_tokens(
    residue_esm_tokens: jnp.ndarray,  # [B, N] int
    residue_mask: jnp.ndarray,        # [B, N]
    extra_mask: jnp.ndarray,          # [B, N] — surviving residues
) -> jnp.ndarray:
    """Overwrite masked residues with the ESM <mask> token (32) and padding
    with <pad> (1), keeping surviving tokens (reference
    `mask_utils.py:65-69,104-108`)."""
    masked = (residue_mask > 0.5) & (extra_mask < 0.5)
    pad = residue_mask < 0.5
    tokens = jnp.where(masked, ESM_MASK_TOKEN, residue_esm_tokens)
    tokens = jnp.where(pad, ESM_PAD_TOKEN, tokens)
    return tokens
