"""Unit and geometry helpers (JAX; reference `ProteinReDiff/utils.py`)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def angstrom_to_nanometre(pos: jnp.ndarray) -> jnp.ndarray:
    return 0.1 * pos


def nanometre_to_angstrom(x: jnp.ndarray) -> jnp.ndarray:
    return 10.0 * x


def remove_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Subtract the masked mean over the node axis (reference
    `utils.py:32-36`): masked rows keep their value, valid rows are
    centered on the masked centroid."""
    m = mask[..., None]
    x_sum = jnp.sum(m * x, axis=-2, keepdims=True)
    norm = jnp.sum(m, axis=-2, keepdims=True)
    return x - m * x_sum / jnp.maximum(norm, 1e-12)


def nearest_bin(
    x: jnp.ndarray, bins: int, min_val: float, max_val: float
) -> jnp.ndarray:
    """Index of the nearest bin center (reference `utils.py:39-45`)."""
    w = 0.5 * (max_val - min_val) / bins
    v = jnp.linspace(min_val + w, max_val - w, bins, dtype=x.dtype)
    return jnp.argmin(jnp.abs(x[..., None] - v), axis=-1)


def pseudo_beta(
    residue_atom_pos: jnp.ndarray, residue_atom_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Virtual C-beta from N/CA/C (reference `utils.py:48-64`)."""
    n_pos = residue_atom_pos[:, :, 0]
    n_mask = residue_atom_mask[:, :, 0]
    ca_pos = residue_atom_pos[:, :, 1]
    ca_mask = residue_atom_mask[:, :, 1]
    c_pos = residue_atom_pos[:, :, 2]
    c_mask = residue_atom_mask[:, :, 2]
    b = ca_pos - n_pos
    c = c_pos - ca_pos
    a = jnp.cross(b, c)
    pseudo_cb_pos = -0.58273431 * a + 0.56802827 * b - 0.54067466 * c + ca_pos
    pseudo_cb_mask = n_mask * ca_mask * c_mask
    return pseudo_cb_pos, pseudo_cb_mask
