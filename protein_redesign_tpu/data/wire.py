"""Compact host->device wire format for featurized batches.

Collated batches are dominated by wide-dtype fields whose value ranges are
tiny: categorical feature indices (vocab <= 120), BFS bond distances
(clipped to ``max_bond_distance`` on-device anyway, reference
`model.py:292`), 0/1 masks stored as float32, and ESM embeddings that the
network immediately casts to bfloat16. Transferring them at full width
wastes host->device bandwidth — and on tunneled-TPU platforms (axon) the
client leaks every transfer's host staging buffer, so long trainings OOM
the HOST at ~one batch per step (measured: 16 MB/step at bucket 256,
B=8 -> 128 GB RSS by step 8700).

``compress_batch`` (host, numpy) narrows each field to the smallest safe
wire dtype; ``decompress_batch`` (device, inside jit) restores the
canonical dtypes as the first op of ``prepare_batch``, so every compute
path (train/eval/sample/serve) accepts either format. The int/mask fields
round-trip exactly; ``residue_esm`` crosses in bfloat16, which is
numerics-neutral for the default bf16 compute policy (the embedding head
casts to bf16 regardless, `models/prdiff.py` embed_residue_esm).

Wire sizes at bucket 256, B=8: 13.8 MB -> 4.8 MB at esm_dim 320 (2.9x);
21.3 MB -> 8.5 MB at esm_dim 1280 (2.5x).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp
import ml_dtypes

# field -> (wire dtype, canonical on-device dtype)
_INT = [
    ("atom_feats", np.int16),
    ("bond_feats", np.int8),
    ("bond_distance", np.int8),  # clipped; see compress_batch
    ("residue_type", np.int8),
    ("residue_chain_index", np.int16),
    ("residue_index", np.int16),
    ("residue_esm_tokens", np.int8),
    ("num_atoms", np.int32),
    ("num_residues", np.int32),
]
_MASK = ["atom_mask", "bond_mask", "residue_mask", "residue_atom_mask"]

_WIRE: Dict[str, Any] = {k: dt for k, dt in _INT}
_WIRE.update({k: np.uint8 for k in _MASK})
_WIRE["residue_esm"] = ml_dtypes.bfloat16

# Canonical dtype restored on device.
_CANONICAL: Dict[str, Any] = {k: jnp.int32 for k, _ in _INT}
_CANONICAL.update({k: jnp.float32 for k in _MASK})
_CANONICAL["residue_esm"] = jnp.float32


def compress_batch(
    batch: Mapping[str, Any], esm_bf16: bool = True
) -> Dict[str, Any]:
    """Narrow a collated numpy batch to the wire dtypes (host side).

    Raises on values that do not fit the wire dtype, except
    ``bond_distance`` which is clipped: the model clips it to
    ``max_bond_distance`` (= 7 by default) before the embedding lookup, so
    clipping at int8 range is semantics-preserving.

    ``esm_bf16=False`` keeps ``residue_esm`` at float32 — pass it when the
    model computes in float32 (strict-parity mode), where the bf16
    rounding would otherwise be the only lossy leg of the wire format.
    The int/mask legs round-trip exactly either way.
    """
    out: Dict[str, Any] = {}
    for k, v in batch.items():
        dt = _WIRE.get(k)
        if dt is None or not isinstance(v, np.ndarray):
            out[k] = v
            continue
        if k == "bond_distance":
            out[k] = np.clip(v, -128, 127).astype(np.int8)
        elif dt == ml_dtypes.bfloat16:
            out[k] = v.astype(dt) if esm_bf16 else v
        else:
            info = np.iinfo(dt)
            if v.size and (v.min() < info.min or v.max() > info.max):
                raise ValueError(
                    f"batch field {k!r} value range [{v.min()}, {v.max()}] "
                    f"does not fit wire dtype {np.dtype(dt).name}"
                )
            out[k] = v.astype(dt)
    return out


def decompress_batch(batch: Mapping[str, Any]) -> Dict[str, Any]:
    """Restore canonical dtypes (device side; safe under jit). A no-op for
    batches that were never compressed."""
    out = dict(batch)
    for k, target in _CANONICAL.items():
        if k in out:
            v = out[k]
            if hasattr(v, "dtype") and v.dtype != jnp.dtype(target):
                out[k] = jnp.asarray(v).astype(target)
    return out
