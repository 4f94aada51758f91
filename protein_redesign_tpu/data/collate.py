"""Static-shape bucketed collation.

The complex-axis layout is the reference's (`/root/reference/ProteinReDiff/
data.py:80-142`): one concatenated axis of length N per sample, atoms in
slots ``[0, num_atoms)`` and residues in ``[num_atoms,
num_atoms+num_residues)``; ``residue_type`` is shifted +1 before padding so
class 0 means pad/mask/atom.

TPU-first change: instead of padding to the per-batch max (which gives XLA a
new shape almost every step and forces recompilation), N is drawn from a
fixed bucket ladder, so the denoiser compiles once per bucket.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; raises if the complex exceeds the ladder.
    Robust to an unsorted ladder (first-fit would silently over-pad)."""
    fitting = [b for b in buckets if n <= b]
    if fitting:
        return min(fitting)
    raise ValueError(
        f"Complex with {n} nodes exceeds the largest bucket {max(buckets)}; "
        "extend DataConfig.buckets."
    )


def _batched_zeros(
    data_list: Sequence[Mapping[str, Any]], k: str, N: int, pad_axes: int
) -> np.ndarray:
    """One zero-filled output array for field ``k`` with the first
    ``pad_axes`` sample axes padded to N (single allocation; the generic
    np.pad + np.stack pair was the host-pipeline hot spot on 1 core)."""
    proto = np.asarray(data_list[0][k])
    shape = (len(data_list),) + (N,) * pad_axes + proto.shape[pad_axes:]
    return np.zeros(shape, proto.dtype)


def collate_fn(
    data_list: Sequence[Mapping[str, Any]],
    buckets: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """Collate featurized complexes into one padded batch.

    Key-prefix dispatch matches the reference collate (`data.py:80-142`):
    ``atom_*`` pads the atom axis to N; ``bond_*`` pads the two leading
    complex axes; ``residue_*`` offsets by num_atoms then pads to N
    (+1 shift for ``residue_type``); ``*_mol`` stays a Python list; anything
    else is stacked. Padding is zero-fill, written into one preallocated
    output array per field.
    """
    n_max = max(d["num_atoms"] + d["num_residues"] for d in data_list)
    N = pick_bucket(n_max, buckets) if buckets is not None else n_max
    batch: Dict[str, Any] = {}
    for k, v in data_list[0].items():
        if k.startswith("atom_"):
            out = _batched_zeros(data_list, k, N, 1)
            for i, d in enumerate(data_list):
                out[i, : d["num_atoms"]] = d[k]
            batch[k] = out
        elif k.startswith("bond_"):
            out = _batched_zeros(data_list, k, N, 2)
            for i, d in enumerate(data_list):
                na = d["num_atoms"]
                out[i, :na, :na] = d[k]
            batch[k] = out
        elif k.startswith("residue_"):
            out = _batched_zeros(data_list, k, N, 1)
            for i, d in enumerate(data_list):
                na, nr = d["num_atoms"], d["num_residues"]
                a = np.asarray(d[k])
                if k.endswith("_type"):
                    a = a + 1  # 0 becomes the pad/mask class
                out[i, na : na + nr] = a
            batch[k] = out
        elif k.endswith("_mol"):
            batch[k] = [d[k] for d in data_list]
        else:
            batch[k] = _default_collate([d[k] for d in data_list])
    return batch


def _default_collate(values: Sequence[Any]) -> Any:
    first = values[0]
    if isinstance(first, np.ndarray):
        return np.stack(values)
    if isinstance(first, (int, np.integer)):
        return np.asarray(values, dtype=np.int64)
    if isinstance(first, (float, np.floating)):
        return np.asarray(values, dtype=np.float32)
    return list(values)


def numeric_batch(batch: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Drop non-array fields (mols, ids) so the rest can cross to device."""
    return {
        k: v
        for k, v in batch.items()
        if isinstance(v, np.ndarray)
    }
