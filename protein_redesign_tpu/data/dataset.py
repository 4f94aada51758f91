"""Datasets and the preprocessed-complex cache.

Mirrors the reference dataset family (`/root/reference/ProteinReDiff/
data.py:145-259`) without torch: the cache is ``.npz`` per PDB id (the
reference uses ``torch.save`` dicts, `preprocess_pdbbind.py:77-83`), and
loaders are plain Python iterables feeding the jitted steps via
``pipeline.py``.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Iterator, List, Mapping, Sequence, Union

import numpy as np

_ARRAY_KEYS_LIGAND = (
    "atom_feats", "atom_mask", "atom_pos", "bond_feats", "bond_mask",
    "bond_distance",
)
_ARRAY_KEYS_PROTEIN = (
    "residue_type", "residue_mask", "residue_chain_index", "residue_index",
    "residue_atom_pos", "residue_atom_mask", "residue_esm",
    "residue_esm_tokens",
)


def save_complex_cache(
    cache_dir: Union[str, Path], pdb_id: str, data: Mapping[str, Any]
) -> None:
    """Persist a featurized complex as <cache>/<id>/complex.npz (+ mol pickle)."""
    out = Path(cache_dir) / pdb_id
    out.mkdir(parents=True, exist_ok=True)
    arrays = {
        k: np.asarray(v)
        for k, v in data.items()
        if isinstance(v, (np.ndarray, int, float))
    }
    np.savez_compressed(out / "complex.npz", **arrays)
    mols = {k: v for k, v in data.items() if k.endswith("_mol")}
    if mols:
        with open(out / "mols.pkl", "wb") as f:
            pickle.dump(mols, f)


def load_complex_cache(
    cache_dir: Union[str, Path], pdb_id: str, with_mols: bool = False
) -> Dict[str, Any]:
    out = Path(cache_dir) / pdb_id
    with np.load(out / "complex.npz", allow_pickle=False) as z:
        data: Dict[str, Any] = {}
        for k in z.files:
            v = z[k]
            data[k] = int(v) if v.ndim == 0 and v.dtype.kind == "i" else v
    if with_mols and (out / "mols.pkl").exists():
        with open(out / "mols.pkl", "rb") as f:
            data.update(pickle.load(f))
    return data


def load_split_ids(data_dir: Union[str, Path], split: str) -> List[str]:
    """Read data/PRD_{split}_pdb_ids (reference `data.py:221-230`)."""
    path = Path(data_dir) / f"PRD_{split}_pdb_ids"
    with open(path, "r") as f:
        return [line.strip() for line in f if line.strip()]


class CombinedDataset:
    """Infinite shuffled stream over the cache (reference `data.py:187-204`;
    unused by the reference trainer but part of its surface)."""

    def __init__(self, root_dir: Union[str, Path], pdb_ids: Sequence[str],
                 seed: int = 0):
        self.root_dir = Path(root_dir)
        self.pdb_ids = list(pdb_ids)
        rng = np.random.RandomState(seed)
        rng.shuffle(self.pdb_ids)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        while True:
            for pdb_id in self.pdb_ids:
                data = load_complex_cache(self.root_dir, pdb_id)
                data["pdb_id"] = pdb_id
                yield data


class PDBDataset:
    """Map-style dataset over the complex cache (reference `data.py:170-185`)."""

    def __init__(self, root_dir: Union[str, Path], pdb_ids: Sequence[str]):
        self.root_dir = Path(root_dir)
        self.pdb_ids = list(pdb_ids)

    def __len__(self) -> int:
        return len(self.pdb_ids)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        pdb_id = self.pdb_ids[index]
        data = load_complex_cache(self.root_dir, pdb_id)
        data["pdb_id"] = pdb_id
        return data


class RepeatDataset:
    """Same item n times (reference `data.py:145-155`)."""

    def __init__(self, data: Mapping[str, Any], repeat: int):
        self.data = data
        self.repeat = repeat

    def __len__(self) -> int:
        return self.repeat

    def __getitem__(self, index: int) -> Mapping[str, Any]:
        return self.data


class InferenceDataset:
    """List indexer (reference `data.py:157-167`)."""

    def __init__(self, data: Sequence[Mapping[str, Any]]):
        self.data = list(data)

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int) -> Mapping[str, Any]:
        return self.data[index]


def iterate_batches(
    dataset: Any,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    epoch: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
) -> Iterator[List[Mapping[str, Any]]]:
    """Yield lists of samples; deterministic order from (seed, epoch).

    Multi-host training shards the epoch per process (num_shards =
    jax.process_count(), shard_index = jax.process_index()): every host
    computes the same global permutation, then reads only its strided
    slice — DistributedSampler semantics (what the reference's Lightning
    DDP provided implicitly, `train.py:38`), wrapped-padded so all shards
    yield the same number of samples and the hosts stay in lockstep.
    """
    order = np.arange(len(dataset))
    if shuffle:
        rng = np.random.RandomState((seed * 100003 + epoch) % (2**31 - 1))
        rng.shuffle(order)
    if num_shards > 1:
        pad = (-len(order)) % num_shards
        if pad:
            order = np.concatenate([order, order[:pad]])
        order = order[shard_index::num_shards]
    batch: List[Mapping[str, Any]] = []
    for idx in order:
        batch.append(dataset[int(idx)])
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch and not drop_last:
        yield batch
