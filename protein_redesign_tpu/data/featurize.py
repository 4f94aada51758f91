"""Per-complex featurization to NumPy tensor dicts.

Mirrors the reference's ``ligand_to_data`` / ``protein_to_data``
(`/root/reference/ProteinReDiff/data.py:28-77`) but produces NumPy arrays
(host-side; device transfer happens after collation) and carries the
dependency-free ``Molecule`` instead of an RDKit mol.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..chem.features import (
    NUM_BOND_FEATURES,
    featurize_atom,
    featurize_bond,
)
from ..chem.mol import Molecule, get_mol_positions
from ..chem.protein import Protein


def ligand_to_data(ligand: Molecule, **kwargs: Any) -> Dict[str, Any]:
    """Ligand tensors (reference `data.py:28-56`): categorical atom features,
    dense bond features/mask, and the BFS topological distance matrix."""
    num_atoms = ligand.num_atoms()
    atom_feats = np.stack(
        [featurize_atom(ligand, i) for i in range(num_atoms)], axis=0
    )
    atom_mask = np.ones((num_atoms,), dtype=np.float32)
    atom_pos = get_mol_positions(ligand)
    bond_feats = np.zeros(
        (num_atoms, num_atoms, NUM_BOND_FEATURES), dtype=np.int64
    )
    bond_mask = np.zeros((num_atoms, num_atoms), dtype=np.float32)
    for bi, bond in enumerate(ligand.bonds):
        f = featurize_bond(ligand, bi)
        bond_feats[bond.a1, bond.a2] = f
        bond_feats[bond.a2, bond.a1] = f
        bond_mask[bond.a1, bond.a2] = 1.0
        bond_mask[bond.a2, bond.a1] = 1.0
    bond_distance = ligand.distance_matrix().astype(np.int64)
    return {
        "ligand_mol": ligand,
        "num_atoms": num_atoms,
        "atom_feats": atom_feats,
        "atom_mask": atom_mask,
        "atom_pos": atom_pos.astype(np.float32),
        "bond_feats": bond_feats,
        "bond_mask": bond_mask,
        "bond_distance": bond_distance,
        **kwargs,
    }


def protein_to_data(
    prot: Protein,
    residue_esm: Optional[np.ndarray] = None,
    residue_esm_tokens: Optional[np.ndarray] = None,
    esm_dim: int = 1280,
    **kwargs: Any,
) -> Dict[str, Any]:
    """Protein tensors (reference `data.py:59-77`).

    ``residue_esm`` defaults to zeros when no embedder output is supplied —
    the pluggable-ESM policy of this framework (SURVEY.md §7.1): embeddings
    are precomputed host-side and cached, never computed inside the graph.
    """
    from ..chem.protein import protein_to_ca_trace

    num_residues = len(prot.aatype)
    if residue_esm is None:
        residue_esm = np.zeros((num_residues, esm_dim), dtype=np.float32)
    if residue_esm_tokens is None:
        residue_esm_tokens = np.zeros((num_residues,), dtype=np.int64)
    return {
        "protein_mol": protein_to_ca_trace(prot),  # reference `data.py:68`
        "num_residues": num_residues,
        "residue_type": prot.aatype.astype(np.int64),
        "residue_mask": np.ones((num_residues,), dtype=np.float32),
        "residue_chain_index": prot.chain_index.astype(np.int64),
        "residue_index": prot.residue_index.astype(np.int64),
        "residue_atom_pos": prot.atom_pos.astype(np.float32),
        "residue_atom_mask": prot.atom_mask.astype(np.float32),
        "residue_esm": residue_esm.astype(np.float32),
        "residue_esm_tokens": residue_esm_tokens.astype(np.int64),
        **kwargs,
    }
