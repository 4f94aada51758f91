"""Atom/bond categorical featurizers.

Vocabularies and ``safe_index`` fallback semantics mirror the reference
(`/root/reference/ProteinReDiff/features.py:31-103`), operating on our
dependency-free ``Molecule`` instead of RDKit mols. Outputs are NumPy int64
arrays (host-side); they are embedded on-device by ``models/layers.py``.
"""

from __future__ import annotations

from typing import Any, List, Mapping

import numpy as np

from .mol import Molecule

# fmt: off
ALLOWABLE_ATOM_FEATURES: Mapping[str, List[Any]] = {
    "atomic_num": list(range(1, 119)) + ["misc"],
    "chirality": [
        "CHI_UNSPECIFIED",
        "CHI_TETRAHEDRAL_CW",
        "CHI_TETRAHEDRAL_CCW",
        "CHI_OTHER",
    ],
    "degree": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, "misc"],
    "formal_charge": [-5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5, "misc"],
    "num_hs": [0, 1, 2, 3, 4, 5, 6, 7, 8, "misc"],
    "num_radical_e": [0, 1, 2, 3, 4, "misc"],
    "hybridization": ["SP", "SP2", "SP3", "SP3D", "SP3D2", "misc"],
    "is_aromatic": [False, True],
    "is_in_ring": [False, True],
}

ALLOWABLE_BOND_FEATURES: Mapping[str, List[Any]] = {
    "bond_type": ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC", "misc"],
    "stereo": [
        "STEREONONE",
        "STEREOZ",
        "STEREOE",
        "STEREOCIS",
        "STEREOTRANS",
        "STEREOANY",
    ],
    "is_conjugated": [False, True],
}
# fmt: on

NUM_ATOM_FEATURES = len(ALLOWABLE_ATOM_FEATURES)
NUM_BOND_FEATURES = len(ALLOWABLE_BOND_FEATURES)

ATOM_FEATURE_SIZES = tuple(len(v) for v in ALLOWABLE_ATOM_FEATURES.values())
BOND_FEATURE_SIZES = tuple(len(v) for v in ALLOWABLE_BOND_FEATURES.values())


def safe_index(allowable_list: List[Any], value: Any) -> int:
    """Index with "misc" fallback (reference `features.py:64-69`)."""
    try:
        return allowable_list.index(value)
    except ValueError:
        assert allowable_list[-1] == "misc"
        return len(allowable_list) - 1


def featurize_atom(mol: Molecule, i: int) -> np.ndarray:
    """Nine categorical atom features (reference `features.py:72-92`)."""
    atom = mol.atoms[i]
    return np.array(
        [
            safe_index(ALLOWABLE_ATOM_FEATURES["atomic_num"], atom.atomic_num),
            ALLOWABLE_ATOM_FEATURES["chirality"].index(atom.chirality),
            safe_index(ALLOWABLE_ATOM_FEATURES["degree"], mol.total_degree(i)),
            safe_index(
                ALLOWABLE_ATOM_FEATURES["formal_charge"], atom.formal_charge
            ),
            safe_index(ALLOWABLE_ATOM_FEATURES["num_hs"], mol.total_num_hs(i)),
            safe_index(
                ALLOWABLE_ATOM_FEATURES["num_radical_e"],
                atom.num_radical_electrons,
            ),
            safe_index(
                ALLOWABLE_ATOM_FEATURES["hybridization"], atom.hybridization
            ),
            ALLOWABLE_ATOM_FEATURES["is_aromatic"].index(bool(atom.is_aromatic)),
            ALLOWABLE_ATOM_FEATURES["is_in_ring"].index(bool(atom.is_in_ring)),
        ],
        dtype=np.int64,
    )


def featurize_bond(mol: Molecule, bond_index: int) -> np.ndarray:
    """Three categorical bond features (reference `features.py:95-103`)."""
    bond = mol.bonds[bond_index]
    return np.array(
        [
            safe_index(ALLOWABLE_BOND_FEATURES["bond_type"], bond.type_name),
            ALLOWABLE_BOND_FEATURES["stereo"].index(bond.stereo),
            ALLOWABLE_BOND_FEATURES["is_conjugated"].index(
                bool(bond.is_conjugated)
            ),
        ],
        dtype=np.int64,
    )
