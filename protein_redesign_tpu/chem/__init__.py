"""L0 chemistry/biology primitives (host-side, dependency-free).

The reference delegates this layer to RDKit and BioPython
(`/root/reference/ProteinReDiff/{mol,protein,features}.py`); here it is
implemented in pure Python/NumPy so the framework is standalone.
"""

from .mol import (
    Atom,
    Bond,
    Molecule,
    mol_from_file,
    mol_from_sdf,
    mol_from_mol2,
    mol_from_smiles,
    mol_to_sdf,
    standardize_mol,
    get_mol_positions,
    update_mol_positions,
)
from .protein import (
    PDB_CHAIN_IDS,
    RESIDUE_ATOMS,
    RESIDUE_ATOM_INDEX,
    RESIDUE_NAMES,
    RESIDUE_NAME_INDEX,
    RESIDUE_TYPES,
    RESIDUE_TYPE_INDEX,
    Protein,
    protein_from_pdb_file,
    protein_from_pdb_string,
    protein_from_sequence,
    protein_to_pdb_file,
    protein_to_pdb_string,
    protein_to_sequence,
    proteins_from_pdb_file,
    proteins_to_pdb_file,
)
from .features import (
    ALLOWABLE_ATOM_FEATURES,
    ALLOWABLE_BOND_FEATURES,
    NUM_ATOM_FEATURES,
    NUM_BOND_FEATURES,
    featurize_atom,
    featurize_bond,
    safe_index,
)
