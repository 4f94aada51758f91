"""Golden atom/bond feature vectors for canonical molecules.

Hand-verified against the reference's RDKit-based featurizer semantics
(`/root/reference/ProteinReDiff/features.py:31-103`): each atom vector is
[atomic_num, chirality, total_degree, formal_charge, total_num_hs,
num_radical_e, hybridization, is_aromatic, is_in_ring] as categorical
indices into ALLOWABLE_ATOM_FEATURES; each bond vector is
[bond_type, stereo, is_conjugated].

Feature semantics pinned here (any perception drift turns this red):
- hybridization follows RDKit's orbital-count rule (sigma + lone pairs):
  amide/amine N -> SP3, sulfoxide S -> SP3, carboxylate O- -> SP3,
  carbonyl O -> SP2, aromatic ring members (incl. pyrrole N, thiophene S)
  -> SP2, nitrile/allene C -> SP.
- conjugation follows RDKit MolOps::setConjugation: amide/ester/acid
  C-X and C=O conjugated, butadiene central bond conjugated, isolated
  C=C / C=O / C#N / S=O NOT conjugated, aromatic bonds conjugated.
- charges: [O-] -> index 4, [NH3+] -> index 6, neutral -> 5.

Known residual uncertainty (documented, not asserted wrong): RDKit may
apply a conjugation adjustment to ester/aryl-ether oxygens that shifts
them SP3 -> SP2 in some versions; we pin the plain orbital-count value.
"""

import numpy as np

from protein_redesign_tpu.chem.features import featurize_atom, featurize_bond
from protein_redesign_tpu.chem.mol import mol_from_smiles

# {name: (smiles, [atom feature vectors], [((a1, a2), bond vector)])}
GOLDENS = {
    "benzene": (
        "c1ccccc1",
        [[5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
        [((0, 1), [3, 0, 1]), ((1, 2), [3, 0, 1]), ((2, 3), [3, 0, 1]), ((3, 4), [3, 0, 1]), ((4, 5), [3, 0, 1]), ((0, 5), [3, 0, 1])],
    ),
    "ethanol": (
        "CCO",
        [[5, 0, 4, 5, 3, 0, 2, 0, 0], [5, 0, 4, 5, 2, 0, 2, 0, 0], [7, 0, 2, 5, 1, 0, 2, 0, 0]],
        [((0, 1), [0, 0, 0]), ((1, 2), [0, 0, 0])],
    ),
    "acetonitrile": (
        "CC#N",
        [[5, 0, 4, 5, 3, 0, 2, 0, 0], [5, 0, 2, 5, 0, 0, 0, 0, 0], [6, 0, 1, 5, 0, 0, 0, 0, 0]],
        [((0, 1), [0, 0, 0]), ((1, 2), [2, 0, 0])],
    ),
    "ethylammonium": (
        "CC[NH3+]",
        [[5, 0, 4, 5, 3, 0, 2, 0, 0], [5, 0, 4, 5, 2, 0, 2, 0, 0], [6, 0, 4, 6, 3, 0, 2, 0, 0]],
        [((0, 1), [0, 0, 0]), ((1, 2), [0, 0, 0])],
    ),
    "acetate": (
        "CC(=O)[O-]",
        [[5, 0, 4, 5, 3, 0, 2, 0, 0], [5, 0, 3, 5, 0, 0, 1, 0, 0], [7, 0, 1, 5, 0, 0, 1, 0, 0], [7, 0, 1, 4, 0, 0, 2, 0, 0]],
        [((0, 1), [0, 0, 0]), ((1, 2), [1, 0, 1]), ((1, 3), [0, 0, 1])],
    ),
    "pyridine": (
        "c1ccncc1",
        [[5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [6, 0, 2, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
        [((0, 1), [3, 0, 1]), ((1, 2), [3, 0, 1]), ((2, 3), [3, 0, 1]), ((3, 4), [3, 0, 1]), ((4, 5), [3, 0, 1]), ((0, 5), [3, 0, 1])],
    ),
    "pyrrole": (
        "c1cc[nH]c1",
        [[5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [6, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
        [((0, 1), [3, 0, 1]), ((1, 2), [3, 0, 1]), ((2, 3), [3, 0, 1]), ((3, 4), [3, 0, 1]), ((0, 4), [3, 0, 1])],
    ),
    "cyclohexane": (
        "C1CCCCC1",
        [[5, 0, 4, 5, 2, 0, 2, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1]],
        [((0, 1), [0, 0, 0]), ((1, 2), [0, 0, 0]), ((2, 3), [0, 0, 0]), ((3, 4), [0, 0, 0]), ((4, 5), [0, 0, 0]), ((0, 5), [0, 0, 0])],
    ),
    "acetamide": (
        "CC(N)=O",
        [[5, 0, 4, 5, 3, 0, 2, 0, 0], [5, 0, 3, 5, 0, 0, 1, 0, 0], [6, 0, 3, 5, 2, 0, 2, 0, 0], [7, 0, 1, 5, 0, 0, 1, 0, 0]],
        [((0, 1), [0, 0, 0]), ((1, 2), [0, 0, 1]), ((1, 3), [1, 0, 1])],
    ),
    "dimethyl_sulfoxide": (
        "CS(=O)C",
        [[5, 0, 4, 5, 3, 0, 2, 0, 0], [15, 0, 3, 5, 0, 0, 2, 0, 0], [7, 0, 1, 5, 0, 0, 1, 0, 0], [5, 0, 4, 5, 3, 0, 2, 0, 0]],
        [((0, 1), [0, 0, 0]), ((1, 2), [1, 0, 0]), ((1, 3), [0, 0, 0])],
    ),
    "butadiene": (
        "C=CC=C",
        [[5, 0, 3, 5, 2, 0, 1, 0, 0], [5, 0, 3, 5, 1, 0, 1, 0, 0], [5, 0, 3, 5, 1, 0, 1, 0, 0], [5, 0, 3, 5, 2, 0, 1, 0, 0]],
        [((0, 1), [1, 0, 1]), ((1, 2), [0, 0, 1]), ((2, 3), [1, 0, 1])],
    ),
    "aspirin": (
        "CC(=O)Oc1ccccc1C(=O)O",
        [[5, 0, 4, 5, 3, 0, 2, 0, 0], [5, 0, 3, 5, 0, 0, 1, 0, 0], [7, 0, 1, 5, 0, 0, 1, 0, 0], [7, 0, 2, 5, 0, 0, 2, 0, 0], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 0, 0, 1, 0, 0], [7, 0, 1, 5, 0, 0, 1, 0, 0], [7, 0, 2, 5, 1, 0, 2, 0, 0]],
        [((0, 1), [0, 0, 0]), ((1, 2), [1, 0, 1]), ((1, 3), [0, 0, 1]), ((3, 4), [0, 0, 1]), ((4, 5), [3, 0, 1]), ((5, 6), [3, 0, 1]), ((6, 7), [3, 0, 1]), ((7, 8), [3, 0, 1]), ((8, 9), [3, 0, 1]), ((4, 9), [3, 0, 1]), ((9, 10), [0, 0, 1]), ((10, 11), [1, 0, 1]), ((10, 12), [0, 0, 1])],
    ),
}


def test_atom_feature_goldens():
    for name, (smi, atom_golden, _) in GOLDENS.items():
        mol = mol_from_smiles(smi)
        got = [featurize_atom(mol, i).tolist() for i in range(mol.num_atoms())]
        assert got == atom_golden, f"{name}: atom features drifted:\n{got}"


def test_bond_feature_goldens():
    for name, (smi, _, bond_golden) in GOLDENS.items():
        mol = mol_from_smiles(smi)
        got = [
            ((b.a1, b.a2), featurize_bond(mol, j).tolist())
            for j, b in enumerate(mol.bonds)
        ]
        got = [(tuple(e), v) for e, v in got]
        assert got == [
            (tuple(e), v) for e, v in bond_golden
        ], f"{name}: bond features drifted:\n{got}"
