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


class TestPerceptionFixGoldens:
    """RDKit-verified behaviors pinned after the round-2 parser review
    (each asserted the BUGGY value before the fix)."""

    def test_chiral_atom_keeps_hydrogen(self):
        # [C@@H] qualifier parsing must not eat the H-count
        m = mol_from_smiles("N[C@@H](C)C(=O)O")  # alanine
        assert m.total_num_hs(1) == 1
        assert m.atoms[1].hybridization == "SP3"
        assert m.atoms[1].chirality == "CHI_TETRAHEDRAL_CW"

    def test_kekule_pyrrole_nh(self):
        # Kekule pyrrole: the lone-pair-donor N keeps its H (RDKit: 1)
        m = mol_from_smiles("C1=CC=CN1")
        ni = next(i for i, a in enumerate(m.atoms) if a.atomic_num == 7)
        assert m.total_num_hs(ni) == 1
        # aromatic-input pyridine-type n stays 0; [nH] stays 1;
        # N-methylpyrrole donor has no H slot left
        m2 = mol_from_smiles("c1ccncc1")
        n2 = next(i for i, a in enumerate(m2.atoms) if a.atomic_num == 7)
        assert m2.total_num_hs(n2) == 0
        m3 = mol_from_smiles("CN1C=CC=C1")
        n3 = next(i for i, a in enumerate(m3.atoms) if a.atomic_num == 7)
        assert m3.total_num_hs(n3) == 0

    def test_mol2_partial_charges_not_rounded(self):
        from protein_redesign_tpu.chem.mol import mol_from_mol2

        mol2 = (
            "@<TRIPOS>MOLECULE\nacetate\n4 3 1\nSMALL\nGASTEIGER\n"
            "@<TRIPOS>ATOM\n"
            "1 C1 0.0 0.0 0.0 C.3 1 LIG -0.041\n"
            "2 C2 1.5 0.0 0.0 C.2 1 LIG 0.323\n"
            "3 O1 2.1 1.0 0.0 O.co2 1 LIG -0.571\n"
            "4 O2 2.1 -1.0 0.0 O.co2 1 LIG -0.571\n"
            "@<TRIPOS>BOND\n1 1 2 1\n2 2 3 2\n3 2 4 1\n"
        )
        m = mol_from_mol2(mol2, is_path=False)
        # Gasteiger -0.571 must NOT round to -1 on both oxygens; the
        # carboxylate carries ONE formal -1 (single-bonded O)
        assert [a.formal_charge for a in m.atoms] == [0, 0, 0, -1]
        # quaternary ammonium from the SYBYL type
        mb = mol_from_mol2(mol2.replace("C.3", "N.4"), is_path=False)
        assert mb.atoms[0].formal_charge == 1

    def test_dummy_ligand_sdf_roundtrip(self, tmp_path):
        import numpy as np

        from protein_redesign_tpu.chem.mol import (
            Atom,
            Molecule,
            mols_from_sdf_file,
            mols_to_sdf_file,
            update_mol_positions,
        )

        star = update_mol_positions(
            Molecule([Atom(0)], []), np.zeros((1, 3), np.float32)
        )
        p = tmp_path / "star.sdf"
        mols_to_sdf_file([star], p)
        assert mols_from_sdf_file(p)[0].atoms[0].atomic_num == 0

    def test_bracket_wildcard_and_rhodium(self):
        assert mol_from_smiles("[*]").atoms[0].atomic_num == 0
        assert mol_from_smiles("*").atoms[0].atomic_num == 0
        assert mol_from_smiles("[Rh]").atoms[0].atomic_num == 45
        nh4 = mol_from_smiles("[NH4+]")
        assert nh4.atoms[0].atomic_num == 7 and nh4.total_num_hs(0) == 4

    def test_remove_hs_no_double_count(self):
        from protein_redesign_tpu.chem.mol import Atom, Bond, Molecule

        m = Molecule(
            [Atom(6, num_explicit_hs=3), Atom(1)], [Bond(0, 1)]
        ).perceive().remove_hs()
        assert m.total_num_hs(0) == 4

    def test_double_bond_stereo_from_directional_bonds(self):
        def stereo(s):
            m = mol_from_smiles(s)
            return next(b.stereo for b in m.bonds if b.order == 2)

        assert stereo("F/C=C/F") == "STEREOE"   # trans
        assert stereo("F/C=C\\F") == "STEREOZ"  # cis
        assert stereo("C(/F)=C/F") == "STEREOZ"  # branch flips perspective
        assert stereo("FC=CF") == "STEREONONE"

    def test_mchg_supersedes_atom_block_charges(self):
        from protein_redesign_tpu.chem.mol import mol_from_sdf

        sdf = (
            "test\n  x\n\n"
            "  2  1  0  0  0  0  0  0  0  0999 V2000\n"
            "    0.0000    0.0000    0.0000 N   0  3  0  0  0  0"
            "  0  0  0  0  0  0\n"
            "    1.0000    0.0000    0.0000 O   0  0  0  0  0  0"
            "  0  0  0  0  0  0\n"
            "  1  2  1  0\n"
            "M  CHG  1   2  -1\nM  END\n"
        )
        m = mol_from_sdf(sdf, is_path=False)
        # CTfile spec: any M CHG line invalidates ALL atom-block charge
        # codes — the N's legacy +1 code resets to 0
        assert [a.formal_charge for a in m.atoms] == [0, -1]
