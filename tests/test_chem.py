"""Tests for the dependency-free chemistry layer (L0)."""

import numpy as np
import pytest

from protein_redesign_tpu.chem import (
    RESIDUE_ATOMS,
    RESIDUE_TYPES,
    Protein,
    featurize_atom,
    featurize_bond,
    mol_from_sdf,
    mol_from_smiles,
    mol_to_sdf,
    protein_from_pdb_string,
    protein_from_sequence,
    protein_to_pdb_string,
    protein_to_sequence,
    standardize_mol,
    update_mol_positions,
)
from protein_redesign_tpu.chem.features import (
    ALLOWABLE_ATOM_FEATURES,
    ALLOWABLE_BOND_FEATURES,
)
from protein_redesign_tpu.chem.protein import proteins_to_pdb_file, proteins_from_pdb_file

ASPIRIN = "CC(=O)Oc1ccccc1C(=O)O"

PDB_SNIPPET = """\
ATOM      1  N   MET A   1      27.340  24.430   2.614  1.00  0.00           N
ATOM      2  CA  MET A   1      26.266  25.413   2.842  1.00  0.00           C
ATOM      3  C   MET A   1      26.913  26.639   3.531  1.00  0.00           C
ATOM      4  O   MET A   1      27.886  26.463   4.263  1.00  0.00           O
ATOM      5  N   GLY A   2      26.335  27.770   3.258  1.00  0.00           N
ATOM      6  CA  GLY A   2      26.850  29.021   3.898  1.00  0.00           C
HETATM    7  O   HOH A 100      20.000  20.000  20.000  1.00  0.00           O
ATOM      8  N   ALA B   1      10.000  10.000  10.000  1.00  0.00           N
ATOM      9  CA  ALA B   1      11.000  10.000  10.000  1.00  0.00           C
"""


class TestSmiles:
    def test_benzene(self):
        mol = mol_from_smiles("c1ccccc1")
        assert mol.num_atoms() == 6
        assert mol.num_bonds() == 6
        assert all(a.is_aromatic for a in mol.atoms)
        assert all(a.is_in_ring for a in mol.atoms)
        assert all(mol.total_num_hs(i) == 1 for i in range(6))

    def test_kekule_benzene_perceived_aromatic(self):
        mol = mol_from_smiles("C1=CC=CC=C1")
        assert all(a.is_aromatic for a in mol.atoms)

    def test_aspirin(self):
        mol = mol_from_smiles(ASPIRIN)
        assert mol.num_atoms() == 13
        n_aromatic = sum(a.is_aromatic for a in mol.atoms)
        assert n_aromatic == 6
        # carboxylic acid C is SP2
        feats = featurize_atom(mol, 1)  # C(=O) acetyl carbon
        assert feats[6] == ALLOWABLE_ATOM_FEATURES["hybridization"].index("SP2")

    def test_charges(self):
        mol = mol_from_smiles("[NH4+].[Cl-]")
        assert mol.atoms[0].formal_charge == 1
        assert mol.atoms[0].num_implicit_hs == 4
        assert mol.atoms[1].formal_charge == -1
        assert mol.num_bonds() == 0

    def test_ring_closure_percent(self):
        mol = mol_from_smiles("C%10CCCCC%10")
        assert mol.num_bonds() == 6
        assert all(a.is_in_ring for a in mol.atoms)

    def test_branches_and_triple(self):
        mol = mol_from_smiles("CC(C)(C)C#N")
        assert mol.num_atoms() == 6
        n = mol.atoms[-1]
        assert n.atomic_num == 7
        assert mol.atoms[-2].hybridization == "SP"

    def test_pyridine_pyrrole(self):
        pyridine = mol_from_smiles("c1ccncc1")
        assert all(a.is_aromatic for a in pyridine.atoms)
        assert pyridine.total_num_hs(3) == 0  # aromatic N: no H
        pyrrole = mol_from_smiles("c1cc[nH]c1")
        n_idx = next(
            i for i, a in enumerate(pyrrole.atoms) if a.atomic_num == 7
        )
        assert pyrrole.total_num_hs(n_idx) == 1

    def test_implicit_h_counts(self):
        mol = mol_from_smiles("CCO")
        assert mol.total_num_hs(0) == 3
        assert mol.total_num_hs(1) == 2
        assert mol.total_num_hs(2) == 1


class TestSdf:
    def test_roundtrip(self):
        mol = mol_from_smiles(ASPIRIN)
        pos = np.random.RandomState(0).randn(13, 3).astype(np.float32)
        mol = update_mol_positions(mol, pos)
        text = mol_to_sdf(mol, "aspirin")
        mol2 = mol_from_sdf(text, is_path=False)
        assert mol2.num_atoms() == 13
        assert mol2.num_bonds() == mol.num_bonds()
        np.testing.assert_allclose(mol2.positions, pos, atol=1e-3)
        assert sum(a.is_aromatic for a in mol2.atoms) == 6

    def test_charge_block(self):
        mol = mol_from_smiles("[O-]C(=O)C")
        mol = update_mol_positions(mol, np.zeros((4, 3)))
        text = mol_to_sdf(mol)
        mol2 = mol_from_sdf(text, is_path=False)
        assert mol2.atoms[0].formal_charge == -1

    def test_standardize_removes_hs(self):
        # Ethanol with explicit hydrogens in the graph.
        sdf = """ethanol
  TEST

  9  8  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.5000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    2.0000    1.4000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
   -0.5000    1.0000    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.5000   -0.5000    0.8000 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.5000   -0.5000   -0.8000 H   0  0  0  0  0  0  0  0  0  0  0  0
    1.9000   -0.5000    0.8000 H   0  0  0  0  0  0  0  0  0  0  0  0
    1.9000   -0.5000   -0.8000 H   0  0  0  0  0  0  0  0  0  0  0  0
    3.0000    1.4000    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  1  4  1  0
  1  5  1  0
  1  6  1  0
  2  3  1  0
  2  7  1  0
  2  8  1  0
  3  9  1  0
M  END
$$$$
"""
        mol = standardize_mol(mol_from_sdf(sdf, is_path=False))
        assert mol.num_atoms() == 3
        assert mol.total_num_hs(0) == 3
        assert mol.total_num_hs(2) == 1
        assert mol.positions.shape == (3, 3)


class TestDistanceMatrix:
    def test_chain(self):
        mol = mol_from_smiles("CCCC")
        d = mol.distance_matrix()
        assert d[0, 3] == 3
        assert d[0, 0] == 0

    def test_disconnected(self):
        mol = mol_from_smiles("C.C")
        d = mol.distance_matrix()
        assert d[0, 1] >= 1e7


class TestFeaturize:
    def test_atom_feature_shape_and_range(self):
        mol = mol_from_smiles(ASPIRIN)
        sizes = [len(v) for v in ALLOWABLE_ATOM_FEATURES.values()]
        for i in range(mol.num_atoms()):
            f = featurize_atom(mol, i)
            assert f.shape == (9,)
            assert all(0 <= f[k] < sizes[k] for k in range(9))

    def test_bond_features(self):
        mol = mol_from_smiles("C=C")
        f = featurize_bond(mol, 0)
        assert f[0] == ALLOWABLE_BOND_FEATURES["bond_type"].index("DOUBLE")
        mol = mol_from_smiles("c1ccccc1")
        f = featurize_bond(mol, 0)
        assert f[0] == ALLOWABLE_BOND_FEATURES["bond_type"].index("AROMATIC")
        assert f[2] == 1  # conjugated


class TestProtein:
    def test_parse_pdb(self):
        prot = protein_from_pdb_string(PDB_SNIPPET)
        assert len(prot) == 3  # MET, GLY (chain A), ALA (chain B); HOH skipped
        assert protein_to_sequence(prot) == "MGA"
        np.testing.assert_array_equal(prot.chain_index, [0, 0, 1])
        np.testing.assert_array_equal(prot.residue_index, [1, 2, 1])
        assert prot.atom_pos.shape == (3, 37, 3)
        # MET CA coordinates
        ca = prot.atom_pos[0, 1]
        np.testing.assert_allclose(ca, [26.266, 25.413, 2.842], atol=1e-3)

    def test_insertion_code_rejected(self):
        bad = PDB_SNIPPET.replace(
            "ATOM      5  N   GLY A   2 ",
            "ATOM      5  N   GLY A   2A",
        )
        with pytest.raises(ValueError):
            protein_from_pdb_string(bad)

    def test_roundtrip(self):
        prot = protein_from_pdb_string(PDB_SNIPPET)
        text = protein_to_pdb_string(prot)
        prot2 = protein_from_pdb_string(text)
        assert protein_to_sequence(prot2) == protein_to_sequence(prot)
        np.testing.assert_allclose(prot2.atom_pos, prot.atom_pos, atol=1e-3)
        np.testing.assert_array_equal(prot2.atom_mask, prot.atom_mask)

    def test_multimodel_roundtrip(self, tmp_path):
        prot = protein_from_pdb_string(PDB_SNIPPET)
        path = tmp_path / "multi.pdb"
        proteins_to_pdb_file([prot, prot], path)
        models = proteins_from_pdb_file(path)
        assert len(models) == 2
        assert protein_to_sequence(models[1]) == "MGA"

    def test_from_sequence(self):
        prot = protein_from_sequence("ACDX")
        assert prot.aatype[-1] == -1
        assert prot.atom_mask[:, 1].sum() == 4  # CA only
        assert prot.atom_mask.sum() == 4

    def test_line_width(self):
        prot = protein_from_sequence("AC")
        text = protein_to_pdb_string(
            Protein(
                prot.chain_index,
                prot.residue_index,
                np.array([0, 4]),
                prot.atom_pos,
                prot.atom_mask,
            )
        )
        for line in text.splitlines():
            assert len(line) == 80


class TestMol2:
    MOL2 = """@<TRIPOS>MOLECULE
benzene
 6 6 1
SMALL
NO_CHARGES

@<TRIPOS>ATOM
      1 C1          0.0000    1.3970    0.0000 C.ar    1  BENZ        0.0000
      2 C2          1.2098    0.6985    0.0000 C.ar    1  BENZ        0.0000
      3 C3          1.2098   -0.6985    0.0000 C.ar    1  BENZ        0.0000
      4 C4          0.0000   -1.3970    0.0000 C.ar    1  BENZ        0.0000
      5 C5         -1.2098   -0.6985    0.0000 C.ar    1  BENZ        0.0000
      6 C6         -1.2098    0.6985    0.0000 C.ar    1  BENZ        0.0000
@<TRIPOS>BOND
     1    1    2 ar
     2    2    3 ar
     3    3    4 ar
     4    4    5 ar
     5    5    6 ar
     6    6    1 ar
"""

    def test_parse_benzene(self):
        from protein_redesign_tpu.chem.mol import mol_from_mol2

        mol = mol_from_mol2(self.MOL2, is_path=False)
        assert mol.num_atoms() == 6
        assert mol.num_bonds() == 6
        assert all(a.is_aromatic for a in mol.atoms)
        assert all(a.is_in_ring for a in mol.atoms)
        np.testing.assert_allclose(mol.positions[0], [0.0, 1.397, 0.0],
                                   atol=1e-4)

    def test_amide_and_charges(self):
        from protein_redesign_tpu.chem.mol import mol_from_mol2

        text = """@<TRIPOS>MOLECULE
acetamide-ion
 4 3 1
SMALL
USER_CHARGES

@<TRIPOS>ATOM
      1 C1   0.0 0.0 0.0 C.3   1 LIG  0.0
      2 C2   1.5 0.0 0.0 C.2   1 LIG  0.0
      3 O1   2.1 1.1 0.0 O.2   1 LIG  0.0
      4 N1   2.1 -1.2 0.0 N.am  1 LIG  -1.0
@<TRIPOS>BOND
     1 1 2 1
     2 2 3 2
     3 2 4 am
"""
        mol = mol_from_mol2(text, is_path=False)
        assert mol.num_atoms() == 4
        assert mol.atoms[3].formal_charge == -1
        assert mol.bonds[1].order == 2
        assert mol.bonds[2].order == 1  # amide -> single
