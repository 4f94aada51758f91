"""Chem-perception fuzzing beyond the 207 reference fixtures (VERDICT r3
item 8): property-based SMILES -> Molecule -> SDF -> Molecule round
trips over a combinatorial corpus, plus targeted classes the fixtures
under-represent (charged ligands, fused aromatics, organometallics,
macrocycles). The invariant asserted is the DOWNSTREAM contract: the
nine atom and three bond categorical features (`chem/features.py`,
mirroring reference `features.py:72-103`) must survive serialization
unchanged, and perception must be idempotent. Known divergences from
RDKit SanitizeMol semantics are documented in docs/PARITY.md."""

import numpy as np
import pytest

from protein_redesign_tpu.chem.features import (
    featurize_atom,
    featurize_bond,
)
from protein_redesign_tpu.chem.mol import (
    mol_from_sdf,
    mol_from_smiles,
    mol_to_sdf,
    update_mol_positions,
)

# --- combinatorial corpus: scaffolds x substituents ----------------------
SCAFFOLDS = [
    "c1ccccc1{}",          # benzene
    "c1ccncc1{}",          # pyridine
    "c1cc[nH]c1{}",        # pyrrole
    "c1ccc2ccccc2c1{}",    # naphthalene (fused aromatic)
    "c1ccc2[nH]ccc2c1{}",  # indole (fused heteroaromatic)
    "C1CCCCC1{}",          # cyclohexane
    "C1CCNCC1{}",          # piperidine
    "CC(C){}",             # isopropyl chain
    "C=CC{}",              # allyl
    "C#CC{}",              # propargyl
]
SUBSTITUENTS = [
    "",            # bare scaffold
    "C(=O)O",      # carboxylic acid
    "C(=O)[O-]",   # carboxylate (anionic)
    "C[NH3+]",     # ammonium (cationic)
    "N(C)C",       # tertiary amine
    "S(=O)(=O)N",  # sulfonamide
    "OC",          # ether
    "C(F)(F)F",    # trifluoromethyl
    "Br",          # halogen
    "C#N",         # nitrile
]

TARGETED = [
    # Charged ligands
    "C[N+](C)(C)C",                    # tetramethylammonium
    "[NH4+].[Cl-]",                    # salt (disconnected)
    "C(=O)([O-])C(=O)[O-]",            # oxalate dianion
    "c1ccc(cc1)[O-]",                  # phenolate
    "C[S+](C)C",                       # sulfonium
    # Fused / polycyclic aromatics
    "c1ccc2c(c1)ccc3c2cccc3",          # anthracene
    "c1cnc2[nH]cnc2n1",                # purine core
    "c1ccc2c(c1)oc3ccccc23",           # dibenzofuran
    "c1ccc2c(c1)ncc3ccccc23",          # acridine-like
    # Organometallics / odd valences (must PARSE and featurize; exact
    # RDKit-sanitization parity is not claimed — docs/PARITY.md)
    "[Fe+2]",
    "C=CC(=O)[O-].[Na+]",
    "[Pt](Cl)(Cl)(N)N",                # cisplatin-like
    "[Ru+2]",
    "O=[V](=O)[O-]",
    # Macrocycles
    "C1CCCCCCCCCCC1",                  # cyclododecane
    "C1CCCCCCCCCCCCCCC1",              # 16-ring
    "O=C1CCCCCCCCCCN1",                # macrolactam
    # Stereo / misc
    "C/C=C/C(=O)O",                    # E-configured acid
    "C[C@H](N)C(=O)O",                 # L-alanine
    "CC(C)(C)OC(=O)NC",                # Boc carbamate
]


def _corpus():
    out = []
    for scaf in SCAFFOLDS:
        for sub in SUBSTITUENTS:
            out.append(scaf.format(sub))
    out.extend(TARGETED)
    return out


def _features(mol):
    atoms = np.stack([
        featurize_atom(mol, i) for i in range(mol.num_atoms())
    ]) if mol.num_atoms() else np.zeros((0, 9), np.int64)
    bonds = np.stack([
        featurize_bond(mol, i) for i in range(len(mol.bonds))
    ]) if mol.bonds else np.zeros((0, 3), np.int64)
    return atoms, bonds


@pytest.mark.parametrize("smiles", _corpus())
def test_sdf_roundtrip_preserves_featurization(smiles):
    """SMILES -> mol -> SDF -> mol: element sequence, formal charges,
    bond multiset, and the full downstream feature vectors must be
    preserved exactly."""
    mol = mol_from_smiles(smiles)
    n = mol.num_atoms()
    assert n >= 1, smiles
    rng = np.random.RandomState(hash(smiles) % (2**31))
    mol = update_mol_positions(mol, rng.randn(n, 3).astype(np.float32))
    text = mol_to_sdf(mol)
    back = mol_from_sdf(text, is_path=False)

    assert back.num_atoms() == n, smiles
    assert [a.atomic_num for a in back.atoms] == [
        a.atomic_num for a in mol.atoms
    ], smiles
    assert [a.formal_charge for a in back.atoms] == [
        a.formal_charge for a in mol.atoms
    ], smiles
    assert len(back.bonds) == len(mol.bonds), smiles
    a0, b0 = _features(mol)
    a1, b1 = _features(back)
    # Chirality (atom col 1) and E/Z (bond col 1) are EXPECTED to differ:
    # the SMILES side declares none (or directional-bond stereo), while
    # the SDF reader perceives them from the (random) 3D coordinates —
    # exactly what RDKit's MolFromMolFile does on 3D files. Their
    # stability is covered by test_double_roundtrip_idempotent and the
    # constructed-geometry tests below.
    np.testing.assert_array_equal(
        np.delete(a0, 1, axis=1), np.delete(a1, 1, axis=1), err_msg=smiles
    )
    np.testing.assert_array_equal(
        np.delete(b0, 1, axis=1), np.delete(b1, 1, axis=1), err_msg=smiles
    )
    # Geometry carried through the V2000 coordinate block (4 decimals).
    np.testing.assert_allclose(
        np.asarray(back.positions), np.asarray(mol.positions),
        atol=5e-4, err_msg=smiles,
    )


@pytest.mark.parametrize("smiles", _corpus())
def test_double_roundtrip_idempotent(smiles):
    """A second SDF round trip must be byte-identical to the first —
    perception has reached a fixed point (no flip-flopping aromaticity
    or drifting hydrogen counts)."""
    mol = mol_from_smiles(smiles)
    mol = update_mol_positions(
        mol, np.zeros((mol.num_atoms(), 3), np.float32)
    )
    once = mol_to_sdf(mol_from_sdf(mol_to_sdf(mol), is_path=False))
    twice = mol_to_sdf(mol_from_sdf(once, is_path=False))
    assert once == twice, smiles


def test_random_tree_molecules_roundtrip():
    """Procedural fuzz: random acyclic molecules over common elements
    with valence-respecting bond orders; every generated case must
    parse, featurize, and survive the SDF round trip."""
    # (element, max remaining valence) pools
    POOL = [("C", 4), ("N", 3), ("O", 2), ("S", 2), ("P", 3), ("F", 1),
            ("Cl", 1), ("Br", 1)]
    Z = {"C": 6, "N": 7, "O": 8, "S": 16, "P": 15, "F": 9, "Cl": 17,
         "Br": 35}
    for seed in range(60):
        rng = np.random.RandomState(10_000 + seed)
        n = int(rng.randint(2, 14))
        elems, free = [], []
        for _ in range(n):
            e, v = POOL[rng.randint(len(POOL))]
            elems.append(e)
            free.append(v)
        # Random spanning tree with random feasible bond orders.
        frags = []
        bonds = []
        for i in range(1, n):
            j = int(rng.randint(i))
            order = 1
            if free[i] >= 2 and free[j] >= 2 and rng.random_sample() < 0.25:
                order = 2
            if free[i] >= 3 and free[j] >= 3 and rng.random_sample() < 0.1:
                order = 3
            if free[j] < 1 or free[i] < 1:
                j = min(range(i), key=lambda k: -free[k])
                if free[j] < 1:
                    continue
                order = 1
            bonds.append((j, i, order))
            free[i] -= order
            free[j] -= order
        # Emit SMILES via DFS from atom 0.
        children = {i: [] for i in range(n)}
        for j, i, order in bonds:
            children[j].append((i, order))
        sym = {1: "", 2: "=", 3: "#"}

        def emit(i):
            s = elems[i] if len(elems[i]) == 1 else f"[{elems[i]}]"
            if elems[i] in ("Cl", "Br"):
                s = elems[i]
            parts = [sym[o] + emit(c) for c, o in children[i]]
            if not parts:
                return s
            return s + "".join(f"({p})" for p in parts[:-1]) + parts[-1]

        # Saturated parents can leave an atom unbonded -> its own
        # component; emit every component, dot-separated.
        is_child = {i for _, i, _ in bonds}
        roots = [i for i in range(n) if i not in is_child]
        smiles = ".".join(emit(r) for r in roots)
        # SMILES atom order is the DFS preorder, not 0..n-1.
        preorder = []
        walk = list(reversed(roots))
        while walk:
            u = walk.pop()
            preorder.append(u)
            walk.extend(c for c, _ in reversed(children[u]))
        mol = mol_from_smiles(smiles)
        assert mol.num_atoms() == n, (seed, smiles)
        assert [a.atomic_num for a in mol.atoms] == [
            Z[elems[i]] for i in preorder
        ], (seed, smiles)
        mol = update_mol_positions(
            mol, np.random.RandomState(seed).randn(n, 3).astype(np.float32)
        )
        back = mol_from_sdf(mol_to_sdf(mol), is_path=False)
        a0, b0 = _features(mol)
        a1, b1 = _features(back)
        np.testing.assert_array_equal(
            np.delete(a0, 1, axis=1), np.delete(a1, 1, axis=1), err_msg=smiles
        )
        np.testing.assert_array_equal(
            np.delete(b0, 1, axis=1), np.delete(b1, 1, axis=1), err_msg=smiles
        )


# --- 3D stereo perception (RDKit MolFromMolFile-on-3D-file behavior) -----
def _butene_sdf(trans: bool) -> str:
    """2-butene with explicit planar geometry: C0-C1=C2-C3."""
    y3 = -1.0 if trans else 1.0
    return f"""butene
  TEST

  4  3  0  0  0  0  0  0  0  0999 V2000
   -1.5000    1.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
   -0.7000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    0.7000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.5000{y3:>10.4f}    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  2  3  2  0
  3  4  1  0
M  END
$$$$
"""


def test_double_bond_stereo_from_3d():
    trans = mol_from_sdf(_butene_sdf(trans=True), is_path=False)
    cis = mol_from_sdf(_butene_sdf(trans=False), is_path=False)
    assert trans.bonds[1].stereo == "STEREOE"
    assert cis.bonds[1].stereo == "STEREOZ"
    # Stereo survives an SDF round trip (geometry carries it).
    again = mol_from_sdf(mol_to_sdf(trans), is_path=False)
    assert again.bonds[1].stereo == "STEREOE"


def test_chirality_from_3d_and_mirror():
    """A tetrahedral center with four distinct substituents gets a
    chirality tag from 3D; mirroring the coordinates flips it."""
    sdf = """bromochlorofluoromethane
  TEST

  4  3  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.0000    1.0000    1.0000 F   0  0  0  0  0  0  0  0  0  0  0  0
    1.0000   -1.0000   -1.0000 Cl  0  0  0  0  0  0  0  0  0  0  0  0
   -1.0000    1.0000   -1.0000 Br  0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  1  3  1  0
  1  4  1  0
M  END
$$$$
"""
    mol = mol_from_sdf(sdf, is_path=False)
    tag = mol.atoms[0].chirality
    assert tag in ("CHI_TETRAHEDRAL_CW", "CHI_TETRAHEDRAL_CCW")
    mirrored = update_mol_positions(
        mol_from_smiles("C(F)(Cl)Br"),
        np.asarray(mol.positions) * np.array([1.0, 1.0, -1.0], np.float32),
    )
    back = mol_from_sdf(mol_to_sdf(mirrored), is_path=False)
    other = back.atoms[0].chirality
    assert other in ("CHI_TETRAHEDRAL_CW", "CHI_TETRAHEDRAL_CCW")
    assert other != tag
    # Round trip preserves the tag (derived from the same geometry).
    again = mol_from_sdf(mol_to_sdf(mol), is_path=False)
    assert again.atoms[0].chirality == tag


def test_no_chirality_for_symmetric_or_planar():
    # Propan-2-ol C2: two WL-equivalent methyls -> not a stereocenter.
    sdf = """propanol
  TEST

  4  3  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.0000    1.0000    1.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.0000   -1.0000   -1.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
   -1.0000    1.0000   -1.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  1  3  1  0
  1  4  1  0
M  END
$$$$
"""
    mol = mol_from_sdf(sdf, is_path=False)
    assert mol.atoms[0].chirality == "CHI_UNSPECIFIED"
    # Planar (all z=0) geometry never assigns chirality.
    flat = mol_from_smiles("C(F)(Cl)Br")
    n = flat.num_atoms()
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.arange(n)
    pos[:, 1] = np.arange(n) % 2
    flat = mol_from_sdf(mol_to_sdf(update_mol_positions(flat, pos)),
                        is_path=False)
    assert all(a.chirality == "CHI_UNSPECIFIED" for a in flat.atoms)


def test_kekulized_write_preserves_aromatic_nh():
    """Pyrrole-type NH survives SDF serialization via Kekulé bond
    orders + donor-valence recovery (the real-PDBbind input form)."""
    for smiles, n_idx, n_hs in [
        ("c1cc[nH]c1", 3, 1),           # pyrrole
        ("c1ccc2[nH]ccc2c1", 4, 1),     # indole
        ("c1cnc2[nH]cnc2n1", 4, 1),     # purine core
        ("Cn1cccc1", 1, 0),             # N-methylpyrrole (no H)
    ]:
        mol = mol_from_smiles(smiles)
        mol = update_mol_positions(
            mol, np.zeros((mol.num_atoms(), 3), np.float32)
        )
        text = mol_to_sdf(mol)
        assert "  4  0" not in text.splitlines()[4], smiles  # kekulized
        back = mol_from_sdf(text, is_path=False)
        assert back.atoms[n_idx].atomic_num == 7, smiles
        assert back.total_num_hs(n_idx) == n_hs, smiles
        assert all(a.is_aromatic == m.is_aromatic
                   for a, m in zip(back.atoms, mol.atoms)), smiles


def test_standardize_mol_keeps_pyrrole_nh_from_kekulized_sdf():
    """Regression: standardize_mol (perceive + remove_hs, reference
    `mol.py:26-34`) must keep the aromatic NH when the input SDF is
    kekulized — the form every real PDBbind ligand file arrives in."""
    from protein_redesign_tpu.chem.mol import standardize_mol

    mol = mol_from_smiles("c1cc[nH]c1")
    mol = update_mol_positions(mol, np.zeros((5, 3), np.float32))
    parsed = mol_from_sdf(mol_to_sdf(mol), is_path=False)
    std = standardize_mol(parsed)
    assert std.total_num_hs(3) == 1
    assert std.atoms[3].is_aromatic


def test_polycyclic_kekulized_benzo_rings_survive_roundtrip():
    """Regression: in fused polycyclic cages a plain cycle BASIS need
    not contain the benzo ring itself (only symmetric differences of
    larger cycles), which broke Hückel perception of kekulized writes.
    ring_systems() now returns the smallest ring through every ring
    bond. Cases distilled from reference ligands 10/34/46 of
    scripts/test_pdb.smiles (pyrimidinone-fused bicycle, indoline-fused
    cage, dibenzo polycycle)."""
    cases = [
        "O=C(c1ccc2c(c1)CS(=O)(=O)N2)N1CCc2[nH]c(-c3ccccc3)nc(=O)c2C1",
        "C[NH+]1CCC(C)([C]23NC(=O)c4ccccc4[CH]2c2ccccc2N3)CC1",
    ]
    for s in cases:
        mol = mol_from_smiles(s)
        n = mol.num_atoms()
        mol = update_mol_positions(
            mol, np.random.RandomState(1).randn(n, 3).astype(np.float32)
        )
        back = mol_from_sdf(mol_to_sdf(mol), is_path=False)
        assert [a.is_aromatic for a in back.atoms] == [
            a.is_aromatic for a in mol.atoms
        ], s
        assert [back.total_num_hs(i) for i in range(n)] == [
            mol.total_num_hs(i) for i in range(n)
        ], s


def test_mol2_kekulized_pyrrole_and_indole():
    """MOL2 files written KEKULIZED (bond types 1/2, no 'ar') must
    perceive aromaticity + the pyrrole NH via the Hückel path, same as
    kekulized SDFs — the reference falls back to MOL2 when the SDF is
    unreadable (`mol.py:40-49`)."""
    from protein_redesign_tpu.chem.mol import mol_from_mol2

    pyrrole = """@<TRIPOS>MOLECULE
pyrrole-kek
 5 5 1
SMALL
NO_CHARGES

@<TRIPOS>ATOM
      1 N1   0.000  1.124 0.0 N.pl3  1 LIG  0.0
      2 C2   1.073  0.325 0.0 C.2    1 LIG  0.0
      3 C3   0.662 -0.994 0.0 C.2    1 LIG  0.0
      4 C4  -0.662 -0.994 0.0 C.2    1 LIG  0.0
      5 C5  -1.073  0.325 0.0 C.2    1 LIG  0.0
@<TRIPOS>BOND
     1 1 2 1
     2 2 3 2
     3 3 4 1
     4 4 5 2
     5 5 1 1
"""
    mol = mol_from_mol2(pyrrole, is_path=False)
    assert all(a.is_aromatic for a in mol.atoms)
    assert mol.total_num_hs(0) == 1  # the NH survives

    indole = """@<TRIPOS>MOLECULE
indole-kek
 9 10 1
SMALL
NO_CHARGES

@<TRIPOS>ATOM
      1 N1   0.0  0.0 0.0 N.pl3  1 LIG  0.0
      2 C2   1.3  0.4 0.0 C.2    1 LIG  0.0
      3 C3   2.1 -0.7 0.0 C.2    1 LIG  0.0
      4 C3a  1.3 -1.8 0.0 C.2    1 LIG  0.0
      5 C4   1.5 -3.2 0.0 C.2    1 LIG  0.0
      6 C5   0.5 -4.1 0.0 C.2    1 LIG  0.0
      7 C6  -0.8 -3.7 0.0 C.2    1 LIG  0.0
      8 C7  -1.1 -2.4 0.0 C.2    1 LIG  0.0
      9 C7a -0.1 -1.4 0.0 C.2    1 LIG  0.0
@<TRIPOS>BOND
     1 1 2 1
     2 2 3 2
     3 3 4 1
     4 4 5 2
     5 5 6 1
     6 6 7 2
     7 7 8 1
     8 8 9 2
     9 9 1 1
    10 4 9 1
"""
    mol = mol_from_mol2(indole, is_path=False)
    assert all(a.is_aromatic for a in mol.atoms)
    assert mol.total_num_hs(0) == 1
