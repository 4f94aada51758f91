"""Smoke tests over the reference's shipped inference fixtures
(`scripts/test_pdb.smiles`, `scripts/test_sequences_from_pdb.fasta`) —
the real-world robustness bar for the dependency-free chem layer.
Skipped when /root/reference is not mounted."""

from pathlib import Path

import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference repo not mounted"
)


def test_all_reference_smiles_parse():
    from protein_redesign_tpu.chem.mol import mol_from_smiles

    n = 0
    with open(REF / "scripts/test_pdb.smiles") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            mol = mol_from_smiles(line)
            assert mol.num_atoms() > 0
            assert mol.num_bonds() >= mol.num_atoms() - len(
                _components(mol)
            )
            n += 1
    assert n >= 200


def _components(mol):
    seen = set()
    comps = []
    for start in range(mol.num_atoms()):
        if start in seen:
            continue
        stack = [start]
        comp = set()
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(mol.neighbors(u))
        seen |= comp
        comps.append(comp)
    return comps


def test_all_reference_fasta_sequences_load():
    from protein_redesign_tpu.chem.protein import (
        protein_from_sequence,
        read_fasta,
    )

    entries = read_fasta(REF / "scripts/test_sequences_from_pdb.fasta")
    assert len(entries) >= 200
    for name, seq in entries[:50]:
        prot = protein_from_sequence(seq)
        assert len(prot) == len(seq)


def test_split_files_load():
    from protein_redesign_tpu.data.dataset import load_split_ids

    train = load_split_ids(REF / "data", "train")
    val = load_split_ids(REF / "data", "val")
    test = load_split_ids(REF / "data", "test")
    assert len(train) == 25631
    assert len(val) == 1452
    assert len(test) == 1108
