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


def test_predict_output_contract_matches_results_pt():
    """The reference ships a saved inference artifact (`results.pt`: 8
    tuples of positions [1,144,3] + sequence logits [1,144,21] for a
    144-node complex). Our sampler's per-input output contract must match
    it: (positions [n,3] Angstrom, logits [n,21]) per sample."""
    torch = pytest.importorskip("torch")
    ref = torch.load(
        REF / "results.pt", map_location="cpu", weights_only=False
    )
    assert isinstance(ref, list) and len(ref) == 8
    n_nodes = ref[0][0].shape[1]
    assert ref[0][0].shape == (1, n_nodes, 3)
    assert ref[0][1].shape == (1, n_nodes, 21)

    import jax
    import numpy as np

    from protein_redesign_tpu.chem.mol import (
        mol_from_smiles,
        update_mol_positions,
    )
    from protein_redesign_tpu.chem.protein import protein_from_sequence
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.config import ModelConfig
    from protein_redesign_tpu.data import (
        collate_fn,
        ligand_to_data,
        protein_to_data,
    )
    from protein_redesign_tpu.data.collate import numeric_batch
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
    import jax.numpy as jnp

    cfg = ModelConfig(
        esm_dim=16, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
        head_dim=4, num_heads=2, num_blocks=1, num_steps=2,
        dtype="float32", remat=False,
    )
    model = ProteinReDiffModel(cfg)
    # A 144-node complex like the artifact's: 4-atom ligand + 140 residues.
    mol = update_mol_positions(mol_from_smiles("CCCO"), np.zeros((4, 3)))
    prot = protein_from_sequence("ACDEFGHIKLMNPQRSTVWY" * 7)
    data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}
    assert data["num_atoms"] + data["num_residues"] == n_nodes
    init = {
        k: jnp.asarray(v)
        for k, v in numeric_batch(collate_fn([data], buckets=(192,))).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), init)
    runner = SamplingRunner(model, params, buckets=(192,), mask_prob=0.3)
    results = runner.run([data] * 2, jax.random.PRNGKey(0))
    assert len(results) == 2
    for pos, logits in results:
        assert pos.shape == (n_nodes, 3)       # Angstrom positions
        assert logits.shape == (n_nodes, 21)   # residue-masked logits
        assert pos.dtype == np.float32 and logits.dtype == np.float32
