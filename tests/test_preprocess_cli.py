"""End-to-end preprocess CLI test (reference `preprocess_pdbbind.py:25-91`):
PDBbind-layout inputs on disk -> complex cache consumable by PDBDataset."""

import numpy as np
import pytest


@pytest.fixture()
def pdbbind_layout(tmp_path):
    from protein_redesign_tpu.chem.mol import (
        mol_from_smiles,
        mol_to_sdf,
        update_mol_positions,
    )
    from protein_redesign_tpu.chem.protein import (
        protein_from_sequence,
        protein_to_pdb_file,
    )

    data_dir = tmp_path / "data"
    pdbbind = data_dir / "PDBbind_processed"
    rng = np.random.RandomState(0)
    ids = ["1abc", "2xyz"]
    for i, pdb_id in enumerate(ids):
        src = pdbbind / pdb_id
        src.mkdir(parents=True)
        mol = mol_from_smiles("CC(=O)Oc1ccccc1C(=O)O")
        mol = update_mol_positions(
            mol, rng.randn(mol.num_atoms(), 3).astype(np.float32)
        )
        with open(src / f"{pdb_id}_ligand.sdf", "w") as f:
            f.write(mol_to_sdf(mol))
        seq = "ARNDCQEGHILKMFPSTWYV"[: 8 + 4 * i]
        prot = protein_from_sequence(seq)
        prot.atom_pos[:, 1] = rng.randn(len(seq), 3)
        protein_to_pdb_file(prot, src / f"{pdb_id}_protein_processed.pdb")
    data_dir.mkdir(exist_ok=True)
    (data_dir / "PRD_train_pdb_ids").write_text("1abc\n")
    (data_dir / "PRD_val_pdb_ids").write_text("2xyz\n")
    (data_dir / "PRD_test_pdb_ids").write_text("")
    return data_dir, ids


def test_preprocess_cli_builds_cache(pdbbind_layout, capsys):
    from protein_redesign_tpu.cli.preprocess_pdbbind import main
    from protein_redesign_tpu.data.dataset import PDBDataset

    data_dir, ids = pdbbind_layout
    # Nonexistent ESM model id -> offline zero-embedding fallback.
    main([
        "--data_dir", str(data_dir),
        "--pdbbind_dir", str(data_dir / "PDBbind_processed"),
        "--esm_model", "/nonexistent/esm",
    ])
    out = capsys.readouterr().out
    assert "preprocessed 2 complexes (0 failed)" in out

    ds = PDBDataset(data_dir / "PDB_processed_cache", ids)
    for i in range(2):
        d = ds[i]
        assert d["num_atoms"] == 13  # aspirin heavy atoms
        assert d["num_residues"] == 8 + 4 * i
        assert d["residue_esm"].shape == (d["num_residues"], 1280)
        assert d["atom_feats"].shape[1] == 9

    # Second run skips existing entries without error.
    main([
        "--data_dir", str(data_dir),
        "--pdbbind_dir", str(data_dir / "PDBbind_processed"),
        "--esm_model", "/nonexistent/esm",
    ])
    assert "preprocessed 0 complexes (0 failed)" in capsys.readouterr().out
