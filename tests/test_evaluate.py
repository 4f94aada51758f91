"""Tests for the standalone evaluation CLI (cli/evaluate.py)."""

import dataclasses
import json

import numpy as np
import pytest

from protein_redesign_tpu.chem.protein import (
    protein_to_pdb_file,
    protein_to_sequence,
    proteins_to_pdb_file,
    write_fasta,
)
from protein_redesign_tpu.cli.evaluate import main

from test_tmalign import helix_protein

SEQ40 = "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRSTVWY"


def seq_helix(seq=SEQ40, seed=0, noise=0.0):
    """Helix with a fixed residue sequence (decodable from the PDB)."""
    from protein_redesign_tpu.chem.protein import RESIDUE_TYPE_INDEX

    p = helix_protein(n=len(seq), seed=seed, noise=noise)
    aatype = np.array([RESIDUE_TYPE_INDEX[c] for c in seq], np.int64)
    return dataclasses.replace(p, aatype=aatype)


def mutate(seq, positions, to="G"):
    out = list(seq)
    for i in positions:
        out[i] = to
    return "".join(out)


def test_single_complex_layout(tmp_path):
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    samples = [seq_helix(noise=0.3, seed=s) for s in (1, 2, 3)]
    proteins_to_pdb_file(samples, out_dir / "sample_protein.pdb")
    ref = seq_helix()
    protein_to_pdb_file(ref, tmp_path / "ref.pdb")

    report_path = tmp_path / "report.json"
    main([
        "-i", str(out_dir), "-r", str(tmp_path / "ref.pdb"),
        "-o", str(report_path),
    ])
    report = json.loads(report_path.read_text())
    row = report["groups"]["sample"]
    assert row["num_models"] == 3
    assert row["reference"] == "provided"
    assert len(row["tm"]) == 3 and min(row["tm"]) > 0.5
    assert row["ca_rmsd_mean"] < 1.0
    assert 0.5 < row["lddt_mean"] <= 1.0
    # reference sequence decoded from the reference PDB itself
    assert row["recovery"] == 1.0
    assert report["aggregate"]["num_groups"] == 1
    assert report["aggregate"]["tm_mean"] == row["tm_mean"]


def test_first_sample_fallback(tmp_path):
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    samples = [seq_helix(noise=0.3, seed=s) for s in (1, 2, 3)]
    proteins_to_pdb_file(samples, out_dir / "sample_protein.pdb")

    main(["-i", str(out_dir)])
    report = json.loads((out_dir / "evaluation.json").read_text())
    row = report["groups"]["sample"]
    assert row["reference"] == "first_sample"
    assert len(row["tm"]) == 2  # first sample is the reference
    assert "recovery" not in row  # no true sequence available
    assert row["diversity"] == 0.0  # identical sequences


def test_batch_layout_with_masked_recovery(tmp_path):
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    true_seq = SEQ40
    masked_positions = [0, 4, 9]  # 'A','F','L' — none is G
    # design 0 recovers every masked position, design 1 none (G wrong at
    # positions whose true residue isn't G)
    design0 = seq_helix(true_seq, seed=1, noise=0.2)
    design1 = seq_helix(
        mutate(true_seq, masked_positions), seed=2, noise=0.2
    )
    protein_to_pdb_file(design0, out_dir / "sample_protein_A_model_0.pdb")
    protein_to_pdb_file(design1, out_dir / "sample_protein_A_model_1.pdb")
    write_fasta(
        [("A_sample_0", mutate(true_seq, masked_positions, to="X"))],
        out_dir / "masked_sequences.fasta",
    )
    write_fasta([("A", true_seq)], tmp_path / "refs.fasta")
    ref_dir = tmp_path / "refs"
    ref_dir.mkdir()
    protein_to_pdb_file(seq_helix(true_seq), ref_dir / "A.pdb")

    csv_path = tmp_path / "report.csv"
    main([
        "-i", str(out_dir), "--ref_dir", str(ref_dir),
        "--ref_fasta", str(tmp_path / "refs.fasta"),
        "--csv", str(csv_path),
    ])
    report = json.loads((out_dir / "evaluation.json").read_text())
    row = report["groups"]["A"]
    assert row["num_models"] == 2 and row["reference"] == "provided"
    # overall recovery: design0 = 1.0, design1 = 37/40
    assert row["recovery"] == pytest.approx((1.0 + 37 / 40) / 2, abs=1e-4)
    # masked-only recovery: design0 = 1.0, design1 = 0.0
    assert row["recovery_masked"] == pytest.approx(0.5, abs=1e-4)
    assert row["diversity"] > 0.0
    header, line = csv_path.read_text().strip().splitlines()
    assert header.startswith("name,num_models")
    assert line.startswith("A,2,provided")


def test_sequence_only_layout(tmp_path):
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    true_seq = SEQ40
    write_fasta(
        [
            ("B_sample_0", true_seq),
            ("B_sample_1", mutate(true_seq, [1, 2])),
        ],
        out_dir / "sample_sequences.fasta",
    )
    write_fasta([("B", true_seq)], tmp_path / "refs.fasta")

    main([
        "-i", str(out_dir), "--ref_fasta", str(tmp_path / "refs.fasta"),
    ])
    report = json.loads((out_dir / "evaluation.json").read_text())
    row = report["groups"]["B"]
    assert row["num_models"] == 2
    assert "tm" not in row and "reference" not in row
    assert row["recovery"] == pytest.approx((1.0 + 38 / 40) / 2, abs=1e-4)
    assert row["diversity"] == pytest.approx(2 / 40, abs=1e-4)


def test_empty_dir_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["-i", str(tmp_path)])


def delete_residues(prot, positions):
    keep = np.array(
        [i for i in range(len(prot)) if i not in set(positions)]
    )
    return dataclasses.replace(
        prot,
        chain_index=prot.chain_index[keep],
        residue_index=prot.residue_index[keep],
        aatype=prot.aatype[keep],
        atom_pos=prot.atom_pos[keep],
        atom_mask=prot.atom_mask[keep],
    )


def test_ligand_interface_stats(tmp_path):
    """sample_ligand.sdf records pair with models by index; contact /
    clash / min-dist means reflect the generated poses."""
    from protein_redesign_tpu.chem.mol import (
        mol_from_smiles,
        mols_to_sdf_file,
        update_mol_positions,
    )

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    samples = [seq_helix(noise=0.0, seed=s) for s in (1, 2)]
    proteins_to_pdb_file(samples, out_dir / "sample_protein.pdb")

    ca0 = samples[0].atom_pos[0, 1]
    lig = mol_from_smiles("CCO")  # 3 heavy atoms
    near = update_mol_positions(
        lig, np.stack([ca0 + [3.0, 0, 0], ca0 + [4.0, 0, 0],
                       ca0 + [1.0, 0, 0]]).astype(np.float32)
    )  # 1.0 A atom clashes with CA0
    far = update_mol_positions(
        lig, np.full((3, 3), 500.0, np.float32)
    )
    mols_to_sdf_file([near, far], out_dir / "sample_ligand.sdf")

    main(["-i", str(out_dir), "-o", str(tmp_path / "r.json")])
    row = json.loads((tmp_path / "r.json").read_text())["groups"]["sample"]
    # near pose: >=1 contact and exactly 1 clash (1.0 A < 2.0 A cutoff);
    # far pose: none — means are over the two models
    assert row["lig_contacts_mean"] >= 0.5
    assert row["lig_clashes_mean"] == 0.5
    assert row["lig_min_dist_mean"] == pytest.approx((1.0 + 1000) / 2,
                                                     rel=0.5)


def test_gapped_reference_pairs_by_residue_number(tmp_path):
    """Experimental reference PDBs have unresolved loops: CA-RMSD and
    recovery must pair residues by (chain, residue number), not by
    array position — a positional prefix would mis-register everything
    after the gap."""
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    samples = [seq_helix(noise=0.2, seed=s) for s in (1, 2)]
    proteins_to_pdb_file(samples, out_dir / "sample_protein.pdb")

    ref = seq_helix()
    # drop an unresolved loop (residues 10-14) and one missing CA
    ref = delete_residues(ref, range(10, 15))
    gapped = dataclasses.replace(ref, atom_mask=ref.atom_mask.copy())
    gapped.atom_mask[20, 1] = 0.0
    protein_to_pdb_file(gapped, tmp_path / "ref.pdb")

    main([
        "-i", str(out_dir), "-r", str(tmp_path / "ref.pdb"),
        "-o", str(tmp_path / "report.json"),
    ])
    row = json.loads(
        (tmp_path / "report.json").read_text()
    )["groups"]["sample"]
    # correct pairing: only ~0.2 A of noise remains; positional-prefix
    # pairing would mis-register 25 of 40 residues (several Angstroms)
    assert row["ca_rmsd_mean"] < 1.0
    # paired identity recovery vs the reference structure's residues
    assert row["recovery"] == 1.0
