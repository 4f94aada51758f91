"""End-to-end CLI tests on a tiny random model (CPU, small num_steps)."""

import numpy as np
import pytest

from protein_redesign_tpu.config import ModelConfig

TINY = ModelConfig(
    esm_dim=16, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
    head_dim=4, num_heads=2, num_blocks=1, num_steps=4,
    dtype="float32", remat=False,
)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Params-only checkpoint for a tiny random model."""
    import jax

    from __graft_entry__ import _make_batch
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
    from protein_redesign_tpu.utils.checkpoint import save_params_only

    path = tmp_path_factory.mktemp("ckpt") / "tiny"
    model = ProteinReDiffModel(TINY)
    import jax.numpy as jnp

    batch = {
        k: jnp.asarray(v)
        for k, v in _make_batch(4, 8, 16, esm_dim=16).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    save_params_only(path, params, TINY)
    return path


SEQ = "ACDEFGHIKLMNPQRSTVWY"


class TestGenerateCLI:
    def test_sequence_plus_smiles(self, tiny_ckpt, tmp_path):
        from protein_redesign_tpu.cli.generate import main

        out = tmp_path / "gen"
        main([
            "-c", str(tiny_ckpt), "-o", str(out),
            "-p", SEQ, "-l", "CCO", "-n", "2",
            "--num_steps", "4", "--mask_prob", "0.3",
        ])
        assert (out / "sample_protein.pdb").exists()
        assert (out / "sample_ligand.sdf").exists()
        tmscores = (out / "sample_tmscores.txt").read_text().splitlines()
        assert len(tmscores) == 2
        assert all(0 <= float(s) <= 1 for s in tmscores)
        # Multi-model PDB parses back.
        from protein_redesign_tpu.chem.protein import proteins_from_pdb_file

        models = proteins_from_pdb_file(out / "sample_protein.pdb")
        assert len(models) == 2
        # Ligand SDF parses back with 3 heavy atoms.
        from protein_redesign_tpu.chem.mol import mol_from_sdf

        mol = mol_from_sdf(out / "sample_ligand.sdf")
        assert mol.num_atoms() == 3

    def test_num_devices_mesh(self, tiny_ckpt, tmp_path):
        """--num_devices N wires a data-parallel mesh into the runner
        (the reference's DDP --num_gpus, predict_batch_strc_msk_inp.py:209)."""
        from protein_redesign_tpu.cli.generate import main

        out = tmp_path / "gen_mesh"
        main([
            "-c", str(tiny_ckpt), "-o", str(out),
            "-p", SEQ, "-l", "CCO", "-n", "8",
            "--num_steps", "2", "--num_devices", "8", "--seed", "5",
        ])
        tmscores = (out / "sample_tmscores.txt").read_text().splitlines()
        assert len(tmscores) == 8

    def test_dummy_ligand(self, tiny_ckpt, tmp_path):
        from protein_redesign_tpu.cli.generate import main

        out = tmp_path / "gen_dummy"
        main([
            "-c", str(tiny_ckpt), "-o", str(out),
            "-p", SEQ[:10], "-l", "*", "-n", "1",
            "--num_steps", "2",
        ])
        assert (out / "sample_protein.pdb").exists()


class TestBatchCLIs:
    def test_sequence_batch(self, tiny_ckpt, tmp_path):
        from protein_redesign_tpu.cli.predict_batch_sequence import main

        fasta = tmp_path / "in.fasta"
        fasta.write_text(f">prot one\n{SEQ}\n>prot2\n{SEQ[:12]}\n")
        smiles = tmp_path / "in.smiles"
        smiles.write_text("CCO\nc1ccccc1\n")
        out = tmp_path / "seqout"
        main([
            "-c", str(tiny_ckpt), "-o", str(out),
            "-p", str(fasta), "-l", str(smiles), "-n", "2",
            "--num_steps", "2", "--mask_prob", "0.2", "--seed", "0",
        ])
        masked = (out / "masked_sequences.fasta").read_text()
        assert masked.count(">") == 2
        assert "prot_one" in masked  # space -> underscore
        sample = (out / "sample_sequences.fasta").read_text()
        assert sample.count(">") == 4  # 2 inputs x 2 samples

    def test_structure_batch(self, tiny_ckpt, tmp_path):
        from protein_redesign_tpu.cli.predict_batch_structure import main

        fasta = tmp_path / "in.fasta"
        fasta.write_text(f">a\n{SEQ}\n")
        out = tmp_path / "strout"
        main([
            "-c", str(tiny_ckpt), "-o", str(out),
            "-p", str(fasta), "-n", "2",
            "--num_steps", "2", "--mask_prob", "0.0", "--seed", "0",
        ])
        assert (out / "sample_protein_a_model_0.pdb").exists()
        assert (out / "sample_protein_a_model_1.pdb").exists()
        assert (out / "sample_ligand_a_model_0.sdf").exists()
        scores = (out / "sample_tmscores_a.txt").read_text().splitlines()
        assert len(scores) == 2
