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


class TestCommonHelpers:
    def test_fasta_wrapped_and_crlf(self, tmp_path):
        """Wrapped records are joined and CRLF endings stripped — the
        reference's line-per-protein parse misaligns names on wrapped
        FASTA and crashes on '\\r' (robustness fix, docs/PARITY.md)."""
        from protein_redesign_tpu.cli.common import (
            proteins_from_fasta_with_mask,
        )

        fasta = tmp_path / "wrapped.fasta"
        fasta.write_bytes(
            b">one two\r\nACDEFGHIKL\r\nMNPQRSTVWY\r\n"
            b">three\r\nACDE\r\n"
        )
        proteins, names, seqs = proteins_from_fasta_with_mask(str(fasta))
        assert names == ["one_two", "three"]
        assert seqs == ["ACDEFGHIKLMNPQRSTVWY", "ACDE"]
        assert len(proteins) == 2 and len(proteins[0]) == 20

    def test_fasta_mask_seeded_reproducible(self, tmp_path):
        import random

        from protein_redesign_tpu.cli.common import (
            proteins_from_fasta_with_mask,
        )

        fasta = tmp_path / "one.fasta"
        fasta.write_text(">a\nACDEFGHIKLMNPQRSTVWY\n")
        _, _, s1 = proteins_from_fasta_with_mask(
            str(fasta), 0.3, rng=random.Random(7)
        )
        _, _, s2 = proteins_from_fasta_with_mask(
            str(fasta), 0.3, rng=random.Random(7)
        )
        assert s1 == s2  # same seed -> same masked positions
        assert s1[0].count("X") == 6  # 20 residues * 0.3

    def test_tri_state_config_overrides(self):
        """BooleanOptionalAction flags override the checkpoint config
        only when explicitly passed (either polarity)."""
        import argparse

        from protein_redesign_tpu.cli.common import (
            add_sampler_args,
            sampler_cfg_overrides,
        )

        def parse(argv):
            p = argparse.ArgumentParser()
            add_sampler_args(p)
            return sampler_cfg_overrides(p.parse_args(argv))

        unset = parse([])
        for key in ("outer_factored", "pair_stream_bf16", "sample_guard"):
            assert key not in unset  # checkpoint config survives

        on = parse(["--pair_stream_bf16", "--outer_factored"])
        assert on["pair_stream_bf16"] is True
        assert on["outer_factored"] is True
        off = parse(["--no-pair_stream_bf16", "--no-outer_factored"])
        assert off["pair_stream_bf16"] is False
        assert off["outer_factored"] is False

    def test_serving_default_pair_stream_bf16_wide_head(self):
        """apply_serving_defaults (round 5): pair_stream_bf16 defaults
        ON for wide-head (C>=64) inference — quality-gated by the
        abs_h16 bf16pair report — while an explicit --no wins and
        narrow-head checkpoints keep their stored value."""
        import argparse

        from protein_redesign_tpu.cli.common import (
            add_sampler_args,
            apply_serving_defaults,
            sampler_cfg_overrides,
        )
        from protein_redesign_tpu.config import ModelConfig

        def cfg_for(argv, **cfg_kw):
            p = argparse.ArgumentParser()
            add_sampler_args(p)
            args = p.parse_args(argv)
            cfg = ModelConfig(training_mode=False, **cfg_kw).replace(
                **sampler_cfg_overrides(args)
            )
            return apply_serving_defaults(cfg, args)

        assert cfg_for([], head_dim=64, num_heads=1).pair_stream_bf16
        assert not cfg_for(
            ["--no-pair_stream_bf16"], head_dim=64, num_heads=1
        ).pair_stream_bf16
        assert not cfg_for([], head_dim=16, num_heads=4).pair_stream_bf16
        assert cfg_for(
            ["--pair_stream_bf16"], head_dim=16, num_heads=4
        ).pair_stream_bf16

    def test_update_seq_ignores_ligand_slots(self):
        """A non-X decode in a LIGAND slot must not frame-shift the
        residue window (in-contract those slots are masked to X; this
        guards the out-of-contract case)."""
        import numpy as np

        from protein_redesign_tpu.chem.protein import (
            protein_from_sequence,
            protein_to_sequence,
        )
        from protein_redesign_tpu.cli.common import update_seq

        protein = protein_from_sequence("ACDEFGHIKL")  # n_res = 10
        n_lig, n = 5, 15
        logits = np.zeros((n, 21), np.float32)
        # ligand slot 2 "decodes" Ala (index 1); residues decode their
        # own identities
        logits[2, 1] = 9.0
        for i, aa in enumerate("ACDEFGHIKL"):
            from protein_redesign_tpu.chem.protein import RESIDUE_TYPES

            logits[n_lig + i, 1 + RESIDUE_TYPES.index(aa)] = 9.0
        out = update_seq(protein, logits)
        assert protein_to_sequence(out) == "ACDEFGHIKL"


class TestNonFiniteGuard:
    def test_runner_warns_on_nonfinite_samples(self):
        """A diverged/untrained checkpoint that yields NaN positions or
        logits must raise a RuntimeWarning instead of silently decoding
        all-X garbage (observed: random-init h64x1 weights under the
        Gaussian sequence channel, BASELINE.md round-3 quality cells)."""
        import warnings

        import jax
        import jax.numpy as jnp

        from protein_redesign_tpu.chem import (
            mol_from_smiles,
            protein_from_sequence,
            update_mol_positions,
        )
        from protein_redesign_tpu.cli.common import SamplingRunner
        from protein_redesign_tpu.data import ligand_to_data, protein_to_data
        from protein_redesign_tpu.data.collate import collate_fn, numeric_batch
        from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

        rng = np.random.RandomState(0)
        mol = update_mol_positions(
            mol_from_smiles("CCO"), rng.randn(3, 3).astype(np.float32)
        )
        prot = protein_from_sequence("ACDEFGHIKLMN")
        prot.atom_pos[:, 1] = rng.randn(12, 3)
        data = {
            **ligand_to_data(mol),
            **protein_to_data(
                prot,
                residue_esm=rng.randn(12, 16).astype(np.float32),
                esm_dim=16,
            ),
        }
        model = ProteinReDiffModel(TINY.replace(training_mode=False))
        b = numeric_batch(collate_fn([data], buckets=(16,)))
        params = model.init_params(jax.random.PRNGKey(0), b)

        # Healthy params: no warning.
        runner = SamplingRunner(model, params, buckets=(16,), batch_size=1)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            runner.run([data], jax.random.PRNGKey(1))

        # Poisoned params -> NaN samples -> exactly one warning for the
        # whole run (not one per batch group).
        bad = jax.tree_util.tree_map(lambda v: v * jnp.nan, params)
        runner = SamplingRunner(model, bad, buckets=(16,), batch_size=1)
        with pytest.warns(RuntimeWarning, match="non-finite"):
            out = runner.run([data, data], jax.random.PRNGKey(1))
        assert len(out) == 2
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            runner.run([data], jax.random.PRNGKey(2))  # already warned
