"""Parallel-in-time (Picard) DDIM sampler vs the sequential scan.

Covers the convergence guarantee (tol=0 reproduces the sequential
trajectory), tolerance-controlled approximation, NFE/iteration
accounting, and window sharding over an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.paratime import sample_ddim_parallel
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

TINY = ModelConfig(
    esm_dim=16, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
    head_dim=4, num_heads=2, num_blocks=1, num_steps=32,
    dtype="float32", remat=False,
)


@pytest.fixture(scope="module")
def setup():
    model = ProteinReDiffModel(TINY)
    batch = {
        k: jnp.asarray(v)
        for k, v in _make_batch(4, 12, 32, esm_dim=16).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return model, params, batch


KEY = jax.random.PRNGKey(7)
S = 8


class TestExactness:
    def test_tol_zero_matches_sequential_ddim(self, setup):
        model, params, batch = setup
        pos_seq, log_seq = model.sample_ddim(
            params, batch, KEY, ddim_steps=S, eta=0.0, mask_prob=0.3
        )
        pos_par, log_par, stats = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=4, tol=0.0, mask_prob=0.3,
        )
        # Same key => identical init; tol=0 => identical trajectory up to
        # the arithmetic reordering of the y-space formulation.
        np.testing.assert_allclose(
            np.asarray(pos_par), np.asarray(pos_seq), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(log_par), np.asarray(log_seq), atol=5e-4
        )
        # tol=0 converges one point per ~2 sweeps at worst.
        assert int(stats["iterations"]) <= 2 * S + 2
        assert int(stats["nfe"]) >= S  # cannot beat sequential's S evals

    def test_loose_tol_close_and_cheaper(self, setup):
        model, params, batch = setup
        pos_seq, _ = model.sample_ddim(
            params, batch, KEY, ddim_steps=S, eta=0.0, mask_prob=0.3
        )
        pos_par, _, stats = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=4, tol=1e-2, mask_prob=0.3,
        )
        # Looser tolerance: fewer Picard sweeps than the exact run...
        _, _, stats_exact = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=4, tol=0.0, mask_prob=0.3,
        )
        assert int(stats["iterations"]) <= int(stats_exact["iterations"])
        # ...while staying near the sequential trajectory (1e-2 nm RMS
        # per point compounds; allow a loose absolute bound in Angstrom).
        err = np.abs(np.asarray(pos_par) - np.asarray(pos_seq)).max()
        assert err < 2.0, err

    def test_stats_and_shapes(self, setup):
        model, params, batch = setup
        B, N = batch["residue_mask"].shape
        pos, logits, stats = sample_ddim_parallel(
            model, params, batch, KEY, ddim_steps=S, window=3, tol=1e-3,
        )
        assert pos.shape == (B, N, 3)
        assert logits.shape == (B, N, 21)
        assert np.isfinite(np.asarray(pos)).all()
        it, nfe = int(stats["iterations"]), int(stats["nfe"])
        assert 1 <= it <= 2 * S + 2
        assert nfe <= it * 3
        # Padding rows carry no logits (residue-masked output contract).
        rm = np.asarray(batch["residue_mask"])
        assert np.all(np.asarray(logits)[rm == 0] == 0.0)

    def test_coarse_init_same_fixed_point(self, setup):
        """Warm-starting from a coarse solve changes the starting guess,
        not the fixed point: tol=0 still reproduces sequential DDIM, and
        the warm start needs no more sweeps than the constant init."""
        model, params, batch = setup
        pos_seq, _ = model.sample_ddim(
            params, batch, KEY, ddim_steps=S, eta=0.0, mask_prob=0.3
        )
        pos_cold, _, st_cold = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=4, tol=0.0, mask_prob=0.3,
        )
        pos_warm, _, st_warm = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=4, tol=0.0, mask_prob=0.3, coarse_init=2,
        )
        np.testing.assert_allclose(
            np.asarray(pos_warm), np.asarray(pos_seq), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(pos_warm), np.asarray(pos_cold), atol=5e-4
        )
        assert int(st_warm["iterations"]) <= int(st_cold["iterations"])
        # nfe accounts for the coarse evaluations.
        assert int(st_warm["nfe"]) >= 2

    def test_coarse_init_fewer_sweeps_at_tolerance(self, setup):
        model, params, batch = setup
        _, _, st_cold = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=4, tol=1e-3, mask_prob=0.3,
        )
        _, _, st_warm = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=4, tol=1e-3, mask_prob=0.3, coarse_init=2,
        )
        assert int(st_warm["iterations"]) <= int(st_cold["iterations"])

    def test_coarse_init_under_jit(self, setup):
        """coarse_init's host-side tables must stay compile-time constants
        (regression: tracer leak via jnp-derived gamma under jit)."""
        model, params, batch = setup
        fn = jax.jit(
            lambda p, b, k: sample_ddim_parallel(
                model, p, b, k, ddim_steps=S, window=4, tol=1e-3,
                mask_prob=0.3, coarse_init=2,
            )
        )
        pos, _, _ = fn(params, batch, KEY)
        assert np.isfinite(np.asarray(pos)).all()

    def test_jit_compiles_once(self, setup):
        model, params, batch = setup
        fn = jax.jit(
            lambda p, b, k: sample_ddim_parallel(
                model, p, b, k, ddim_steps=S, window=4, tol=1e-3,
                mask_prob=0.3,
            )
        )
        pos1, _, _ = fn(params, batch, KEY)
        pos2, _, _ = fn(params, batch, jax.random.PRNGKey(8))
        assert np.isfinite(np.asarray(pos1)).all()
        # Different keys give different designs (stochastic init).
        assert np.abs(np.asarray(pos1) - np.asarray(pos2)).max() > 1e-3


class TestAbsorbingParallel:
    """Picard iteration for seq_process='absorbing' (deterministic
    sticky reveal): tol=0 must reproduce the sequential absorbing DDIM
    — commitments EXACTLY (discrete), coordinates up to the y-space
    arithmetic reordering."""

    @pytest.fixture(scope="class")
    def asetup(self):
        model = ProteinReDiffModel(TINY.replace(seq_process="absorbing"))
        batch = {
            k: jnp.asarray(v)
            for k, v in _make_batch(4, 12, 32, esm_dim=16).items()
        }
        params = model.init_params(jax.random.PRNGKey(0), batch)
        # Zero-init output heads make reveal confidences degenerate;
        # perturb so the commitment ranking is weight-driven.
        rng = np.random.RandomState(0)
        params = jax.tree_util.tree_map(
            lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(
                x.dtype
            ),
            params,
        )
        return model, params, batch

    def test_tol_zero_matches_sequential(self, asetup):
        model, params, batch = asetup
        pos_seq, log_seq = model.sample_ddim(
            params, batch, KEY, ddim_steps=S, eta=0.0, mask_prob=0.3
        )
        pos_par, log_par, stats = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=4, tol=0.0, mask_prob=0.3,
        )
        np.testing.assert_allclose(
            np.asarray(pos_par), np.asarray(pos_seq), atol=5e-4
        )
        # Commitments are discrete: identical, not just close.
        np.testing.assert_array_equal(
            np.asarray(log_par), np.asarray(log_seq)
        )
        assert int(stats["iterations"]) <= 2 * S + 2

    def test_runner_accepts_absorbing_ddim_parallel(self, asetup):
        from protein_redesign_tpu.chem import (
            mol_from_smiles,
            protein_from_sequence,
            update_mol_positions,
        )
        from protein_redesign_tpu.cli.common import SamplingRunner
        from protein_redesign_tpu.data import ligand_to_data, protein_to_data

        model, params, _ = asetup
        mol = update_mol_positions(mol_from_smiles("CC"), np.zeros((2, 3)))
        prot = protein_from_sequence("ACDEFGHI")
        data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}
        runner = SamplingRunner(
            model, params, buckets=(16,), mask_prob=0.5,
            sampler="ddim_parallel", ddim_steps=4, window=4,
        )
        (res,) = runner.run([data], jax.random.PRNGKey(1))
        pos, logits = res
        assert np.isfinite(pos).all()
        # Every residue row decodes to a committed (non-X) class.
        assert (np.argmax(logits[2:], axis=-1) > 0).all()

    def test_stochastic_reveal_rejected(self, asetup):
        from protein_redesign_tpu.cli.common import SamplingRunner

        model, params, batch = asetup
        noisy = ProteinReDiffModel(
            model.cfg.replace(reveal_temperature=0.5)
        )
        with pytest.raises(ValueError, match="deterministic reveal"):
            SamplingRunner(noisy, params, sampler="ddim_parallel")
        with pytest.raises(NotImplementedError, match="deterministic"):
            sample_ddim_parallel(
                noisy, params, batch, KEY, ddim_steps=4, window=2
            )
        with pytest.raises(NotImplementedError, match="coarse_init"):
            sample_ddim_parallel(
                model, params, batch, KEY, ddim_steps=4, window=2,
                coarse_init=2,
            )


class TestRunnerGuards:
    def test_empty_window_rejected(self, setup):
        model, params, batch = setup
        with pytest.raises(ValueError, match="window"):
            sample_ddim_parallel(
                model, params, batch, KEY, ddim_steps=4, window=0
            )
        with pytest.raises(ValueError, match="ddim_steps"):
            sample_ddim_parallel(
                model, params, batch, KEY, ddim_steps=0, window=2
            )

    def test_ancestral_seq_reverse_rejected(self, setup):
        from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

        model, params, batch = setup
        anc = ProteinReDiffModel(model.cfg.replace(seq_reverse="ancestral"))
        with pytest.raises(NotImplementedError, match="ancestral"):
            sample_ddim_parallel(
                anc, params, batch, KEY, ddim_steps=4, window=2
            )

    def test_eta_rejected_with_ddim_parallel(self, setup):
        from protein_redesign_tpu.cli.common import SamplingRunner

        model, params, _ = setup
        with pytest.raises(ValueError, match="eta"):
            SamplingRunner(
                model, params, sampler="ddim_parallel", eta=0.5,
            )

    def test_unknown_sampler_rejected(self, setup):
        from protein_redesign_tpu.cli.common import SamplingRunner

        model, params, _ = setup
        with pytest.raises(ValueError, match="Unknown sampler"):
            SamplingRunner(model, params, sampler="euler")


class TestTausGrid:
    def test_sequential_and_parallel_taus_identical(self):
        """Regression (code review): an f32 jnp.linspace().round() diverges
        from f64 numpy rounding at some (num_steps, ddim_steps), e.g.
        T=101/S=25 -> tau 37 vs 38. Both samplers must share ONE grid."""
        for T, S in [(101, 25), (1000, 19), (1000, 31), (789, 25), (200, 50)]:
            expected = np.round(np.linspace(T - 1, 0, S)).astype(np.int32)
            cfg = TINY.replace(num_steps=T)
            model = ProteinReDiffModel(cfg)
            # sample_ddim's grid: re-derive by tracing its taus expression
            # (both implementations now share the numpy formula; pin it).
            taus_seq = np.round(np.linspace(T - 1, 0, S)).astype(np.int32)
            np.testing.assert_array_equal(taus_seq, expected)
            # and the two samplers agree end-to-end on a case where the
            # f32 path used to diverge:
            if (T, S) == (101, 25):
                batch = {
                    k: jnp.asarray(v)
                    for k, v in _make_batch(4, 12, 32, esm_dim=16).items()
                }
                params = model.init_params(jax.random.PRNGKey(0), batch)
                p_seq, _ = model.sample_ddim(
                    params, batch, KEY, ddim_steps=S, mask_prob=0.3
                )
                p_par, _, _ = sample_ddim_parallel(
                    model, params, batch, KEY,
                    ddim_steps=S, window=4, tol=0.0, mask_prob=0.3,
                )
                np.testing.assert_allclose(
                    np.asarray(p_par), np.asarray(p_seq), atol=5e-4
                )


class TestMesh:
    def test_window_sharded_over_mesh_matches_single_device(self, setup):
        from protein_redesign_tpu.parallel.mesh import make_mesh

        model, params, batch = setup
        mesh = make_mesh(jax.devices(), (8, 1))
        pos_m, log_m, stats = jax.jit(
            lambda p, b, k: sample_ddim_parallel(
                model, p, b, k, ddim_steps=S, window=8, tol=0.0,
                mask_prob=0.3, mesh=mesh,
            )
        )(params, batch, KEY)
        pos_1, log_1, _ = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=8, tol=0.0, mask_prob=0.3,
        )
        np.testing.assert_allclose(
            np.asarray(pos_m), np.asarray(pos_1), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(log_m), np.asarray(log_1), atol=1e-4
        )

    def test_absorbing_window_sharded_matches_single_device(self):
        """The absorbing Picard path's window sharding: commitments must
        come out IDENTICAL (discrete) on the 8-device mesh."""
        from protein_redesign_tpu.parallel.mesh import make_mesh

        model = ProteinReDiffModel(TINY.replace(seq_process="absorbing"))
        batch = {
            k: jnp.asarray(v)
            for k, v in _make_batch(4, 12, 32, esm_dim=16).items()
        }
        params = model.init_params(jax.random.PRNGKey(0), batch)
        rng = np.random.RandomState(0)
        params = jax.tree_util.tree_map(
            lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(
                x.dtype
            ),
            params,
        )
        mesh = make_mesh(jax.devices(), (8, 1))
        pos_m, log_m, _ = jax.jit(
            lambda p, b, k: sample_ddim_parallel(
                model, p, b, k, ddim_steps=S, window=8, tol=0.0,
                mask_prob=0.3, mesh=mesh,
            )
        )(params, batch, KEY)
        pos_1, log_1, _ = sample_ddim_parallel(
            model, params, batch, KEY,
            ddim_steps=S, window=8, tol=0.0, mask_prob=0.3,
        )
        np.testing.assert_allclose(
            np.asarray(pos_m), np.asarray(pos_1), atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(log_m), np.asarray(log_1))

    def test_runner_ddim_parallel_end_to_end(self, setup):
        """SamplingRunner integration: the serve/generate path."""
        from protein_redesign_tpu.cli.common import SamplingRunner
        from protein_redesign_tpu.data.featurize import (
            ligand_to_data,
            protein_to_data,
        )
        from protein_redesign_tpu.cli.common import parse_ligand_arg
        from protein_redesign_tpu.chem.protein import protein_from_sequence
        from protein_redesign_tpu.parallel.mesh import make_mesh

        model, params, _ = setup
        protein = protein_from_sequence("ACDEFGHIKLMNPQ")
        mol = parse_ligand_arg("CCO")
        data = {
            **ligand_to_data(mol),
            **protein_to_data(
                protein,
                residue_esm=np.zeros((14, TINY.esm_dim), np.float32),
            ),
        }
        mesh = make_mesh(jax.devices(), (8, 1))
        runner = SamplingRunner(
            model, params, buckets=(32,), batch_size=1, mesh=mesh,
            sampler="ddim_parallel", ddim_steps=S, window=8, ptol=1e-3,
            mask_prob=0.3,
        )
        out = runner.run([data, data], jax.random.PRNGKey(3))
        assert len(out) == 2
        for pos, logits in out:
            assert pos.shape == (17, 3) and logits.shape == (17, 21)
            assert np.isfinite(pos).all()
