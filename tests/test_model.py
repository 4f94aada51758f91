"""Model-layer tests: shapes, invariants, SE(3)-equivariance, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protein_redesign_tpu.chem import (
    mol_from_smiles,
    protein_from_sequence,
    update_mol_positions,
)
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.data import collate_fn, ligand_to_data, protein_to_data
from protein_redesign_tpu.models.diffusion import DiffusionSchedule, get_betas
from protein_redesign_tpu.models.masking import random_mask, spatial_mask
from protein_redesign_tpu.models.prdiff import NUM_CLASSES, ProteinReDiffModel
from protein_redesign_tpu.ops.geometry import remove_mean

TINY = ModelConfig(
    esm_dim=32,
    time_dim=16,
    dist_dim=16,
    single_dim=32,
    pair_dim=16,
    head_dim=8,
    num_heads=2,
    num_blocks=2,
    num_steps=8,
    dtype="float32",
    remat=False,
)


def make_batch(esm_dim=32, n_res=11, seed=0):
    rng = np.random.RandomState(seed)
    mol = mol_from_smiles("CCO")
    mol = update_mol_positions(mol, rng.randn(3, 3).astype(np.float32))
    prot = protein_from_sequence("ACDEFGHIKLM"[:n_res])
    prot.atom_pos[:, 1] = rng.randn(n_res, 3)
    data = {
        **ligand_to_data(mol),
        **protein_to_data(
            prot, residue_esm=rng.randn(n_res, esm_dim).astype(np.float32),
            esm_dim=esm_dim,
        ),
    }
    batch = collate_fn([data], buckets=(16, 24, 32))
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


class TestSchedule:
    def test_linear_betas(self):
        betas = get_betas(64, "linear")
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)

    def test_cosine_valid(self):
        betas = get_betas(64, "cosine")
        assert np.all(betas >= 0) and np.all(betas <= 0.999)

    def test_derived_quantities(self):
        s = DiffusionSchedule.create(64, "linear")
        np.testing.assert_allclose(
            s.alphas_cumprod[1:],
            s.alphas_cumprod_prev[1:] * s.alphas[1:],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            s.sqrt_alphas_cumprod**2 + s.sqrt_one_minus_alphas_cumprod**2,
            1.0,
            rtol=1e-5,
        )
        assert s.alphas_cumprod_prev[0] == 1.0

    def test_invalid_schedule(self):
        with pytest.raises(ValueError):
            get_betas(10, "nope")


class TestGeometry:
    def test_remove_mean_zero_com(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 10, 3))
        mask = jnp.ones((2, 10)).at[:, 7:].set(0.0)
        y = remove_mean(x, mask)
        com = jnp.sum(mask[..., None] * y, axis=1)
        np.testing.assert_allclose(np.asarray(com), 0.0, atol=1e-5)
        # Masked rows unchanged
        np.testing.assert_allclose(
            np.asarray(y[:, 7:]), np.asarray(x[:, 7:]), atol=1e-6
        )


class TestMasking:
    def test_random_mask_fraction(self):
        key = jax.random.PRNGKey(0)
        mask = jnp.ones((4, 32))
        extra, inv = random_mask(key, mask, jnp.asarray(0.5))
        assert int(inv.sum()) == 64  # half of 128 valid
        np.testing.assert_allclose(
            np.asarray(extra + inv), np.ones((4, 32)), atol=0
        )

    def test_random_mask_respects_padding(self):
        key = jax.random.PRNGKey(1)
        mask = jnp.ones((2, 16)).at[:, 8:].set(0.0)
        extra, inv = random_mask(key, mask, jnp.asarray(1.0))
        assert np.all(np.asarray(inv[:, 8:]) == 0)
        assert int(inv.sum()) == 16

    def test_spatial_mask_nearest(self):
        key = jax.random.PRNGKey(2)
        n = 8
        # Residues on a line; ligand centroid at origin.
        ca = jnp.stack(
            [jnp.arange(n, dtype=jnp.float32),
             jnp.zeros(n), jnp.zeros(n)], axis=-1
        )[None]
        rmask = jnp.ones((1, n))
        atom_pos = jnp.zeros((1, 4, 3))
        atom_mask = jnp.ones((1, 4))
        extra, inv = spatial_mask(key, ca, rmask, atom_pos, atom_mask,
                                  jnp.asarray(0.999))
        k = int(inv.sum())
        # Masked residues must be the k nearest to the centroid (prefix).
        if k > 0:
            assert np.all(np.asarray(inv[0, :k]) == 1)
            assert np.all(np.asarray(inv[0, k:]) == 0)


class TestModel:
    def setup_method(self):
        self.model = ProteinReDiffModel(TINY)
        self.batch = make_batch()
        key = jax.random.PRNGKey(0)
        prepared = self.model.prepare_batch(
            self.batch, key, training=False, mask_prob=0.3
        )
        self.params = self.model.init_params(key, self.batch)
        self.prepared = prepared

    def test_forward_shapes(self):
        B, N = self.batch["residue_mask"].shape
        z = jnp.zeros((B, N, 3))
        seq = jnp.zeros((B, N, NUM_CLASSES))
        mask = self.prepared["residue_and_atom_mask"]
        t = jnp.zeros((B,), jnp.int32)
        noise_pred, seq_pred = self.model.apply(
            self.params, self.prepared, z, seq, mask, t
        )
        assert noise_pred.shape == (B, N, 3)
        assert seq_pred.shape == (B, N, NUM_CLASSES)
        assert np.isfinite(np.asarray(noise_pred)).all()
        assert np.isfinite(np.asarray(seq_pred)).all()

    def test_noise_pred_zero_com(self):
        B, N = self.batch["residue_mask"].shape
        key = jax.random.PRNGKey(3)
        mask = self.prepared["residue_and_atom_mask"]
        z = remove_mean(jax.random.normal(key, (B, N, 3)), mask)
        seq = jnp.zeros((B, N, NUM_CLASSES))
        t = jnp.full((B,), 3, jnp.int32)
        noise_pred, _ = self.model.apply(
            self.params, self.prepared, z, seq, mask, t
        )
        com = jnp.sum(mask[..., None] * noise_pred, axis=1)
        np.testing.assert_allclose(np.asarray(com), 0.0, atol=1e-4)

    def test_equivariance(self):
        """Rotating input coords must rotate noise_pred (SE(3) readout)."""
        B, N = self.batch["residue_mask"].shape
        key = jax.random.PRNGKey(4)
        mask = self.prepared["residue_and_atom_mask"]
        z = remove_mean(jax.random.normal(key, (B, N, 3)), mask)
        seq = jnp.zeros((B, N, NUM_CLASSES))
        t = jnp.full((B,), 2, jnp.int32)
        # Rotation about z by 90 deg
        R = jnp.asarray(
            [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
        )
        out1, seq1 = self.model.apply(
            self.params, self.prepared, z, seq, mask, t
        )
        out2, seq2 = self.model.apply(
            self.params, self.prepared, z @ R.T, seq, mask, t
        )
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(out1 @ R.T), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(seq2), np.asarray(seq1), atol=2e-3
        )

    def test_loss_finite_and_deterministic(self):
        key = jax.random.PRNGKey(5)
        loss1, _ = self.model.loss(self.params, self.batch, key, training=True)
        loss2, _ = self.model.loss(self.params, self.batch, key, training=True)
        assert np.isfinite(float(loss1))
        assert float(loss1) == pytest.approx(float(loss2))

    def test_sample_end_to_end(self):
        key = jax.random.PRNGKey(6)
        sample = jax.jit(
            lambda p, b, k: self.model.sample(p, b, k, mask_prob=0.3)
        )
        pos, seq_logits = sample(self.params, self.batch, key)
        B, N = self.batch["residue_mask"].shape
        assert pos.shape == (B, N, 3)
        assert seq_logits.shape == (B, N, NUM_CLASSES)
        assert np.isfinite(np.asarray(pos)).all()
        assert np.isfinite(np.asarray(seq_logits)).all()
        # Padded-region logits are zeroed by residue_mask.
        rm = np.asarray(self.batch["residue_mask"])
        assert np.all(np.asarray(seq_logits)[rm < 0.5] == 0)

    def test_grad_flows(self):
        key = jax.random.PRNGKey(7)
        grads = jax.grad(
            lambda p: self.model.loss(p, self.batch, key, training=True)[0]
        )(self.params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
        assert total > 0


class TestOuterLinearFactored:
    """outer_factored: algebraic reassociation of OuterLinear (no
    [N,N,2S] concat; the difference half collapses to u_i - u_j).
    Same params/tree as the default path; float reassociation only."""

    def test_module_matches_default(self):
        from protein_redesign_tpu.models.denoiser import OuterLinear

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 16, 12), jnp.float32)
        ref_mod = OuterLinear(8, dtype=jnp.float32)
        fac_mod = OuterLinear(8, factored=True, dtype=jnp.float32)
        params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
        p2 = fac_mod.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(p2)
        )
        # Non-degenerate weights (the 'final' init is zeros).
        params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                np.random.RandomState(5).randn(*v.shape) * 0.3, v.dtype
            ),
            params,
        )
        ref = ref_mod.apply({"params": params}, x)
        out = fac_mod.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

        def loss(mod):
            return lambda p: jnp.sum(jnp.square(mod.apply({"params": p}, x)))

        g_ref = jax.grad(loss(ref_mod))(params)
        g_fac = jax.grad(loss(fac_mod))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref),
            jax.tree_util.tree_leaves(g_fac),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4
            )

    def test_opm_module_matches_default(self):
        from protein_redesign_tpu.models.denoiser import OuterProductUpdate

        rng = np.random.RandomState(13)
        x = jnp.asarray(rng.randn(2, 16, 12), jnp.float32)
        mask = jnp.asarray((rng.rand(2, 16) > 0.3).astype(np.float32))
        ref_mod = OuterProductUpdate(8, 4, dtype=jnp.float32)
        fac_mod = OuterProductUpdate(8, 4, factored=True, dtype=jnp.float32)
        params = ref_mod.init(jax.random.PRNGKey(0), x, mask)["params"]
        p2 = fac_mod.init(jax.random.PRNGKey(0), x, mask)["params"]
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(p2)
        )
        params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                np.random.RandomState(5).randn(*v.shape) * 0.3, v.dtype
            ),
            params,
        )
        ref = ref_mod.apply({"params": params}, x, mask)
        out = fac_mod.apply({"params": params}, x, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

        def loss(mod):
            return lambda p: jnp.sum(
                jnp.square(mod.apply({"params": p}, x, mask))
            )

        g_ref = jax.grad(loss(ref_mod))(params)
        g_fac = jax.grad(loss(fac_mod))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref),
            jax.tree_util.tree_leaves(g_fac),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4
            )

    def test_full_model_forward_matches(self):
        batch = make_batch()
        # Pin the unfactored path explicitly: the config default flipped to
        # True in round 3, so `TINY` alone would compare factored vs itself.
        ref_model = ProteinReDiffModel(TINY.replace(outer_factored=False))
        fac_model = ProteinReDiffModel(TINY.replace(outer_factored=True))
        key = jax.random.PRNGKey(0)
        params = ref_model.init_params(key, batch)
        prepared = ref_model.prepare_batch(
            batch, key, training=False, mask_prob=0.3
        )
        B, N = batch["residue_mask"].shape
        rng = np.random.RandomState(7)
        z = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
        seq = jnp.asarray(rng.randn(B, N, NUM_CLASSES), jnp.float32)
        mask = prepared["residue_and_atom_mask"]
        t = jnp.ones((B,), jnp.int32)
        ref_pos, ref_seq = ref_model.apply(params, prepared, z, seq, mask, t)
        fac_pos, fac_seq = fac_model.apply(params, prepared, z, seq, mask, t)
        np.testing.assert_allclose(
            np.asarray(fac_pos), np.asarray(ref_pos), atol=5e-5, rtol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(fac_seq), np.asarray(ref_seq), atol=5e-5, rtol=5e-5
        )


class TestPairStreamBf16:
    def test_forward_close_and_finite(self):
        """pair_stream_bf16 (the HBM-traffic lever, config.py): same
        params, demoted pair residual accumulator — outputs must stay
        finite and close to the f32-stream forward."""
        batch = make_batch()
        ref_model = ProteinReDiffModel(TINY)
        bf_model = ProteinReDiffModel(TINY.replace(pair_stream_bf16=True))
        key = jax.random.PRNGKey(0)
        params = ref_model.init_params(key, batch)
        prepared = ref_model.prepare_batch(
            batch, key, training=False, mask_prob=0.3
        )
        B, N = batch["residue_mask"].shape
        rng = np.random.RandomState(11)
        z = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
        seq = jnp.asarray(rng.randn(B, N, NUM_CLASSES), jnp.float32)
        mask = prepared["residue_and_atom_mask"]
        t = jnp.ones((B,), jnp.int32)
        ref_pos, ref_seq = ref_model.apply(params, prepared, z, seq, mask, t)
        bf_pos, bf_seq = bf_model.apply(params, prepared, z, seq, mask, t)
        assert np.isfinite(np.asarray(bf_pos)).all()
        assert np.isfinite(np.asarray(bf_seq)).all()
        # bf16 has ~3 decimal digits; demoting only the residual stream
        # keeps outputs within a relative ~1e-2 of the f32 stream.
        np.testing.assert_allclose(
            np.asarray(bf_pos), np.asarray(ref_pos), atol=5e-2, rtol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(bf_seq), np.asarray(ref_seq), atol=5e-2, rtol=5e-2
        )
