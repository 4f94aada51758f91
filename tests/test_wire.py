"""Wire-format compression (data/wire.py): lossless round-trip + identical
training loss through the compact host->device batch encoding."""

import numpy as np
import pytest


def _canonical_batch(B=2, N=16, esm_dim=8, seed=0):
    rng = np.random.RandomState(seed)
    na, nr = 3, 9
    b = {
        "num_atoms": np.full((B,), na, np.int64),
        "atom_feats": rng.randint(0, 119, (B, N, 9)).astype(np.int64),
        "atom_mask": (np.arange(N) < na)[None].repeat(B, 0).astype(np.float32),
        "atom_pos": rng.randn(B, N, 3).astype(np.float32),
        "bond_feats": rng.randint(0, 5, (B, N, N, 3)).astype(np.int64),
        "bond_mask": rng.randint(0, 2, (B, N, N)).astype(np.float32),
        "bond_distance": rng.randint(0, 300, (B, N, N)).astype(np.int64),
        "num_residues": np.full((B,), nr, np.int64),
        "residue_type": rng.randint(0, 21, (B, N)).astype(np.int64),
        "residue_mask": ((np.arange(N) >= na) & (np.arange(N) < na + nr))[
            None
        ].repeat(B, 0).astype(np.float32),
        "residue_chain_index": rng.randint(0, 4, (B, N)).astype(np.int64),
        "residue_index": rng.randint(-5, 900, (B, N)).astype(np.int64),
        "residue_atom_pos": rng.randn(B, N, 37, 3).astype(np.float32),
        "residue_atom_mask": rng.randint(0, 2, (B, N, 37)).astype(np.float32),
        "residue_esm": rng.randn(B, N, esm_dim).astype(np.float32),
        "residue_esm_tokens": rng.randint(0, 33, (B, N)).astype(np.int64),
    }
    return b


class TestRoundTrip:
    def test_lossless_except_clipped_distance(self):
        from protein_redesign_tpu.data.wire import (
            compress_batch,
            decompress_batch,
        )

        b = _canonical_batch()
        wire = compress_batch(b, esm_bf16=False)
        # 4x+ smaller on the big int/mask legs
        assert wire["bond_feats"].dtype == np.int8
        assert wire["bond_mask"].dtype == np.uint8
        assert wire["residue_esm"].dtype == np.float32
        out = {k: np.asarray(v) for k, v in decompress_batch(wire).items()}
        for k, v in b.items():
            if k == "bond_distance":
                np.testing.assert_array_equal(out[k], np.clip(v, -128, 127))
            else:
                np.testing.assert_array_equal(
                    out[k], v, err_msg=f"field {k}"
                )

    def test_esm_bf16_leg(self):
        import ml_dtypes

        from protein_redesign_tpu.data.wire import (
            compress_batch,
            decompress_batch,
        )

        b = _canonical_batch()
        wire = compress_batch(b, esm_bf16=True)
        assert wire["residue_esm"].dtype == ml_dtypes.bfloat16
        out = decompress_batch(wire)
        esm = np.asarray(out["residue_esm"])
        assert esm.dtype == np.float32
        np.testing.assert_allclose(
            esm, b["residue_esm"], rtol=8e-3, atol=1e-6
        )

    def test_decompress_is_noop_on_canonical(self):
        from protein_redesign_tpu.data.wire import decompress_batch

        b = _canonical_batch()
        out = decompress_batch(b)
        for k in b:
            got = np.asarray(out[k])
            if b[k].dtype == np.int64:  # canonicalized to int32 widths
                assert got.dtype in (np.int32, np.int64)
            np.testing.assert_array_equal(got, b[k])

    def test_overflow_raises(self):
        from protein_redesign_tpu.data.wire import compress_batch

        b = _canonical_batch()
        b["residue_index"] = b["residue_index"] + 40000  # > int16
        with pytest.raises(ValueError, match="residue_index"):
            compress_batch(b)


def test_training_loss_identical_through_wire():
    """The f32-mode loss must be bit-identical whether the batch crossed in
    canonical or wire form (prepare_batch decompresses transparently)."""
    import jax

    from protein_redesign_tpu.config import ModelConfig
    from protein_redesign_tpu.data.wire import compress_batch
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

    cfg = ModelConfig(
        single_dim=16, pair_dim=8, num_blocks=1, head_dim=4, num_heads=2,
        esm_dim=8, time_dim=8, dist_dim=8, num_steps=4, dtype="float32",
        training_mode=True, remat=False,
    )
    model = ProteinReDiffModel(cfg)
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data
    from protein_redesign_tpu.data.collate import collate_fn, numeric_batch

    rng = np.random.RandomState(0)
    mol = update_mol_positions(
        mol_from_smiles("CCO"), rng.randn(3, 3).astype(np.float32)
    )
    prot = protein_from_sequence("ACDEFGHIK")
    prot.atom_pos[:, 1] = rng.randn(9, 3)
    d = {
        **ligand_to_data(mol),
        **protein_to_data(
            prot,
            residue_esm=rng.randn(9, 8).astype(np.float32),
            esm_dim=8,
        ),
    }
    b = numeric_batch(collate_fn([d, d], buckets=(16,)))
    params = model.init_params(jax.random.PRNGKey(0), b)
    key = jax.random.PRNGKey(1)
    loss_fn = jax.jit(lambda p, batch, k: model.loss(p, batch, k)[0])
    l_raw = float(loss_fn(params, b, key))
    l_wire = float(loss_fn(params, compress_batch(b, esm_bf16=False), key))
    assert l_raw == l_wire
