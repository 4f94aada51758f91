"""Masked-position recovery support: the evaluation side reconstructs the
redesigned positions from the sampling key, so the key-split contract
between ``ProteinReDiffModel.inference_extra_mask`` and every sampler must
hold exactly."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

TINY = ModelConfig(
    single_dim=16, pair_dim=8, num_blocks=1, head_dim=4, num_heads=2,
    esm_dim=8, time_dim=8, dist_dim=8, num_steps=4, dtype="float32",
    remat=False, mask_prob=0.4,
)


def _featurized(seed=0):
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data

    rng = np.random.RandomState(seed)
    mol = update_mol_positions(
        mol_from_smiles("CCO"), rng.randn(3, 3).astype(np.float32)
    )
    prot = protein_from_sequence("ACDEFGHIKLMN")
    prot.atom_pos[:, 1] = rng.randn(12, 3)
    return {
        **ligand_to_data(mol),
        **protein_to_data(
            prot,
            residue_esm=rng.randn(12, 8).astype(np.float32),
            esm_dim=8,
        ),
    }


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "ddim_parallel"])
def test_sampler_mask_key_contract(monkeypatch, sampler):
    """Every sampler must hand split(key, 4)[0] to prepare_batch's
    random_mask — the assumption inference_extra_mask (and the
    benchmarks' masked-recovery reconstruction) is built on."""
    from protein_redesign_tpu.data.collate import collate_fn, numeric_batch
    import protein_redesign_tpu.models.prdiff as prdiff_mod
    from protein_redesign_tpu.models.masking import random_mask

    model = ProteinReDiffModel(TINY)
    batch = numeric_batch(collate_fn([_featurized()], buckets=(16,)))
    params = model.init_params(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(42)

    recorded = []

    def recording_mask(k, residue_mask, p):
        recorded.append((np.asarray(k), np.asarray(p)))
        return random_mask(k, residue_mask, p)

    monkeypatch.setattr(prdiff_mod, "random_mask", recording_mask)
    if sampler == "ddpm":
        model.sample(params, batch, key, mask_prob=0.3)
    elif sampler == "ddim":
        model.sample_ddim(params, batch, key, ddim_steps=2, mask_prob=0.3)
    else:
        from protein_redesign_tpu.models.paratime import sample_ddim_parallel

        sample_ddim_parallel(
            model, params, batch, key, ddim_steps=3, window=2, mask_prob=0.3
        )
    assert len(recorded) == 1
    k_used, p_used = recorded[0]
    np.testing.assert_array_equal(k_used, np.asarray(jax.random.split(key, 4)[0]))
    assert float(p_used) == pytest.approx(0.3)

    # And the helper reproduces the very same mask.
    extra, inv = model.inference_extra_mask(
        key, jnp.asarray(batch["residue_mask"]), 0.3
    )
    extra2, inv2 = random_mask(
        jax.random.split(key, 4)[0],
        jnp.asarray(batch["residue_mask"]),
        jnp.asarray(0.3, jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(inv), np.asarray(inv2))
    np.testing.assert_array_equal(np.asarray(extra), np.asarray(extra2))


def test_redesigned_positions_roundtrip():
    """benchmarks/synth_common._redesigned_positions reproduces a valid
    per-design mask for the runner's actual draw: masked positions lie on
    real residues and roughly match the requested fraction."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    )
    from synth_common import _redesigned_positions

    from protein_redesign_tpu.cli.common import SamplingRunner

    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    data = _featurized()
    batch_like = data
    from protein_redesign_tpu.data.collate import collate_fn, numeric_batch

    b = numeric_batch(collate_fn([batch_like], buckets=(16,)))
    params = model.init_params(jax.random.PRNGKey(0), b)
    runner = SamplingRunner(
        model, params, buckets=(16,), batch_size=4, mask_prob=0.5
    )
    key = jax.random.PRNGKey(7)
    masked = _redesigned_positions(runner, data, 4, key)
    assert masked.shape == (4, 12)
    frac = masked.mean()
    assert 0.1 <= frac <= 0.6  # ~0.5 requested over the flattened batch
