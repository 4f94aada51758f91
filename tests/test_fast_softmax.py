"""fast_softmax (bf16 attention probabilities) numeric sanity."""

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import NUM_CLASSES, ProteinReDiffModel

BASE = dict(
    esm_dim=16, time_dim=8, dist_dim=8, single_dim=32, pair_dim=16,
    head_dim=8, num_heads=2, num_blocks=2, num_steps=4, remat=False,
)


def test_fast_softmax_outputs_close():
    batch = {
        k: jnp.asarray(v)
        for k, v in _make_batch(4, 10, 16, esm_dim=16).items()
    }
    # Compare under bf16 compute (the intended serving dtype pairing).
    m_ref = ProteinReDiffModel(ModelConfig(**BASE, dtype="bfloat16"))
    m_fast = ProteinReDiffModel(
        ModelConfig(**BASE, dtype="bfloat16", fast_softmax=True)
    )
    params = m_ref.init_params(jax.random.PRNGKey(0), batch)
    B, N = batch["residue_mask"].shape
    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (B, N, 3))
    seq = jax.random.normal(jax.random.fold_in(key, 1), (B, N, NUM_CLASSES))
    mask = batch["atom_mask"] + batch["residue_mask"]
    t = jnp.full((B,), 2, jnp.int32)
    out_ref = m_ref.apply(params, batch, z, seq, mask, t)
    out_fast = m_fast.apply(params, batch, z, seq, mask, t)
    # bf16 probs introduce ~1e-2 relative deviation, not more.
    ref0 = np.asarray(out_ref[0], np.float32)
    fast0 = np.asarray(out_fast[0], np.float32)
    denom = np.abs(ref0).max() + 1e-6
    assert np.abs(ref0 - fast0).max() / denom < 0.05
    ref1 = np.asarray(out_ref[1], np.float32)
    fast1 = np.asarray(out_fast[1], np.float32)
    denom = np.abs(ref1).max() + 1e-6
    assert np.abs(ref1 - fast1).max() / denom < 0.05
