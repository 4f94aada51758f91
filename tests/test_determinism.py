"""Reproducibility: identical keys give identical samples; profiler hook."""

import numpy as np

import jax

from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

TINY = ModelConfig(
    esm_dim=16, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
    head_dim=4, num_heads=2, num_blocks=1, num_steps=3,
    dtype="float32", remat=False,
)


def test_sampling_deterministic_under_key():
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch

    model = ProteinReDiffModel(TINY)
    batch = {
        k: jnp.asarray(v)
        for k, v in _make_batch(4, 8, 16, esm_dim=16).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    sample = jax.jit(lambda p, b, k: model.sample(p, b, k, mask_prob=0.3))
    pos1, seq1 = sample(params, batch, jax.random.PRNGKey(7))
    pos2, seq2 = sample(params, batch, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(pos1), np.asarray(pos2))
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq2))
    pos3, _ = sample(params, batch, jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(pos1), np.asarray(pos3))


def test_profiler_trace_capture(tmp_path):
    from protein_redesign_tpu.utils.logging import maybe_profile

    with maybe_profile(tmp_path, True):
        import jax.numpy as jnp

        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert (tmp_path / "profile").exists()
