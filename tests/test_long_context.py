"""Long-context support (round 2, docs/ROADMAP.md #3): query-chunked
attention (`ops/chunked_attention.py`) and the 768/1024 bucket rungs.

The chunked path must be numerically IDENTICAL to the einsum reference
(same contraction order and accumulation dtypes), not merely close —
it is a memory layout change, not an approximation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from protein_redesign_tpu.ops.chunked_attention import chunked_attention
from protein_redesign_tpu.ops.pallas_attention import _attention_reference


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _flat_reference(q, k, v, mask, bias, scale, fast_softmax=False):
    """Flatten leading dims the way attention_core does and run the
    einsum reference."""
    lead = q.shape[:-3]
    N, H, C = q.shape[-3:]
    R = int(np.prod(lead)) if lead else 1
    qf, kf, vf = (x.reshape((R, N, H, C)) for x in (q, k, v))
    maskf = (
        None if mask is None
        else jnp.broadcast_to(mask, lead + (N,)).reshape((R, N))
    )
    biasf = (
        None if bias is None
        else jnp.broadcast_to(bias, lead + (H, N, N)).reshape((R, H, N, N))
    )
    out = _attention_reference(qf, kf, vf, maskf, biasf, scale, fast_softmax)
    return out.reshape(lead + (N, H, C))


@pytest.mark.parametrize("chunk", [4, 8, 16])
def test_chunked_matches_reference(chunk):
    B, N, H, C = 2, 16, 3, 5
    q, k, v = _rand((B, N, H, C), 0), _rand((B, N, H, C), 1), _rand((B, N, H, C), 2)
    mask = (jax.random.uniform(jax.random.PRNGKey(3), (B, N)) > 0.3).astype(jnp.float32)
    bias = _rand((B, H, N, N), 4)
    got = chunked_attention(q, k, v, mask, bias, 0.7, chunk)
    want = _flat_reference(q, k, v, mask, bias, 0.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_chunked_triangle_layout_bias_not_row_broadcast():
    """Triangle-attention layout: lead dims (B, rows), bias [B, H, N, N]
    shared across rows — the chunked path must broadcast it correctly
    WITHOUT materializing the row axis."""
    B, R, N, H, C = 1, 6, 8, 2, 4
    q, k, v = (_rand((B, R, N, H, C), s) for s in (0, 1, 2))
    mask = (jax.random.uniform(jax.random.PRNGKey(3), (B, R, N)) > 0.2).astype(jnp.float32)
    bias = _rand((B, 1, H, N, N), 4)  # broadcast over rows
    got = chunked_attention(q, k, v, mask, bias, 0.5, 4)
    want = _flat_reference(q, k, v, mask, bias, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_chunked_no_mask_no_bias_and_full_chunk():
    N, H, C = 12, 2, 4
    q, k, v = (_rand((N, H, C), s) for s in (5, 6, 7))
    got = chunked_attention(q, k, v, None, None, 1.0, 12)  # chunk == N
    want = _flat_reference(q, k, v, None, None, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_chunked_gradients_match():
    B, N, H, C = 1, 8, 2, 4
    q, k, v = (_rand((B, N, H, C), s) for s in (0, 1, 2))
    bias = _rand((B, H, N, N), 3)

    def loss_chunked(q, k, v, b):
        return jnp.sum(chunked_attention(q, k, v, None, b, 0.5, 4) ** 2)

    def loss_ref(q, k, v, b):
        return jnp.sum(_flat_reference(q, k, v, None, b, 0.5) ** 2)

    gc = jax.grad(loss_chunked, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_invalid_chunk_raises():
    q = _rand((4, 2, 3), 0)
    with pytest.raises(ValueError, match="attn_chunk"):
        chunked_attention(q, q, q, None, None, 1.0, 3)  # 3 does not divide 4
    with pytest.raises(ValueError, match="attn_chunk"):
        chunked_attention(q, q, q, None, None, 1.0, 8)  # > N


def test_model_forward_matches_with_attn_chunk():
    """Full tiny-model forward: attn_chunk must not change outputs."""
    from __graft_entry__ import _make_batch
    from protein_redesign_tpu.config import ModelConfig
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

    base = ModelConfig(
        esm_dim=8, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
        head_dim=4, num_heads=2, num_blocks=1, num_steps=4,
        dtype="float32", remat=False,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in _make_batch(4, 12, 16, esm_dim=8).items()
    }
    model = ProteinReDiffModel(base.replace(training_mode=False))
    params = model.init_params(jax.random.PRNGKey(0), batch)
    rng = np.random.RandomState(3)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(x.dtype),
        params,
    )
    key = jax.random.PRNGKey(7)
    pos_a, seq_a = model.sample(params, batch, key, mask_prob=0.5)
    chunked = ProteinReDiffModel(
        base.replace(training_mode=False, attn_chunk=8)
    )
    pos_b, seq_b = chunked.sample(params, batch, key, mask_prob=0.5)
    np.testing.assert_allclose(
        np.asarray(pos_a), np.asarray(pos_b), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(seq_a), np.asarray(seq_b), atol=2e-4, rtol=1e-4
    )


def test_bucket_ladder_long_rungs():
    from protein_redesign_tpu.config import DataConfig
    from protein_redesign_tpu.data.collate import pick_bucket

    ladder = DataConfig().buckets
    assert 768 in ladder and 1024 in ladder
    assert pick_bucket(513, ladder) == 768
    assert pick_bucket(769, ladder) == 1024
    assert pick_bucket(1025, ladder) == 2048  # K-chunked kernel rung
    with pytest.raises(ValueError, match="exceeds"):
        pick_bucket(2049, ladder)
    # Any power-of-two chunk <= 64 divides every rung.
    for b in ladder:
        assert b % 64 == 0 or b < 64 or b in (192, 384, 768)
        assert b % 32 == 0
