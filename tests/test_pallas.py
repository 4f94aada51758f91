"""Pallas fused-attention kernel: numerics vs the einsum fallback
(interpret mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import NUM_CLASSES, ProteinReDiffModel
from protein_redesign_tpu.ops.pallas_attention import (
    _attention_reference,
    fused_attention,
)

TINY = dict(
    esm_dim=16, time_dim=8, dist_dim=8, single_dim=32, pair_dim=16,
    head_dim=8, num_heads=2, num_blocks=1, num_steps=4,
    dtype="float32", remat=False,
)


def rand_qkv(R=3, N=16, H=2, C=8, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(R, N, H, C), jnp.float32)  # noqa
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(
        (rng.rand(R, N) > 0.2).astype(np.float32)
    )
    bias = jnp.asarray(rng.randn(R, H, N, N), jnp.float32)
    return q, k, v, mask, bias


class TestFusedAttention:
    @pytest.mark.parametrize("with_mask", [True, False])
    @pytest.mark.parametrize("with_bias", [True, False])
    def test_matches_reference(self, with_mask, with_bias):
        q, k, v, mask, bias = rand_qkv()
        m = mask if with_mask else None
        b = bias if with_bias else None
        ref = _attention_reference(q, k, v, m, b, scale=0.35)
        out = fused_attention(q, k, v, m, b, 0.35, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_grad_flows(self):
        q, k, v, mask, bias = rand_qkv()

        def f(q, k, v, bias):
            return jnp.sum(fused_attention(q, k, v, mask, bias, 0.35, True))

        def f_ref(q, k, v, bias):
            return jnp.sum(_attention_reference(q, k, v, mask, bias, 0.35))

        grads = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
        grads_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for g, gr in zip(grads, grads_ref):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(gr), atol=1e-4, rtol=1e-4
            )


class TestModelWithPallas:
    def test_forward_matches_einsum_path(self):
        from __graft_entry__ import _make_batch

        batch_np = _make_batch(4, 8, 16, esm_dim=16)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        m_plain = ProteinReDiffModel(ModelConfig(**TINY))
        m_pallas = ProteinReDiffModel(
            ModelConfig(**{**TINY, "use_pallas": True})
        )
        params = m_plain.init_params(jax.random.PRNGKey(0), batch)
        B, N = batch["residue_mask"].shape
        key = jax.random.PRNGKey(1)
        z = jax.random.normal(key, (B, N, 3))
        seq = jnp.zeros((B, N, NUM_CLASSES))
        mask = batch["atom_mask"] + batch["residue_mask"]
        t = jnp.full((B,), 2, jnp.int32)
        out1 = m_plain.apply(params, batch, z, seq, mask, t)
        out2 = m_pallas.apply(params, batch, z, seq, mask, t)
        np.testing.assert_allclose(
            np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out1[1]), np.asarray(out2[1]), atol=1e-4, rtol=1e-4
        )
