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


class TestFastSoftmaxKernel:
    """cfg.fast_softmax inside the FULL-KEY rows kernel: bf16 softmax
    with f32 MXU logits accumulation (serving lever — halves the
    per-row [N, N] VMEM and packs the VPU exp/sum). Inference-only;
    K-chunked regimes and all backward kernels keep f32 state."""

    def test_close_to_f32_reference(self):
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True, False, True)
        assert np.isfinite(np.asarray(out)).all()
        # bf16 probs: ~3 decimal digits; unit-scale inputs.
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2
        )

    def test_fully_masked_row_stays_uniform_and_finite(self):
        q, k, v, mask, _ = rand_qkv(R=2, N=32, H=1, C=8)
        mask = mask.at[0].set(0.0)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True, False, True)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2
        )

    def test_off_path_is_bit_identical(self):
        """fast_softmax=False must not change the existing kernel."""
        q, k, v, mask, _ = rand_qkv(R=4, N=16, H=2, C=8)
        a = fused_attention(q, k, v, mask, None, 0.35, True, False, False)
        b = fused_attention(q, k, v, mask, None, 0.35, True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_kchunk_regime_ignores_fast_flag(self, monkeypatch):
        """The online-softmax kernels keep their f32 running max/sum —
        with fast on they must still match the f32 reference tightly."""
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 8)
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True, False, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_attention_core_plumbs_flag(self):
        """attention_core(use_pallas=True, fast_softmax=True) reaches the
        kernel (bf16-close to the f32 XLA path, not bit-equal)."""
        from protein_redesign_tpu.models.layers import attention_core

        q, k, v, mask, _ = rand_qkv(R=2, N=24, H=2, C=8)
        xla_f32 = attention_core(q, k, v, mask, None, 0.35,
                                 use_pallas=False)
        fast = attention_core(q, k, v, mask, None, 0.35,
                              use_pallas=True, fast_softmax=True)
        assert np.isfinite(np.asarray(fast)).all()
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(xla_f32), atol=2e-2, rtol=2e-2
        )

    def test_training_kernel_bwd_drops_fast_flag(self):
        """Under kernel_bwd (the training path) the vjp forward must run
        f32 softmax even with fast_softmax on — consistent with the
        flash backward's f32 probs recompute. Output and grads match
        the f32 kernel path bit-for-bit."""
        q, k, v, mask, _ = rand_qkv(R=2, N=16, H=1, C=8)

        def loss(fast):
            def f(a, b, c):
                return jnp.sum(jnp.cos(fused_attention(
                    a, b, c, mask, None, 0.35, True, True, fast
                )))
            return f

        out_fast, g_fast = jax.value_and_grad(loss(True), argnums=(0, 1, 2))(
            q, k, v
        )
        out_f32, g_f32 = jax.value_and_grad(loss(False), argnums=(0, 1, 2))(
            q, k, v
        )
        np.testing.assert_array_equal(np.asarray(out_fast),
                                      np.asarray(out_f32))
        for a, b in zip(g_fast, g_f32):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grad_through_fast_forward_uses_f32_vjp(self):
        """Differentiating the fast forward falls to the einsum VJP
        (f32): grads match the reference VJP exactly — the fast flag
        must not leak into the backward."""
        q, k, v, mask, _ = rand_qkv(R=2, N=16, H=1, C=8)

        def f(a, b, c):
            return jnp.sum(
                fused_attention(a, b, c, mask, None, 0.35, True, False,
                                True)
            )

        def f_ref(a, b, c):
            return jnp.sum(_attention_reference(a, b, c, mask, None, 0.35))

        with pytest.warns(UserWarning, match="einsum-VJP"):
            g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
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


class TestModelTrainGradsWithKernelBwd:
    def test_loss_grads_match_xla(self):
        """Whole-model training gradients with the kernel + flash
        backward (use_pallas + use_pallas_bwd) vs the plain XLA path —
        the end-to-end correctness proof for `--use_pallas_bwd`
        training."""
        from __graft_entry__ import _make_batch

        batch_np = _make_batch(4, 8, 16, esm_dim=16)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        base = {**TINY, "training_mode": True}
        m_plain = ProteinReDiffModel(ModelConfig(**base))
        m_kern = ProteinReDiffModel(ModelConfig(
            **{**base, "use_pallas": True, "use_pallas_bwd": True}
        ))
        params = m_plain.init_params(jax.random.PRNGKey(0), batch)
        key = jax.random.PRNGKey(7)

        def loss_fn(model):
            return lambda p: model.loss(p, batch, key)[0]

        g_plain = jax.grad(loss_fn(m_plain))(params)
        g_kern = jax.grad(loss_fn(m_kern))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_plain),
            jax.tree_util.tree_leaves(g_kern),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3
            )


class TestKChunkedRowsKernel:
    """Online-softmax K-chunked rows kernel (VMEM O(N*KC) at any N —
    the full-key variant's [N,N] logits fail to compile at N=1024)."""

    def test_matches_reference(self, monkeypatch):
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 8)
        monkeypatch.setattr(pa, "_KCHUNK_GRID", False)  # fori variant
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_fully_masked_row_uniform(self, monkeypatch):
        """All-masked key rows: reference semantics are a constant
        NEG_INF logit row -> uniform probs; the online softmax must
        reproduce that, not NaN."""
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 8)
        monkeypatch.setattr(pa, "_KCHUNK_GRID", False)
        q, k, v, mask, _ = rand_qkv(R=2, N=32, H=1, C=8)
        mask = mask.at[0].set(0.0)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_grid_variant_matches_reference(self, monkeypatch):
        """The grid-dimension K-chunked kernel (the default; carries in
        VMEM scratch across a sequential k-chunk grid axis): numerics
        must match, including fully-masked rows."""
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 8)
        monkeypatch.setattr(pa, "_KCHUNK_GRID", True)
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        mask = mask.at[1].set(0.0)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_grid_cn_layout_matches_reference(self, monkeypatch):
        """The CN-layout grid kernel (operands/output [R,H,C,N], the
        default: unpadded HBM buffers where the NC-minor layout is
        lane-padded 8x and OOMs at N=2048): numerics must match the
        reference, including fully-masked rows."""
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 8)
        monkeypatch.setattr(pa, "_KCHUNK_GRID", True)
        monkeypatch.setattr(pa, "_KCHUNK_CN", True)
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        mask = mask.at[1].set(0.0)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_grid_nc_layout_still_works(self, monkeypatch):
        """PRD_KCHUNK_CN=0 keeps the original NC-layout grid kernel
        selectable (benchmark sweeps)."""
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 8)
        monkeypatch.setattr(pa, "_KCHUNK_GRID", True)
        monkeypatch.setattr(pa, "_KCHUNK_CN", False)
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_knob_overrides(self, monkeypatch):
        """The sweep knobs (PRD_KCHUNK / PRD_KCHUNK_RB, read ONCE at
        import into module constants — process-lifetime settings)
        override the chunk target and row-block cap without changing
        the numerics."""
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 16)
        monkeypatch.setattr(pa, "_KCHUNK_RB_CAP", 1)
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_explicit_bad_chunk_raises(self, monkeypatch):
        """An explicit PRD_KCHUNK whose /2/4/8 ladder has no divisor of
        N must raise, not silently fall back to the full-key kernel
        (the configuration documented to fail TPU compilation at
        N >= 2048)."""
        import pytest

        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_ENV", "48")
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 48)
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        with pytest.raises(ValueError, match="PRD_KCHUNK"):
            fused_attention(q, k, v, mask, None, 0.35, True)


class TestRowsKernelBackward:
    """Flash-style Pallas backward for the no-bias rows case
    (kernel_bwd=True, cfg.use_pallas_bwd): gradients must match the
    einsum-reference VJP, including the autodiff `where`-filter
    semantics at fully-masked rows."""

    def _grads(self, q, k, v, mask, kernel_bwd):
        # cos() makes the cotangent non-constant, catching transpose and
        # scale-chain mistakes an all-ones cotangent would mask.
        def f(q, k, v):
            out = fused_attention(
                q, k, v, mask, None, 0.35, True, kernel_bwd
            )
            return jnp.sum(jnp.cos(out))

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    def test_grads_match_einsum_vjp(self):
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        g_kern = self._grads(q, k, v, mask, True)
        g_ref = self._grads(q, k, v, mask, False)
        for a, b in zip(g_kern, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )

    def test_fully_masked_row_grads(self):
        """A fully-masked row: uniform probs still feed dv (reference
        semantics) but dq/dk must be exactly zero for that row (the
        autodiff `where` filter)."""
        q, k, v, mask, _ = rand_qkv(R=2, N=16, H=1, C=8)
        mask = mask.at[0].set(0.0)
        g_kern = self._grads(q, k, v, mask, True)
        g_ref = self._grads(q, k, v, mask, False)
        for a, b in zip(g_kern, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )
        np.testing.assert_array_equal(np.asarray(g_kern[0][0]), 0.0)
        np.testing.assert_array_equal(np.asarray(g_kern[1][0]), 0.0)

    def test_einsum_vjp_fallback_warns(self):
        """Differentiating the kernel forward WITHOUT the flash backward
        (an inference-mode model under jax.grad) re-materializes the
        logits via the einsum VJP — it must warn, not stay silent
        (VERDICT r2 weak #3)."""
        import warnings

        q, k, v, mask, _ = rand_qkv(R=2, N=16, H=1, C=8)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            self._grads(q, k, v, mask, False)
        assert any("einsum-VJP backward" in str(w.message) for w in rec)
        # The flash-backward path must NOT warn.
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            self._grads(q, k, v, mask, True)
        assert not any(
            "einsum-VJP backward" in str(w.message) for w in rec
        )

    def test_module_grads_match(self):
        """GatedAttention (triangle-attention shape) with
        use_pallas + kernel_bwd vs the XLA path: parameter gradients."""
        from protein_redesign_tpu.models.layers import GatedAttention

        rng = np.random.RandomState(11)
        B, N, D = 2, 16, 12
        x = jnp.asarray(rng.randn(B, N, N, D), jnp.float32)
        mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))
        mask2d = mask[:, :, None] * mask[:, None, :]
        ref_mod = GatedAttention(8, 2, use_pallas=False, dtype=jnp.float32)
        pal_mod = GatedAttention(
            8, 2, use_pallas=True, kernel_bwd=True, dtype=jnp.float32
        )
        params = ref_mod.init(jax.random.PRNGKey(0), x, mask2d)["params"]

        def loss(mod):
            return lambda p: jnp.sum(
                jnp.square(mod.apply({"params": p}, x, mask2d))
            )

        g_ref = jax.grad(loss(ref_mod))(params)
        g_pal = jax.grad(loss(pal_mod))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3
            )


class TestKChunkedFlashBackward:
    """CN-layout K-chunked flash backward (the N >= kchunk-switch-point
    regime, where the full-key backward's per-row [N,N] f32 VMEM blocks
    and NC-minor HBM padding both stop fitting — the N=2048 training
    rung). Probs are recomputed per key chunk from a stats pass's lse;
    gradients must match the einsum-reference VJP."""

    def _patch(self, monkeypatch):
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 8)
        monkeypatch.setattr(pa, "_KCHUNK_GRID", True)
        monkeypatch.setattr(pa, "_KCHUNK_CN", True)
        return pa

    def _grads(self, q, k, v, mask, kernel_bwd):
        def f(q, k, v):
            out = fused_attention(
                q, k, v, mask, None, 0.35, True, kernel_bwd
            )
            return jnp.sum(jnp.cos(out))

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    def test_grads_match_einsum_vjp(self, monkeypatch):
        self._patch(monkeypatch)
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        g_kern = self._grads(q, k, v, mask, True)
        g_ref = self._grads(q, k, v, mask, False)
        for a, b in zip(g_kern, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )

    def test_fully_masked_row_grads(self, monkeypatch):
        """A fully-masked row: uniform probs still feed dv (reference
        semantics) but dq/dk must be exactly zero for that row (the
        autodiff `where` filter)."""
        self._patch(monkeypatch)
        q, k, v, mask, _ = rand_qkv(R=2, N=32, H=1, C=8)
        mask = mask.at[0].set(0.0)
        g_kern = self._grads(q, k, v, mask, True)
        g_ref = self._grads(q, k, v, mask, False)
        for a, b in zip(g_kern, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )
        np.testing.assert_array_equal(np.asarray(g_kern[0][0]), 0.0)
        np.testing.assert_array_equal(np.asarray(g_kern[1][0]), 0.0)

    def test_dispatches_to_kchunk_bwd(self, monkeypatch):
        """The rows backward mirrors the forward's regime split: at
        N >= the switch point it must take the CN K-chunked backward,
        below it the full-key kernel."""
        pa = self._patch(monkeypatch)
        calls = []
        orig = pa._kchunk_grid_cn_grads_call

        def spy(*args, **kw):
            calls.append(args[0].shape)
            return orig(*args, **kw)

        # The gradient pallas_call is common to both K-chunked backward
        # entries (stats-recompute fallback AND the forward-stashed-stats
        # path the training default takes).
        monkeypatch.setattr(pa, "_kchunk_grid_cn_grads_call", spy)
        q, k, v, mask, _ = rand_qkv(R=2, N=32, H=1, C=8)
        self._grads(q, k, v, mask, True)
        assert calls  # N=32 >= patched switch point -> K-chunked bwd
        calls.clear()
        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 64)
        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N_F32", 64)
        self._grads(q, k, v, mask, True)
        assert calls == []  # below it -> full-key backward

    def test_bf16_grads_close(self, monkeypatch):
        """bf16 operands (the training compute dtype) through the
        K-chunked backward vs the einsum VJP at bf16 tolerance."""
        self._patch(monkeypatch)
        q, k, v, mask, _ = rand_qkv(R=2, N=32, H=2, C=8)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        g_kern = self._grads(q, k, v, mask, True)
        g_ref = self._grads(q, k, v, mask, False)
        for a, b in zip(g_kern, g_ref):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=2e-2, rtol=2e-2,
            )

    def test_fwd_stats_residuals_skip_recompute(self, monkeypatch):
        """In the K-chunked training regime the custom-vjp forward must
        take the stats-emitting kernel (residuals: out, m, log s) and
        the backward must NOT run the stats-recompute pass — one full
        forward per grad step saved. Inference (kernel_bwd off) keeps
        the plain forward."""
        pa = self._patch(monkeypatch)
        stats_fwd, stats_recompute = [], []
        orig_fwd = pa._rows_attention_fwd_stats
        orig_stats = pa._kchunk_grid_cn_stats_call

        def spy_fwd(*a, **kw):
            stats_fwd.append(a[0].shape)
            return orig_fwd(*a, **kw)

        def spy_stats(*a, **kw):
            stats_recompute.append(a[0].shape)
            return orig_stats(*a, **kw)

        monkeypatch.setattr(pa, "_rows_attention_fwd_stats", spy_fwd)
        q, k, v, mask, _ = rand_qkv(R=2, N=32, H=1, C=8)
        self._grads(q, k, v, mask, True)
        assert stats_fwd  # training grad -> stats-emitting forward
        # The backward's stats recompute must be skipped: spy the stats
        # pallas_call and differentiate again (the fwd spy now delegates
        # to the original, which calls the stats call ONCE — from _fwd).
        monkeypatch.setattr(pa, "_kchunk_grid_cn_stats_call", spy_stats)
        stats_fwd.clear()
        self._grads(q, k, v, mask, True)
        assert len(stats_fwd) == 1
        assert len(stats_recompute) == 1  # fwd only, not fwd + recompute
        # Inference forward (no grad, kernel_bwd False): plain kernel.
        stats_fwd.clear()
        fused_attention(q, k, v, mask, None, 0.35, True, False)
        assert stats_fwd == []


class TestShardedKernels:
    """custom_partitioning wrappers: the attention kernels shard over
    their rows axis under a mesh (each device runs the kernel on its
    local shard) — what lets mesh inference/training keep the kernel
    paths instead of falling back to XLA."""

    def _mesh(self, n=8):
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < n:
            pytest.skip(f"need {n} devices")
        return Mesh(np.array(devs[:n]), ("data",))

    def _sharded(self, mesh, *arrays):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("data"))
        return sh, tuple(jax.device_put(x, sh) for x in arrays)

    def test_rows_fwd_sharded_matches(self):
        mesh = self._mesh()
        q, k, v, mask, _ = rand_qkv(R=16, N=16, H=2, C=8)
        ref = fused_attention(q, k, v, mask, None, 0.35, True)
        sh, (qs, ks, vs, ms) = self._sharded(mesh, q, k, v, mask)
        f = jax.jit(
            lambda a, b, c, d: fused_attention(a, b, c, d, None, 0.35, True),
            in_shardings=(sh, sh, sh, sh), out_shardings=sh,
        )
        np.testing.assert_array_equal(
            np.asarray(f(qs, ks, vs, ms)), np.asarray(ref)
        )

    def test_rows_bwd_sharded_matches(self):
        mesh = self._mesh()
        q, k, v, mask, _ = rand_qkv(R=16, N=16, H=2, C=8)

        def loss(a, b, c):
            out = fused_attention(a, b, c, mask, None, 0.35, True, True)
            return jnp.sum(jnp.cos(out))

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        sh, (qs, ks, vs) = self._sharded(mesh, q, k, v)

        def loss_sh(a, b, c, m):
            out = fused_attention(a, b, c, m, None, 0.35, True, True)
            return jnp.sum(jnp.cos(out))

        g_sh = jax.jit(
            jax.grad(loss_sh, argnums=(0, 1, 2)),
            in_shardings=(sh, sh, sh, sh),
        )(qs, ks, vs, jax.device_put(mask, sh))
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )

    def test_tiled_bias_sharded_matches(self):
        mesh = self._mesh()
        q, k, v, mask, bias = rand_qkv(R=16, N=16, H=2, C=8)
        ref = fused_attention(q, k, v, mask, bias, 0.35, True)
        sh, (qs, ks, vs, ms, bs) = self._sharded(mesh, q, k, v, mask, bias)
        f = jax.jit(
            lambda a, b, c, d, e: fused_attention(a, b, c, d, e, 0.35, True),
            in_shardings=(sh,) * 5, out_shardings=sh,
        )
        np.testing.assert_array_equal(
            np.asarray(f(qs, ks, vs, ms, bs)), np.asarray(ref)
        )

    def test_mesh_train_step_with_kernel_matches(self):
        """Whole train step (kernel + flash bwd) under a 'data'-sharded
        (8,1) GSPMD mesh == the plain single-device step."""
        from __graft_entry__ import _make_batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        from protein_redesign_tpu.config import TrainConfig
        from protein_redesign_tpu.parallel.mesh import make_mesh, replicated
        from protein_redesign_tpu.parallel.train_step import (
            make_train_state,
            make_train_step,
        )

        if len(jax.devices()) < 8:
            pytest.skip("need 8 devices")
        cfg = ModelConfig(**{**TINY, "training_mode": True,
                             "use_pallas": True})
        model = ProteinReDiffModel(cfg)
        b_np = _make_batch(4, 8, 16, esm_dim=16)
        batch = {
            k: jnp.concatenate([jnp.asarray(v)] * 8, 0)
            for k, v in b_np.items()
        }
        tc = TrainConfig()
        state = make_train_state(model, tc, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, tc)
        _, m_plain = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

        mesh = make_mesh(jax.devices()[:8], (8, 1))
        st_sh = jax.tree_util.tree_map(lambda _: replicated(mesh), state)
        bsh = {k: NamedSharding(mesh, P("data")) for k in batch}
        step_sh = jax.jit(step, in_shardings=(st_sh, bsh, replicated(mesh)),
                          out_shardings=(st_sh, replicated(mesh)))
        _, m_mesh = step_sh(
            jax.device_put(state, st_sh), jax.device_put(batch, bsh),
            jax.random.PRNGKey(1),
        )
        np.testing.assert_allclose(
            float(m_mesh["loss"]), float(m_plain["loss"]),
            atol=1e-5, rtol=1e-5,
        )


class TestAutoPallasPolicy:
    """resolve_use_pallas: auto kernel selection at long-context inference
    (BASELINE.md long-context table: 2.05x over XLA at N=768)."""

    def test_resolution_rules(self):
        from protein_redesign_tpu.models.denoiser import (
            resolve_attention_plan,
        )

        cfg = ModelConfig(**TINY)  # pallas_auto_min_n default 384
        # Small buckets: plain XLA (kernel launch overhead dominates
        # through N=256 — paper-bucket sweep, BASELINE.md).
        assert resolve_attention_plan(cfg, 256) == (False, 0)
        # Inference at 384..1024: the kernel (1.15x..2.05x measured).
        assert resolve_attention_plan(cfg, 384) == (True, 0)
        assert resolve_attention_plan(cfg, 512) == (True, 0)
        assert resolve_attention_plan(cfg, 768) == (True, 0)
        assert resolve_attention_plan(cfg, 1024) == (True, 0)
        # The ladder's top rung: the CN-layout K-chunked grid kernel,
        # compile-proven and measured at N=2048 (1642.6 ms/step, 3.37x
        # over the chunk-128 fallback — BASELINE.md). Beyond the ladder:
        # chunked fallback (kernel unproven there).
        assert resolve_attention_plan(cfg, 2048) == (True, 0)
        assert resolve_attention_plan(cfg, 4096) == (False, 128)
        # Training DEFAULT (use_pallas_bwd on): the kernel with the
        # flash-style Pallas backward at narrow-head 384..2048 (measured
        # train-step wins 1.21x/1.48x at 384/512 and 1.90x/2.00x at
        # 768/1024; op-level at 2048 the CN K-chunked flash backward is
        # the ONLY compiling path — 302.3 ms/grad-step where the chunked
        # VJP fails, `r3_probes.py attnbwd`, BASELINE.md); chunked
        # attention keeps N>2048; plain XLA below 384.
        train_cfg = cfg.replace(training_mode=True)
        assert resolve_attention_plan(train_cfg, 256) == (False, 0)
        assert resolve_attention_plan(train_cfg, 384) == (True, 0)
        assert resolve_attention_plan(train_cfg, 512) == (True, 0)
        assert resolve_attention_plan(train_cfg, 768) == (True, 0)
        assert resolve_attention_plan(train_cfg, 1024) == (True, 0)
        assert resolve_attention_plan(train_cfg, 2048) == (True, 0)
        assert resolve_attention_plan(train_cfg, 4096) == (False, 128)
        # Opt-out restores the round-1 behavior: plain XLA below 768
        # (unchunked fits), chunked from there up (per-chunk remat) —
        # the einsum-VJP backward re-materializes the logits, so the
        # kernel is never auto-selected for training without the flash
        # backward.
        train_nok = train_cfg.replace(use_pallas_bwd=False)
        assert resolve_attention_plan(train_nok, 512) == (False, 0)
        assert resolve_attention_plan(train_nok, 768) == (False, 128)
        # Wide heads (C >= 64) JOIN the kernel plan in round 4 at the
        # measured sizes (r4_probes stepkern: train 1.08x at 384, 1.23x
        # at 512); 768+ keeps the measured XLA/chunked plans. All the
        # backing numbers are SINGLE-head (h64x1), so multi-head wide
        # configs keep XLA until measured (advisor r4).
        assert resolve_attention_plan(
            train_cfg.replace(head_dim=64, num_heads=1), 384
        ) == (True, 0)
        assert resolve_attention_plan(
            train_cfg.replace(head_dim=64, num_heads=1), 512
        ) == (True, 0)
        # Round-5 widelong rungs: the C=64 kernel wins 768/1024 too
        # (train-remat 1.60x at 768; fwd 1.33x/1.46x) — gate extended
        # to 1024 inclusive; 2048 keeps the measured chunked plan.
        assert resolve_attention_plan(
            train_cfg.replace(head_dim=64, num_heads=1), 768
        ) == (True, 0)
        assert resolve_attention_plan(
            train_cfg.replace(head_dim=64, num_heads=1), 1024
        ) == (True, 0)
        assert resolve_attention_plan(
            train_cfg.replace(head_dim=64, num_heads=1), 2048
        ) == (False, 128)
        assert resolve_attention_plan(
            train_cfg.replace(head_dim=64, num_heads=1,
                              use_pallas_bwd=False), 512
        ) == (False, 0)
        # h64x4 (round-5 widemh cell): kernel train 1.25x at 384, and
        # at 512 the XLA no-remat train step fails to compile where the
        # kernel runs — multi-head wide engages at the measured
        # 384..512; 768+ stays on the fallback plans (unmeasured).
        assert resolve_attention_plan(
            train_cfg.replace(head_dim=64, num_heads=4), 512
        ) == (True, 0)
        assert resolve_attention_plan(
            train_cfg.replace(head_dim=64, num_heads=4), 768
        ) == (False, 128)
        # Sequence-parallel keeps its non-kernel plan in training.
        assert resolve_attention_plan(
            train_cfg.replace(sequence_parallel=True), 512
        ) == (False, 0)
        # GSPMD-sharded pair axis cannot repartition the kernel.
        assert resolve_attention_plan(
            cfg.replace(sequence_parallel=True), 768
        ) == (False, 128)
        assert resolve_attention_plan(
            cfg.replace(sequence_parallel=True), 512
        ) == (False, 0)
        # Wide-head INFERENCE: ties XLA at 384 (13.27 vs 13.12 ms whole
        # fwd — stays XLA) and wins from 512 (28.15 vs 31.91 ms, r4
        # stepkern probe). Intermediate head dims (32..63) are unmeasured
        # and keep XLA. With ONE head the unchunked logits stay small
        # enough that plain XLA also beats chunked at 1024 (263 vs
        # 293 ms), so no chunk fallback until the ~4 GB logits heuristic.
        assert resolve_attention_plan(
            cfg.replace(head_dim=64, num_heads=1), 384
        ) == (False, 0)
        assert resolve_attention_plan(
            cfg.replace(head_dim=64, num_heads=1), 512
        ) == (True, 0)
        assert resolve_attention_plan(
            cfg.replace(head_dim=32), 512
        ) == (False, 0)
        # Multi-head wide inference (widemh): kernel 1.19x at 384 and
        # 1.49x at 512 — joins at both measured sizes.
        assert resolve_attention_plan(
            cfg.replace(head_dim=64, num_heads=4), 384
        ) == (True, 0)
        assert resolve_attention_plan(
            cfg.replace(head_dim=64, num_heads=4), 512
        ) == (True, 0)
        # Under the bf16 pair stream, wide-head inference joins at 384
        # (12.35 -> 11.77 ms whole-fwd, r4 bf16pair probe).
        assert resolve_attention_plan(
            cfg.replace(head_dim=64, num_heads=1, pair_stream_bf16=True),
            384
        ) == (True, 0)
        h64 = cfg.replace(head_dim=64, num_heads=1, dtype="bfloat16")
        # Round-5: wide-head INFERENCE kernel extends through 1024
        # (fwd 1.33x/1.46x at 768/1024, widelong rungs).
        assert resolve_attention_plan(h64, 768) == (True, 0)
        assert resolve_attention_plan(h64, 1024) == (True, 0)
        assert resolve_attention_plan(h64, 2048) == (False, 128)
        # TINY is f32 with 2 heads: 1024^3 * 2 heads * 4 B = 8.6 GB >
        # 4 GB -> chunked fallback, matching the narrow-head case.
        assert resolve_attention_plan(
            cfg.replace(head_dim=64), 1024
        ) == (False, 128)
        # Explicit opt-ins win everywhere.
        assert resolve_attention_plan(
            cfg.replace(use_pallas=True), 64
        ) == (True, 0)
        assert resolve_attention_plan(
            cfg.replace(attn_chunk=64), 768
        ) == (False, 64)
        # 0 disables the auto plan entirely.
        assert resolve_attention_plan(
            cfg.replace(pallas_auto_min_n=0), 4096
        ) == (False, 0)
        # Non-128-divisible long sizes: the narrow-head kernel takes it
        # (no chunk-divisibility requirement), matching inference.
        assert resolve_attention_plan(
            cfg.replace(training_mode=True), 800
        ) == (True, 0)
        # Without the flash backward there is no kernel for training and
        # no silent chunk either (must be explicit).
        assert resolve_attention_plan(
            cfg.replace(training_mode=True, use_pallas_bwd=False), 800
        ) == (False, 0)

    def test_auto_forward_matches_einsum_path(self):
        """With the threshold lowered to the tiny bucket, the auto path
        must produce the einsum path's numerics (interpret mode on CPU)."""
        from __graft_entry__ import _make_batch

        batch_np = _make_batch(4, 8, 16, esm_dim=16)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        m_plain = ProteinReDiffModel(
            ModelConfig(**{**TINY, "pallas_auto_min_n": 0})
        )
        m_auto = ProteinReDiffModel(
            ModelConfig(**{**TINY, "pallas_auto_min_n": 16})
        )
        params = m_plain.init_params(jax.random.PRNGKey(0), batch)
        B, N = batch["residue_mask"].shape
        z = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
        seq = jnp.zeros((B, N, NUM_CLASSES))
        mask = batch["atom_mask"] + batch["residue_mask"]
        t = jnp.full((B,), 2, jnp.int32)
        out1 = m_plain.apply(params, batch, z, seq, mask, t)
        out2 = m_auto.apply(params, batch, z, seq, mask, t)
        np.testing.assert_allclose(
            np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out1[1]), np.asarray(out2[1]), atol=1e-4, rtol=1e-4
        )


class TestFusedTriangleMultiply:
    """Fused tri-mul kernel (ops/pallas_trimul.py) vs the module's XLA
    path: identical param tree, matching outputs, grads via custom_vjp."""

    def _setup(self, mode, B=2, N=16, D=8, seed=0):
        from protein_redesign_tpu.models.denoiser import TriangleMultiplication

        rng = np.random.RandomState(seed)
        pair = jnp.asarray(rng.randn(B, N, N, D), jnp.float32)
        mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))
        mask2d = mask[:, :, None] * mask[:, None, :]
        ref_mod = TriangleMultiplication(mode, use_pallas=False,
                                         dtype=jnp.float32)
        params = ref_mod.init(jax.random.PRNGKey(0), pair, mask2d)["params"]
        # Randomize zero-init 'final' weights so the output is nontrivial.
        params = jax.tree_util.tree_map(
            lambda x: x + 0.1 * rng.standard_normal(x.shape).astype(x.dtype),
            params,
        )
        pal_mod = TriangleMultiplication(mode, use_pallas=True,
                                         dtype=jnp.float32)
        return ref_mod, pal_mod, params, pair, mask2d

    @pytest.mark.parametrize("mode", ["outgoing", "incoming"])
    def test_matches_xla_path(self, mode):
        ref_mod, pal_mod, params, pair, mask2d = self._setup(mode)
        ref = ref_mod.apply({"params": params}, pair, mask2d)
        out = pal_mod.apply({"params": params}, pair, mask2d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5
        )

    @pytest.mark.parametrize("mode", ["outgoing", "incoming"])
    def test_param_tree_identical(self, mode):
        ref_mod, pal_mod, params, pair, mask2d = self._setup(mode)
        p2 = pal_mod.init(jax.random.PRNGKey(0), pair, mask2d)["params"]
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(p2)
        )
        for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(p2),
        ):
            assert ka == kb and va.shape == vb.shape

    def test_grad_matches_xla_path(self):
        """custom_vjp backward (reference-math vjp) == XLA path gradient."""
        ref_mod, pal_mod, params, pair, mask2d = self._setup("outgoing")

        def loss(mod):
            return lambda p: jnp.sum(
                jnp.square(mod.apply({"params": p}, pair, mask2d))
            )

        g_ref = jax.grad(loss(ref_mod))(params)
        g_pal = jax.grad(loss(pal_mod))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3
            )

    def test_multi_tile_grid(self):
        """N spanning several k/i tiles (tile=64 path) with batch > 1."""
        from protein_redesign_tpu.ops.pallas_trimul import (
            _reference_impl,
            fused_triangle_multiply,
        )

        rng = np.random.RandomState(3)
        B, N, D = 2, 128, 8
        pair = jnp.asarray(rng.randn(B, N, N, D), jnp.float32)
        mask = jnp.asarray((rng.rand(B, N) > 0.1).astype(np.float32))
        mask2d = mask[:, :, None] * mask[:, None, :]
        params = {
            "ab_gate_kernel": jnp.asarray(rng.randn(D, 2 * D) * 0.2, jnp.float32),
            "ab_gate_bias": jnp.ones((2 * D,), jnp.float32),
            "ab_proj_kernel": jnp.asarray(rng.randn(D, 2 * D) * 0.2, jnp.float32),
            "ab_proj_bias": jnp.zeros((2 * D,), jnp.float32),
            "out_gate_kernel": jnp.asarray(rng.randn(D, D) * 0.2, jnp.float32),
            "out_gate_bias": jnp.ones((D,), jnp.float32),
            "out_proj_kernel": jnp.asarray(rng.randn(D, D) * 0.2, jnp.float32),
            "out_proj_bias": jnp.zeros((D,), jnp.float32),
        }
        for mode in ("outgoing", "incoming"):
            out = fused_triangle_multiply(pair, mask2d, params, mode)
            ref = _reference_impl(pair, mask2d, params, mode)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5
            )


def test_denoiser_with_pallas_trimul_matches():
    """Full Denoiser forward with use_pallas_trimul on vs off (same params)."""
    from protein_redesign_tpu.models.denoiser import Denoiser

    cfg = ModelConfig(**TINY)
    rng = np.random.RandomState(5)
    B, N = 1, 16
    single = jnp.asarray(rng.randn(B, N, cfg.single_dim), jnp.float32)
    pair = jnp.asarray(rng.randn(B, N, N, cfg.pair_dim), jnp.float32)
    mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))

    base = Denoiser(cfg)
    params = base.init(jax.random.PRNGKey(0), single, pair, mask)["params"]
    s0, p0 = base.apply({"params": params}, single, pair, mask)
    fused = Denoiser(cfg.replace(use_pallas_trimul=True))
    s1, p1 = fused.apply({"params": params}, single, pair, mask)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=5e-5)


class TestFusedGatedAttentionModule:
    """GatedAttention's fully-fused path (round-2: LN + QKV/gate
    projections + softmax + gating + out-projection in ONE kernel for the
    no-bias triangle-attention case) vs the XLA module path, same params."""

    def _setup(self):
        from protein_redesign_tpu.models.layers import GatedAttention

        rng = np.random.RandomState(7)
        B, N, D = 2, 16, 12
        x = jnp.asarray(rng.randn(B, N, N, D), jnp.float32)
        mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))
        mask2d = mask[:, :, None] * mask[:, None, :]
        ref_mod = GatedAttention(8, 2, use_pallas=False, dtype=jnp.float32)
        pal_mod = GatedAttention(
            8, 2, use_pallas=True, fused_gated=True, dtype=jnp.float32
        )
        params = ref_mod.init(jax.random.PRNGKey(0), x, mask2d)["params"]
        return ref_mod, pal_mod, params, x, mask2d

    def test_matches_xla_path(self):
        ref_mod, pal_mod, params, x, mask2d = self._setup()
        ref = ref_mod.apply({"params": params}, x, mask2d)
        out = pal_mod.apply({"params": params}, x, mask2d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5
        )

    def test_param_tree_identical(self):
        ref_mod, pal_mod, params, x, mask2d = self._setup()
        p2 = pal_mod.init(jax.random.PRNGKey(0), x, mask2d)["params"]
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(p2)
        )
        for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(p2),
        ):
            assert ka == kb and va.shape == vb.shape

    def test_grad_matches_xla_path(self):
        """custom_vjp backward (reference-math vjp) == XLA path gradient."""
        ref_mod, pal_mod, params, x, mask2d = self._setup()

        def loss(mod):
            return lambda p: jnp.sum(
                jnp.square(mod.apply({"params": p}, x, mask2d))
            )

        g_ref = jax.grad(loss(ref_mod))(params)
        g_pal = jax.grad(loss(pal_mod))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3
            )

    def test_bias_case_keeps_old_kernel_path(self):
        """With an attn_bias the fused path must not engage (it has no
        bias input); use_pallas still matches the XLA path numerically."""
        from protein_redesign_tpu.models.layers import GatedAttention

        rng = np.random.RandomState(8)
        B, N, D, H = 2, 16, 12, 2
        x = jnp.asarray(rng.randn(B, N, D), jnp.float32)
        mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))
        bias = jnp.asarray(rng.randn(B, H, N, N), jnp.float32)
        ref_mod = GatedAttention(8, H, use_pallas=False, dtype=jnp.float32)
        pal_mod = GatedAttention(
            8, H, use_pallas=True, fused_gated=True, dtype=jnp.float32
        )
        params = ref_mod.init(jax.random.PRNGKey(0), x, mask, bias)["params"]
        ref = ref_mod.apply({"params": params}, x, mask, attn_bias=bias)
        out = pal_mod.apply({"params": params}, x, mask, attn_bias=bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5
        )


class TestFusedAuxKernelModules:
    """Fused TransitionMLP / OuterLinear kernels vs the XLA module paths
    (same params; identical trees via DenseHandle)."""

    def test_transition_matches_and_tree(self):
        from protein_redesign_tpu.models.layers import TransitionMLP

        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(2, 8, 8, 12), jnp.float32)
        ref_mod = TransitionMLP(24, 12, dtype=jnp.float32)
        pal_mod = TransitionMLP(24, 12, dtype=jnp.float32, use_pallas=True)
        params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
        p2 = pal_mod.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(p2)
        )
        rng_params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                np.random.RandomState(1).randn(*v.shape) * 0.1, v.dtype
            ),
            params,
        )
        ref = ref_mod.apply({"params": rng_params}, x)
        out = pal_mod.apply({"params": rng_params}, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5
        )

    def test_transition_no_out_bias(self):
        from protein_redesign_tpu.models.layers import TransitionMLP

        rng = np.random.RandomState(10)
        x = jnp.asarray(rng.randn(2, 8, 12), jnp.float32)
        ref_mod = TransitionMLP(24, 6, dtype=jnp.float32, out_bias=False)
        pal_mod = TransitionMLP(
            24, 6, dtype=jnp.float32, out_bias=False, use_pallas=True
        )
        params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
        ref = ref_mod.apply({"params": params}, x)
        out = pal_mod.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5
        )

    def test_outer_linear_matches_tree_and_grad(self):
        from protein_redesign_tpu.models.denoiser import OuterLinear

        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.randn(2, 16, 12), jnp.float32)
        ref_mod = OuterLinear(8, dtype=jnp.float32)
        pal_mod = OuterLinear(8, use_pallas=True, dtype=jnp.float32)
        params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
        p2 = pal_mod.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(p2)
        )
        ref = ref_mod.apply({"params": params}, x)
        out = pal_mod.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5
        )

        def loss(mod):
            return lambda p: jnp.sum(
                jnp.square(mod.apply({"params": p}, x))
            )

        g_ref = jax.grad(loss(ref_mod))(params)
        g_pal = jax.grad(loss(pal_mod))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref),
            jax.tree_util.tree_leaves(g_pal),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3
            )

    def test_denoiser_with_aux_kernels_matches(self):
        """Full Denoiser forward with both aux kernels on vs off."""
        from protein_redesign_tpu.models.denoiser import Denoiser

        cfg = ModelConfig(**TINY)
        rng = np.random.RandomState(12)
        B, N = 1, 16
        single = jnp.asarray(rng.randn(B, N, cfg.single_dim), jnp.float32)
        pair = jnp.asarray(rng.randn(B, N, N, cfg.pair_dim), jnp.float32)
        mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))
        base = Denoiser(cfg)
        params = base.init(jax.random.PRNGKey(0), single, pair, mask)["params"]
        s0, p0 = base.apply({"params": params}, single, pair, mask)
        fused = Denoiser(
            cfg.replace(use_pallas_transition=True, use_pallas_outer=True)
        )
        s1, p1 = fused.apply({"params": params}, single, pair, mask)
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s0), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p0), atol=1e-4, rtol=1e-4
        )


class TestTrimulDmajorLayout:
    """trimul_dmajor (channel-major [d,N,N] contraction): bit-for-bit
    the same math as the d-minor einsum, both modes, with grads — the
    layout flag may only change HOW XLA schedules the O(N^3) product
    (reference modules.py:246-274), never WHAT it computes."""

    @pytest.mark.parametrize("mode", ["outgoing", "incoming"])
    def test_matches_dminor(self, mode):
        from protein_redesign_tpu.models.denoiser import (
            TriangleMultiplication,
        )

        rng = np.random.RandomState(3)
        B, N, D = 2, 12, 8
        pair = jnp.asarray(rng.randn(B, N, N, D), jnp.float32)
        mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))
        mask2d = mask[:, :, None] * mask[:, None, :]
        ref_mod = TriangleMultiplication(mode, dtype=jnp.float32)
        params = ref_mod.init(jax.random.PRNGKey(0), pair, mask2d)["params"]
        params = jax.tree_util.tree_map(
            lambda x: x + 0.1 * rng.standard_normal(x.shape).astype(x.dtype),
            params,
        )
        dm_mod = TriangleMultiplication(mode, dmajor=True, dtype=jnp.float32)

        def loss(mod, p):
            return jnp.sum(mod.apply({"params": p}, pair, mask2d) ** 2)

        ref, gref = jax.value_and_grad(lambda p: loss(ref_mod, p))(params)
        out, gout = jax.value_and_grad(lambda p: loss(dm_mod, p))(params)
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gref),
                        jax.tree_util.tree_leaves(gout)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5
            )

    def test_config_plumbs_to_denoiser(self):
        """cfg.trimul_dmajor flows through Denoiser -> FoldingBlock and
        leaves the full forward numerically unchanged."""
        from protein_redesign_tpu.config import ModelConfig
        from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
        from __graft_entry__ import _make_batch

        cfg = ModelConfig(single_dim=16, pair_dim=8, head_dim=4,
                          num_heads=2, num_blocks=1, num_steps=4,
                          esm_dim=16, training_mode=False)
        b = {k: jnp.asarray(v)
             for k, v in _make_batch(4, 8, 16, esm_dim=16).items()}
        m1 = ProteinReDiffModel(cfg)
        params = m1.init_params(jax.random.PRNGKey(0), b)
        m2 = ProteinReDiffModel(cfg.replace(trimul_dmajor=True))
        B, N = b["residue_mask"].shape
        mask = b["atom_mask"] + b["residue_mask"]
        z = jnp.asarray(np.random.RandomState(0).randn(B, N, 3), jnp.float32)
        seq = jnp.zeros((B, N, 21))
        t = jnp.zeros((B,), jnp.int32)
        o1 = m1.apply(params, b, z, seq, mask, t)
        o2 = m2.apply(params, b, z, seq, mask, t)
        np.testing.assert_allclose(np.asarray(o2[0]), np.asarray(o1[0]),
                                   atol=1e-5, rtol=1e-5)


class TestF32KChunkThreshold:
    def test_f32_switches_to_kchunk_earlier(self, monkeypatch):
        """f32 operands take the K-chunked kernel from
        ROWS_KCHUNK_MIN_N_F32 (measured 1.26x at N=1024) while bf16
        keeps the full-key kernel until ROWS_KCHUNK_MIN_N."""
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", 2048)
        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N_F32", 16)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", 8)
        calls = []
        orig = pa._rows_attention_kchunk_grid_cn

        def spy(*a, **kw):
            calls.append("cn")
            return orig(*a, **kw)

        monkeypatch.setattr(pa, "_rows_attention_kchunk_grid_cn", spy)
        q, k, v, mask, _ = rand_qkv(R=4, N=32, H=2, C=8)
        ref = _attention_reference(q, k, v, mask, None, scale=0.35)
        out = fused_attention(q, k, v, mask, None, 0.35, True)
        assert calls == ["cn"]  # f32 -> K-chunked CN path
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        calls.clear()
        out16 = fused_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), mask, None, 0.35, True,
        )
        assert calls == []  # bf16 below ROWS_KCHUNK_MIN_N -> full-key
        assert np.isfinite(np.asarray(out16, np.float32)).all()


class TestRandomizedKernelDifferential:
    """Seeded randomized sweep over shapes / chunk configs / mask
    patterns (incl. fully-masked rows and single-survivor rows) for BOTH
    kernel regimes, forward and flash backward, against the einsum
    reference and its VJP. The fixed-case tests above pin specific
    regressions; this sweeps the configuration space the fixed cases
    cannot enumerate."""

    CASES = [
        # (R, N, H, C, kchunk_min, kc_target, seed)
        (2, 32, 1, 8, 16, 8, 11),
        (4, 48, 2, 8, 16, 16, 12),   # kc=16 has no divisor of 48; ladder -> 8
        (3, 64, 1, 16, 16, 32, 13),
        (2, 64, 2, 8, 2048, 8, 14),  # full-key regime
        (6, 16, 3, 4, 2048, 8, 15),  # full-key, odd row/head counts
    ]

    @pytest.mark.parametrize("R,N,H,C,min_n,kc,seed", CASES)
    def test_fwd_and_grads_match_reference(self, monkeypatch,
                                           R, N, H, C, min_n, kc, seed):
        import protein_redesign_tpu.ops.pallas_attention as pa

        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N", min_n)
        monkeypatch.setattr(pa, "ROWS_KCHUNK_MIN_N_F32", min_n)
        monkeypatch.setattr(pa, "_KCHUNK_TARGET", kc)
        monkeypatch.setattr(pa, "_KCHUNK_GRID", True)
        monkeypatch.setattr(pa, "_KCHUNK_CN", True)

        rng = np.random.RandomState(seed)
        q, k, v = (jnp.asarray(rng.randn(R, N, H, C), jnp.float32)
                   for _ in range(3))
        mask = (rng.rand(R, N) > 0.3).astype(np.float32)
        mask[0, :] = 0.0          # fully-masked row
        if R > 1:
            mask[1, :] = 0.0      # single-survivor row
            mask[1, 0] = 1.0
        mask = jnp.asarray(mask)
        scale = 1.0 / np.sqrt(C)

        out = fused_attention(q, k, v, mask, None, scale, True)
        ref = _attention_reference(q, k, v, mask, None, scale)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

        def loss(fn):
            def f(q, k, v):
                return jnp.sum(jnp.sin(fn(q, k, v)))
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        g_kernel = loss(lambda q, k, v: fused_attention(
            q, k, v, mask, None, scale, True, True))
        g_ref = loss(lambda q, k, v: _attention_reference(
            q, k, v, mask, None, scale))
        for name, a, b in zip("dq dk dv".split(), g_kernel, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=f"{name} R={R} N={N} H={H} C={C} min_n={min_n}",
            )
