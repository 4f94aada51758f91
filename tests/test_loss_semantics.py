"""Validate the quirky loss reductions against torch.nn.functional.

The reference loss (`model.py:504-526`) combines: per-sample masked MSE,
a KL term computed from *mask-multiplied* log-softmax/softmax tensors, and
cross-entropy on ``(seq_pred+1)/2`` used as logits with ignore_index=0 —
both reduced to scalars and broadcast onto every sample. These tests pin
my JAX formulation to torch's operator semantics on shared inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


def _np(x):
    return np.asarray(x)


class TestKLTerm:
    def test_masked_kl_matches_torch(self):
        rng = np.random.RandomState(0)
        B, N, C = 2, 7, 21
        seq_pred_t1 = rng.randn(B, N, C).astype(np.float32)
        seq_t1 = rng.randn(B, N, C).astype(np.float32)
        residue_mask = (rng.rand(B, N) > 0.4).astype(np.float32)

        # torch (reference `model.py:512-518`)
        tp = torch.from_numpy(seq_pred_t1)
        tt = torch.from_numpy(seq_t1)
        tm = torch.from_numpy(residue_mask).unsqueeze(-1)
        t_kl = torch.nn.functional.kl_div(
            torch.log_softmax(tp, dim=-1) * tm,
            torch.softmax(tt, dim=-1) * tm,
            reduction="none",
        ).sum().item()

        # JAX formulation (models/prdiff.py diffusion_loss)
        rm = jnp.asarray(residue_mask)[..., None]
        log_p = jnp.asarray(
            np.log(_softmax(seq_pred_t1))
        ) * rm
        q_tgt = jnp.asarray(_softmax(seq_t1)) * rm
        kl = jnp.where(
            q_tgt > 0,
            q_tgt * (jnp.log(jnp.where(q_tgt > 0, q_tgt, 1.0)) - log_p),
            -q_tgt * log_p,
        )
        assert float(jnp.sum(kl)) == pytest.approx(t_kl, rel=1e-4)


class TestCETerm:
    def test_ce_on_shifted_logits_matches_torch(self):
        rng = np.random.RandomState(1)
        B, N, C = 2, 9, 21
        seq_pred = rng.randn(B, N, C).astype(np.float32)
        labels = rng.randint(0, C, (B, N))
        labels[:, -2:] = 0  # padding rows -> ignore_index
        mask = (rng.rand(B, N) > 0.3).astype(np.float32)

        logits = (seq_pred + 1.0) / 2.0
        t_ce = (
            torch.nn.functional.cross_entropy(
                torch.from_numpy(logits).view(-1, C),
                torch.from_numpy(labels).view(-1),
                reduction="none",
                ignore_index=0,
            )
            * torch.from_numpy(mask).view(-1)
        ).sum().item()

        jl = jnp.asarray(logits)
        log_probs = jl - jnp.log(
            jnp.sum(jnp.exp(jl - jl.max(axis=-1, keepdims=True)),
                    axis=-1, keepdims=True)
        ) - jl.max(axis=-1, keepdims=True)
        nll = -jnp.take_along_axis(
            log_probs, jnp.asarray(labels)[..., None], axis=-1
        )[..., 0]
        nll = jnp.where(jnp.asarray(labels) == 0, 0.0, nll) * jnp.asarray(mask)
        assert float(jnp.sum(nll)) == pytest.approx(t_ce, rel=1e-4)


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


class TestPerPositionLossMode:
    """loss_mode='per_position' (beyond reference): self-normalized terms,
    true-logit CE restricted to the masked residues."""

    def _setup(self, loss_mode):
        import jax

        from protein_redesign_tpu.config import ModelConfig
        from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
        from __graft_entry__ import _make_batch
        import jax.numpy as jnp

        cfg = ModelConfig(
            esm_dim=16, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
            head_dim=4, num_heads=2, num_blocks=1, num_steps=4,
            dtype="float32", remat=False, training_mode=True,
            mask_prob=0.5, loss_mode=loss_mode,
        )
        model = ProteinReDiffModel(cfg)
        batch = {
            k: jnp.asarray(v)
            for k, v in _make_batch(
                n_atoms=4, n_res=8, bucket=16, esm_dim=16, batch=2
            ).items()
        }
        params = model.init_params(jax.random.PRNGKey(0), batch)
        return model, params, batch

    def test_finite_and_differs_from_reference(self):
        import jax

        model_ref, params, batch = self._setup("reference")
        model_pp, _, _ = self._setup("per_position")
        key = jax.random.PRNGKey(3)
        l_ref = float(model_ref.loss(params, batch, key)[0])
        l_pp = float(model_pp.loss(params, batch, key)[0])
        assert np.isfinite(l_ref) and np.isfinite(l_pp)
        assert l_ref != l_pp

    def test_seq_head_gets_gradient(self):
        import jax

        model, params, batch = self._setup("per_position")
        # Find a key where the policy draw actually masks residues
        # (rt < 0.5); fold until the CE term is live.
        for i in range(8):
            key = jax.random.PRNGKey(100 + i)
            grads = jax.grad(
                lambda p: model.loss(p, batch, key)[0]
            )(params)
            g = grads["seq_mlp"]
            norm = sum(
                float(np.abs(np.asarray(x)).sum())
                for x in jax.tree_util.tree_leaves(g)
            )
            if norm > 0:
                break
        assert norm > 0

    def test_invalid_mode_raises(self):
        import jax
        import pytest as _pytest

        model, params, batch = self._setup("reference")
        bad = model.cfg.replace(loss_mode="nonsense")
        from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

        bad_model = ProteinReDiffModel(bad)
        with _pytest.raises(ValueError, match="loss_mode"):
            bad_model.loss(params, batch, jax.random.PRNGKey(0))
