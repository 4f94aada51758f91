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
