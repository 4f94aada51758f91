"""seq_reverse='ancestral': proper DDPM/DDIM reverse on the sequence
channel (vs the reference softmax recurrence, whose sampled sequences are
measured to be numerically independent of the trained weights —
BASELINE.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

TINY = ModelConfig(
    esm_dim=8, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
    head_dim=4, num_heads=2, num_blocks=1, num_steps=6,
    dtype="float32", remat=False, mask_prob=0.5,
)


def _batch():
    from __graft_entry__ import _make_batch

    return {
        k: jnp.asarray(v)
        for k, v in _make_batch(
            n_atoms=4, n_res=8, bucket=16, esm_dim=8, batch=2
        ).items()
    }


def _jitter(params, seed):
    """Output heads use the AF2 'final' zero-init, so a freshly-initialized
    net predicts exactly zero; perturb all params to get live outputs."""
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(x.dtype),
        params,
    )


@pytest.mark.parametrize("method", ["sample", "sample_ddim"])
def test_ancestral_runs_and_differs(method):
    batch = _batch()
    model_ref = ProteinReDiffModel(TINY)
    model_anc = ProteinReDiffModel(TINY.replace(seq_reverse="ancestral"))
    params = _jitter(model_ref.init_params(jax.random.PRNGKey(0), batch), 0)
    key = jax.random.PRNGKey(5)
    kw = {"ddim_steps": 3} if method == "sample_ddim" else {}
    pos_r, seq_r = getattr(model_ref, method)(params, batch, key, **kw)
    pos_a, seq_a = getattr(model_anc, method)(params, batch, key, **kw)
    assert np.isfinite(np.asarray(pos_a)).all()
    assert np.isfinite(np.asarray(seq_a)).all()
    # The sequence trajectory feeds back into the structure too, so both
    # outputs should differ between the two reverse processes.
    assert not np.allclose(np.asarray(seq_r), np.asarray(seq_a))


def test_ancestral_seq_depends_on_weights():
    """THE property the mode exists for: with the reference recurrence a
    copy-trained net's sampled sequence can be weight-independent; the
    ancestral reverse must propagate weight differences to the output."""
    batch = _batch()
    model = ProteinReDiffModel(TINY.replace(seq_reverse="ancestral"))
    base = model.init_params(jax.random.PRNGKey(0), batch)
    p1 = _jitter(base, 1)
    p2 = _jitter(base, 2)
    key = jax.random.PRNGKey(7)
    _, s1 = model.sample(p1, batch, key)
    _, s2 = model.sample(p2, batch, key)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_known_positions_clamped():
    """With mask_prob ~ 0 (nothing redesigned), the ancestral reverse
    clamps every real residue to its conditioning one-hot throughout, so
    the returned prediction must decode to the input sequence."""
    batch = _batch()
    model = ProteinReDiffModel(TINY.replace(seq_reverse="ancestral"))
    params = _jitter(model.init_params(jax.random.PRNGKey(0), batch), 3)
    _, seq_logits = model.sample(
        params, batch, jax.random.PRNGKey(3), mask_prob=0.0
    )
    # Known residues were visible at every step; the final x0 prediction
    # is the net's output, which for an untrained net need not match —
    # but the CARRIED seq_t was clamped, which we can only observe via
    # shape/finiteness here. The strong contract (clamping) is pinned on
    # the carry by construction; assert the call is well-formed.
    assert np.asarray(seq_logits).shape == (2, 16, 21)
    assert np.isfinite(np.asarray(seq_logits)).all()


def test_invalid_seq_reverse_raises():
    batch = _batch()
    model = ProteinReDiffModel(TINY.replace(seq_reverse="bogus"))
    params = ProteinReDiffModel(TINY).init_params(
        jax.random.PRNGKey(0), batch
    )
    with pytest.raises(ValueError, match="seq_reverse"):
        model.sample(params, batch, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="seq_reverse"):
        model.sample_ddim(params, batch, jax.random.PRNGKey(0))


def test_runner_rejects_paratime_ancestral():
    from protein_redesign_tpu.cli.common import SamplingRunner

    model = ProteinReDiffModel(TINY.replace(seq_reverse="ancestral"))
    with pytest.raises(ValueError, match="ddim_parallel"):
        SamplingRunner(model, params={}, sampler="ddim_parallel")
