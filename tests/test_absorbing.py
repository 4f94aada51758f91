"""seq_process='absorbing': masked discrete diffusion on the sequence
channel (beyond reference). The key test overfits a tiny model and shows
near-perfect masked-position recovery — the capability the Gaussian
process provably lacks (BASELINE.md ablation: its sampled sequences are
weight-independent)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from protein_redesign_tpu.config import ModelConfig, TrainConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

TINY = ModelConfig(
    esm_dim=8, time_dim=8, dist_dim=8, single_dim=32, pair_dim=8,
    head_dim=4, num_heads=2, num_blocks=1, num_steps=8,
    dtype="float32", remat=False, mask_prob=0.5,
    seq_process="absorbing", training_mode=True,
)


def _batch(batch=2, seed=0):
    from __graft_entry__ import _make_batch

    b = _make_batch(n_atoms=4, n_res=12, bucket=16, esm_dim=8, batch=batch)
    rng = np.random.RandomState(seed)
    b["residue_type"][:, 4:16] = rng.randint(1, 21, (batch, 12))
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_loss_finite_and_seq_grad():
    model = ProteinReDiffModel(TINY)
    batch = _batch()
    params = model.init_params(jax.random.PRNGKey(0), batch)
    # At the EXACT zero-init the corrupted (zero-row) positions carry zero
    # activations through the final-init residual trunk, so the CE sits on
    # an exact saddle (it breaks after any trunk update — the MSE term
    # provides one). Jitter to probe the generic point.
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * rng.standard_normal(a.shape).astype(a.dtype),
        params,
    )
    for i in range(6):
        key = jax.random.PRNGKey(10 + i)
        loss, _ = model.loss(params, batch, key)
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: model.loss(p, batch, key)[0])(params)
        norm = sum(
            float(np.abs(np.asarray(x)).sum())
            for x in jax.tree_util.tree_leaves(g["seq_mlp"])
        )
        if norm > 0:
            break
    assert norm > 0  # CE reaches the sequence head


def test_loss_mode_is_ignored_under_absorbing():
    """The absorbing objective never consults loss_mode: per_position
    yields the bit-identical loss AND a warning (round-3 finding — two
    20k-step TPU runs differing only in this flag trained bit-identically,
    BASELINE.md quality cells)."""
    batch = _batch()
    ref = ProteinReDiffModel(TINY)
    params = ref.init_params(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(7)
    loss_ref, _ = ref.loss(params, batch, key)
    pp = ProteinReDiffModel(TINY.replace(loss_mode="per_position"))
    with pytest.warns(UserWarning, match="no effect under"):
        loss_pp, _ = pp.loss(params, batch, key)
    assert float(loss_ref) == float(loss_pp)


def test_sample_reveals_all_unknowns():
    """Sampled logits decode to REAL residue classes at every unknown
    position (no absorbed/zero rows survive to the output)."""
    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = _batch()
    params = model.init_params(jax.random.PRNGKey(0), batch)
    rng = np.random.RandomState(3)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(x.dtype),
        params,
    )
    pos, logits = model.sample(
        params, batch, jax.random.PRNGKey(4), mask_prob=0.5
    )
    assert np.isfinite(np.asarray(pos)).all()
    res = np.asarray(logits)[:, 4:16]  # residue slots
    assert np.isfinite(res).all()


def test_absorbing_overfit_recovers_masked_sequence():
    """Overfit one batch; sampling must then recover masked residue
    identities way above the 1/20 chance floor (the model can memorize
    position->residue via residue_index embeddings). This is the
    end-to-end proof that the absorbing process learns sequence design."""
    import optax

    from protein_redesign_tpu.parallel.train_step import (
        make_train_state,
        make_train_step,
    )

    batch = _batch(batch=2, seed=7)
    train_cfg = TrainConfig(lr_decay_steps=700, lr_min_ratio=0.05)
    model_lr = ProteinReDiffModel(TINY.replace(learning_rate=5e-3,
                                               warmup_steps=10))
    step = jax.jit(make_train_step(model_lr, train_cfg))
    state = make_train_state(model_lr, train_cfg, jax.random.PRNGKey(0), batch)
    for i in range(800):
        state, metrics = step(state, batch, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
    assert np.isfinite(float(metrics["loss"]))

    sampler = ProteinReDiffModel(
        TINY.replace(training_mode=False)
    )
    true = np.asarray(batch["residue_type"])[:, 4:16]
    hits, total = 0, 0
    for s in range(4):
        key = jax.random.PRNGKey(100 + s)
        _, logits = sampler.sample(
            state.ema_params, batch, key, mask_prob=0.5
        )
        # which positions were masked for this key?
        _, invm = sampler.inference_extra_mask(
            key, batch["residue_mask"], 0.5
        )
        invm = np.asarray(invm)[:, 4:16] > 0.5
        pred = np.argmax(np.asarray(logits)[:, 4:16], axis=-1)
        hits += int(((pred == true) & invm).sum())
        total += int(invm.sum())
    assert total > 10
    recovery = hits / total
    # Chance is 0.05 and the Gaussian process lands exactly there
    # (BASELINE.md: its sequences are weight-independent); with sticky
    # commitments the absorbing sampler reaches ~0.98 on this
    # memorization task. Margin below for run-to-run stability.
    assert recovery > 0.8, f"masked recovery {recovery:.2f} (n={total})"

    # The cosine reveal schedule must preserve the learned recovery on
    # the same trained weights (it only reorders WHEN positions commit).
    # Pooled over 4 keys like the argmax leg above: a SINGLE key scores
    # only ~12 masked positions, and the per-key distribution measured
    # across 8 keys and both outer_factored trajectories ranges 9/12 to
    # 12/12 (pooled 0.94 factored / 0.93 unfactored — round-4 probe) —
    # one bad key's 0.75 is commitment-order variance, not a learning
    # failure, and single-key scoring made this test flap on any change
    # that perturbs the 800-step float trajectory (round-3 red suite).
    cosine = ProteinReDiffModel(
        TINY.replace(training_mode=False, reveal_schedule="cosine")
    )
    hits_c, total_c = 0, 0
    for s in range(4):
        key = jax.random.PRNGKey(100 + s)
        _, logits = cosine.sample(state.ema_params, batch, key, mask_prob=0.5)
        _, invm = cosine.inference_extra_mask(key, batch["residue_mask"], 0.5)
        invm = np.asarray(invm)[:, 4:16] > 0.5
        pred = np.argmax(np.asarray(logits)[:, 4:16], axis=-1)
        hits_c += int(((pred == true) & invm).sum())
        total_c += int(invm.sum())
    rec_cos = hits_c / max(total_c, 1)
    assert rec_cos > 0.8, f"cosine masked recovery {rec_cos:.2f} (n={total_c})"

    # The DDIM absorbing sampler (serving config) must preserve the
    # learned recovery with 2x fewer denoiser evals on the same weights.
    key = jax.random.PRNGKey(100)
    _, logits = sampler.sample_ddim(
        state.ema_params, batch, key, ddim_steps=4, mask_prob=0.5
    )
    _, invm = sampler.inference_extra_mask(key, batch["residue_mask"], 0.5)
    invm = np.asarray(invm)[:, 4:16] > 0.5
    pred = np.argmax(np.asarray(logits)[:, 4:16], axis=-1)
    rec_ddim = ((pred == true) & invm).sum() / max(invm.sum(), 1)
    assert rec_ddim > 0.8, f"ddim masked recovery {rec_ddim:.2f}"


@pytest.mark.parametrize(
    "overrides",
    [
        dict(reveal_schedule="cosine"),
        dict(reveal_temperature=1.0),
        dict(reveal_conf_noise=2.0),
        dict(reveal_schedule="cosine", reveal_temperature=0.7,
             reveal_conf_noise=1.0),
    ],
)
def test_reveal_options_commit_every_unknown(overrides):
    """Every reveal-schedule/temperature/noise combination must still
    commit ALL unknown positions to a REAL class by t=0 (a zero row at an
    inv position would decode to class 0 = pad/mask)."""
    model = ProteinReDiffModel(
        TINY.replace(training_mode=False, **overrides)
    )
    batch = _batch()
    params = ProteinReDiffModel(TINY).init_params(
        jax.random.PRNGKey(0), batch
    )
    rng = np.random.RandomState(3)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(x.dtype),
        params,
    )
    key = jax.random.PRNGKey(11)
    pos, logits = model.sample(params, batch, key, mask_prob=0.5)
    assert np.isfinite(np.asarray(pos)).all()
    _, invm = model.inference_extra_mask(key, batch["residue_mask"], 0.5)
    invm = np.asarray(invm)[:, 4:16] > 0.5
    pred = np.argmax(np.asarray(logits)[:, 4:16], axis=-1)
    assert (pred[invm] > 0).all(), "absorbed row survived to the output"


def test_reveal_temperature_varies_identities():
    """tau>0 samples identities: across keys the committed classes at a
    fixed masked position must not be constant (argmax would be)."""
    model = ProteinReDiffModel(
        TINY.replace(training_mode=False, reveal_temperature=5.0)
    )
    batch = _batch()
    params = ProteinReDiffModel(TINY).init_params(
        jax.random.PRNGKey(0), batch
    )
    rng = np.random.RandomState(3)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(x.dtype),
        params,
    )
    preds = []
    for s in range(6):
        key = jax.random.PRNGKey(40 + s)
        _, logits = model.sample(params, batch, key, mask_prob=1.0)
        preds.append(np.argmax(np.asarray(logits)[:, 4:16], axis=-1))
    distinct = np.stack(preds).reshape(len(preds), -1)
    # At high temperature, at least one position draws >=2 identities.
    assert (distinct.max(0) != distinct.min(0)).any()


def test_invalid_reveal_schedule_raises():
    model = ProteinReDiffModel(
        TINY.replace(training_mode=False, reveal_schedule="bogus")
    )
    batch = _batch()
    params = ProteinReDiffModel(TINY).init_params(
        jax.random.PRNGKey(0), batch
    )
    with pytest.raises(ValueError, match="reveal_schedule"):
        model.sample(params, batch, jax.random.PRNGKey(0), mask_prob=0.5)


def test_invalid_seq_process_raises():
    model = ProteinReDiffModel(TINY.replace(seq_process="bogus"))
    batch = _batch()
    params = ProteinReDiffModel(TINY).init_params(
        jax.random.PRNGKey(0), batch
    )
    with pytest.raises(ValueError, match="seq_process"):
        model.loss(params, batch, jax.random.PRNGKey(0))


@pytest.mark.parametrize("steps", [1, 4])
def test_ddim_absorbing_commits_all_unknowns(steps):
    """The DDIM absorbing sampler must commit every unknown position to a
    REAL class by its last step, like the DDPM path — including the
    degenerate ddim_steps=1 grid, which has no tau=0 entry."""
    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = _batch()
    params = ProteinReDiffModel(TINY).init_params(
        jax.random.PRNGKey(0), batch
    )
    rng = np.random.RandomState(3)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(x.dtype),
        params,
    )
    key = jax.random.PRNGKey(21)
    pos, logits = model.sample_ddim(
        params, batch, key, ddim_steps=steps, mask_prob=0.5
    )
    assert np.isfinite(np.asarray(pos)).all()
    _, invm = model.inference_extra_mask(key, batch["residue_mask"], 0.5)
    invm = np.asarray(invm)[:, 4:16] > 0.5
    pred = np.argmax(np.asarray(logits)[:, 4:16], axis=-1)
    assert (pred[invm] > 0).all(), "absorbed row survived to the output"


@pytest.mark.parametrize("use_ddim", [False, True])
def test_user_x_positions_always_designed(use_ddim):
    """Residues the USER marked unknown ('X' -> class 0) must be designed
    even when the random inference mask skips them (mask_prob=0): the
    Gaussian path papers over them with softmax logits, the absorbing
    path must treat them as absorbed-and-designable, not echo X."""
    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = dict(_batch())
    labels = np.asarray(batch["residue_type"]).copy()
    labels[:, 6:9] = 0  # user-X rows inside the residue span
    batch["residue_type"] = jnp.asarray(labels)
    params = ProteinReDiffModel(TINY).init_params(
        jax.random.PRNGKey(0), batch
    )
    rng = np.random.RandomState(3)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(x.dtype),
        params,
    )
    key = jax.random.PRNGKey(31)
    if use_ddim:
        _, logits = model.sample_ddim(
            params, batch, key, ddim_steps=4, mask_prob=0.0
        )
    else:
        _, logits = model.sample(params, batch, key, mask_prob=0.0)
    pred = np.argmax(np.asarray(logits)[:, 6:9], axis=-1)
    assert (pred > 0).all(), f"user-X rows echoed X: {pred}"


def test_paratime_absorbing_support_matrix():
    """ddim_parallel now supports absorbing with the DETERMINISTIC reveal
    (test_paratime has the exactness proof); the stochastic reveal and
    coarse_init warm starts are rejected with clear errors."""
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.models.paratime import sample_ddim_parallel

    model = ProteinReDiffModel(
        TINY.replace(training_mode=False)
    )
    batch = _batch()
    params = ProteinReDiffModel(TINY).init_params(
        jax.random.PRNGKey(0), batch
    )
    # Deterministic reveal: accepted end-to-end.
    pos, logits, _stats = sample_ddim_parallel(
        model, params, batch, jax.random.PRNGKey(0),
        ddim_steps=2, window=2, mask_prob=0.5,
    )
    assert np.isfinite(np.asarray(pos)).all()
    SamplingRunner(model, params={}, sampler="ddim_parallel")
    # Stochastic reveal: rejected (no deterministic fixed point).
    noisy = ProteinReDiffModel(
        TINY.replace(training_mode=False, reveal_temperature=0.5)
    )
    with pytest.raises(NotImplementedError, match="deterministic"):
        sample_ddim_parallel(noisy, params, batch, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="deterministic reveal"):
        SamplingRunner(noisy, params={}, sampler="ddim_parallel")
    # ddim stays supported for absorbing checkpoints (serving config).
    SamplingRunner(model, params={}, sampler="ddim")
