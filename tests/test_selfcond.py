"""Coordinate self-conditioning (ModelConfig.self_cond — round-4 quality
lever, VERDICT r3 item 2; Chen et al. 2022 "analog bits" recipe adapted
to the pair-track distance embedding). Beyond reference: the reference
model (`model.py:254-375`) has no self-conditioning pathway."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

TINY = ModelConfig(
    esm_dim=8, time_dim=8, dist_dim=8, single_dim=32, pair_dim=8,
    head_dim=4, num_heads=2, num_blocks=1, num_steps=8,
    dtype="float32", remat=False, mask_prob=0.15,
)


def _batch(batch=1, seed=0):
    from __graft_entry__ import _make_batch

    b = _make_batch(n_atoms=4, n_res=12, bucket=16, esm_dim=8, batch=batch)
    rng = np.random.RandomState(seed)
    b["residue_type"][:, 4:16] = rng.randint(1, 21, (batch, 12))
    return {k: jnp.asarray(v) for k, v in b.items()}


def _randomized(params, scale=0.02, seed=7):
    """Random small weights everywhere: the zero-initialized readout
    heads make fresh-init outputs identically zero, which would let
    liveness assertions pass vacuously."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rngp = np.random.RandomState(seed)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rngp.randn(*leaf.shape) * scale, leaf.dtype)
         for leaf in leaves],
    )


def _flat_names(params):
    return {
        "/".join(str(k) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def test_param_tree_gated_by_flag():
    """embed_sc_dist exists iff self_cond — old checkpoints restore
    unchanged with the default-off flag."""
    batch = _batch()
    p_off = ProteinReDiffModel(TINY).init_params(jax.random.PRNGKey(0), batch)
    p_on = ProteinReDiffModel(
        TINY.replace(self_cond=True)
    ).init_params(jax.random.PRNGKey(0), batch)
    names_off = {n for n in _flat_names(p_off) if "embed_sc_dist" in n}
    names_on = {n for n in _flat_names(p_on) if "embed_sc_dist" in n}
    assert not names_off
    assert names_on


def test_flag_zero_is_exact_noop():
    """With sc_flag=0 the self-conditioning branch must be an EXACT
    no-op whatever garbage sits in z_sc (the gate, not the input,
    carries the semantics); with sc_flag=1 it must change the output."""
    batch = _batch()
    model = ProteinReDiffModel(TINY.replace(self_cond=True,
                                            training_mode=False))
    params = _randomized(model.init_params(jax.random.PRNGKey(0), batch))
    B, N = batch["residue_mask"].shape
    z = jnp.asarray(np.random.RandomState(1).randn(B, N, 3), jnp.float32)
    seq = jnp.zeros((B, N, 21))
    mask = batch["atom_mask"] + batch["residue_mask"]
    t = jnp.full((B,), 3, jnp.int32)
    garbage = jnp.full((B, N, 3), 7.5)
    zero_flag = jnp.zeros((B,), jnp.float32)
    out_none = model.apply(params, batch, z, seq, mask, t)
    out_garbage0 = model.apply(params, batch, z, seq, mask, t,
                               garbage, zero_flag)
    np.testing.assert_array_equal(np.asarray(out_none[0]),
                                  np.asarray(out_garbage0[0]))
    np.testing.assert_array_equal(np.asarray(out_none[1]),
                                  np.asarray(out_garbage0[1]))
    out_live = model.apply(params, batch, z, seq, mask, t,
                           garbage, jnp.ones((B,), jnp.float32))
    assert not np.allclose(np.asarray(out_none[0]), np.asarray(out_live[0]))


@pytest.mark.parametrize("proc", ["gaussian", "absorbing"])
def test_loss_finite_and_coin_covers_both_branches(proc):
    """Training loss is finite under self_cond, and across keys the
    per-batch coin exercises BOTH branches: some keys produce nonzero
    embed_sc_dist gradients (with-sc pass), some exactly zero (no-sc)."""
    batch = _batch(batch=2)
    model = ProteinReDiffModel(
        TINY.replace(self_cond=True, seq_process=proc, training_mode=True)
    )
    # Randomized weights: at fresh init the zero-initialized readout
    # heads zero out every upstream gradient, which would make the
    # nonzero-grad assertion unsatisfiable.
    params = _randomized(model.init_params(jax.random.PRNGKey(0), batch))

    def loss_fn(p, key):
        return model.loss(p, batch, key)[0]

    grad_norms = []
    for s in range(6):
        loss, = (loss_fn(params, jax.random.PRNGKey(s)),)
        assert np.isfinite(float(loss)), (proc, s)
        g = jax.grad(loss_fn)(params, jax.random.PRNGKey(s))
        sc_leaves = [
            v for path, v in
            jax.tree_util.tree_flatten_with_path(g)[0]
            if any("embed_sc_dist" in str(k) for k in path)
        ]
        assert sc_leaves
        grad_norms.append(
            float(sum(jnp.sum(jnp.abs(leaf)) for leaf in sc_leaves))
        )
    assert any(n > 0 for n in grad_norms), grad_norms
    assert any(n == 0 for n in grad_norms), grad_norms


@pytest.mark.parametrize("proc", ["gaussian", "absorbing"])
def test_samplers_run_and_use_the_estimate(proc):
    """All sequential samplers must run with self_cond (extended carry),
    produce finite outputs, and actually consume the estimate — zeroing
    embed_sc_dist weights changes the trajectory."""
    batch = _batch()
    model = ProteinReDiffModel(
        TINY.replace(self_cond=True, seq_process=proc, training_mode=False)
    )
    params = _randomized(model.init_params(jax.random.PRNGKey(0), batch))
    key = jax.random.PRNGKey(3)
    pos, logits = model.sample(params, batch, key, mask_prob=0.5)
    assert np.isfinite(np.asarray(pos)).all()
    assert np.isfinite(np.asarray(logits)).all()
    dpos, dlogits = model.sample_ddim(params, batch, key, ddim_steps=4)
    assert np.isfinite(np.asarray(dpos)).all()

    # Kill the self-conditioning input pathway -> different positions
    # (proves the sampler threads a LIVE estimate, not the zero init).
    def zero_sc(path, v):
        return jnp.zeros_like(v) if any(
            "embed_sc_dist" in str(k) for k in path
        ) else v

    params_dead = jax.tree_util.tree_map_with_path(zero_sc, params)
    pos_dead, _ = model.sample(params_dead, batch, key, mask_prob=0.5)
    assert not np.allclose(np.asarray(pos), np.asarray(pos_dead))


def test_segmented_sampling_bit_identical_under_selfcond():
    """The segmented API must thread the extended (z_sc, flag) carry:
    2-segment host-chained sampling == one-shot, bit-exact."""
    batch = _batch()
    cfg = TINY.replace(self_cond=True, training_mode=False)
    model = ProteinReDiffModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(5)
    one_pos, one_logits = model.sample(params, batch, key)

    prepared, carry = model.sample_init(params, batch, key)
    k_scan = jax.random.split(key, 4)[3]
    ts = jnp.arange(cfg.num_steps - 1, -1, -1)
    keys = jax.random.split(k_scan, cfg.num_steps)
    h = cfg.num_steps // 2
    carry = model.sample_segment(params, prepared, carry, ts[:h], keys[:h])
    carry = model.sample_segment(params, prepared, carry, ts[h:], keys[h:])
    seg_pos, seg_logits = model.sample_finish(prepared, carry)
    np.testing.assert_array_equal(np.asarray(one_pos), np.asarray(seg_pos))
    np.testing.assert_array_equal(
        np.asarray(one_logits), np.asarray(seg_logits)
    )


def test_paratime_rejects_selfcond():
    from protein_redesign_tpu.models.paratime import sample_ddim_parallel

    batch = _batch()
    model = ProteinReDiffModel(TINY.replace(self_cond=True,
                                            training_mode=False))
    params = model.init_params(jax.random.PRNGKey(0), batch)
    with pytest.raises(NotImplementedError, match="self_cond"):
        sample_ddim_parallel(model, params, batch, jax.random.PRNGKey(0),
                             ddim_steps=4, window=2)
