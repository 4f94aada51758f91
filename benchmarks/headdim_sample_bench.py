"""ROADMAP #1: full sample + train-step wall-clock at head_dim 64 x 1 head.

The denoiser-forward win (1.98x at N=384, BASELINE.md head_dim table) is
already measured; this pins the two end-to-end numbers the table lacks —
the 1000-step DDPM sample and the paper-config train step — for the
recommended new-training layout (--head_dim 64 --num_heads 1) vs the
checkpoint default (16 x 4), bucket 192, single chip.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return time.perf_counter() - t0, out


def measure(cfg, label):
    model = ProteinReDiffModel(cfg)
    batch_np = _make_batch(n_atoms=34, n_res=110, bucket=192,
                           esm_dim=cfg.esm_dim)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, batch)

    sample = jax.jit(lambda p, b, k: model.sample(p, b, k, mask_prob=0.3))
    timed(sample, params, batch, key)
    d1, _ = timed(sample, params, batch, jax.random.PRNGKey(1))
    d2, _ = timed(sample, params, batch, jax.random.PRNGKey(2))
    print(f"[{label}] 1000-step DDPM sample: {min(d1, d2):.2f} s", flush=True)

    # Paper-config train step (B=2, remat, bf16) on the same bucket.
    from protein_redesign_tpu.config import TrainConfig
    from protein_redesign_tpu.parallel.train_step import (
        make_train_state,
        make_train_step,
    )

    tcfg = cfg.replace(training_mode=True)
    tmodel = ProteinReDiffModel(tcfg)
    train_cfg = TrainConfig()
    b2 = {
        k: jnp.concatenate([v, v], 0)
        for k, v in batch.items()
    }
    state = make_train_state(tmodel, train_cfg, jax.random.PRNGKey(0), b2)
    step = make_train_step(tmodel, train_cfg)

    @jax.jit
    def loop(state, b, k):
        def body(s, i):
            s2, metrics = step(s, b, jax.random.fold_in(k, i))
            return s2, metrics["loss"]
        return jax.lax.scan(body, state, jnp.arange(20))

    timed(loop, state, b2, jax.random.PRNGKey(2))
    d, _ = timed(loop, state, b2, jax.random.PRNGKey(3))
    print(f"[{label}] train step (B=2): {d / 20 * 1e3:.1f} ms", flush=True)


measure(
    ModelConfig(single_dim=512, pair_dim=64, num_blocks=4, num_steps=1000),
    "h16x4 default",
)
measure(
    ModelConfig(single_dim=512, pair_dim=64, num_blocks=4, num_steps=1000,
                head_dim=64, num_heads=1),
    "h64x1 recommended",
)
