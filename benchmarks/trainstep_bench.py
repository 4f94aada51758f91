"""Train-step remat ablation (tracked metric: train steps/sec/chip).

`ModelConfig.remat` (jax.checkpoint per FoldingBlock, mirroring the
reference's `torch.utils.checkpoint` at `modules.py:399-401`) trades ~33%
recompute for O(num_blocks) less activation memory. On a 16 GB-HBM v5e
chip the paper-scale model's activations fit WITHOUT remat at the
training buckets (N<=256: the largest per-block live tensor is the
[B,H,N,N] attention scores, a few MB) — so the recompute may be pure
waste there. This pins the wall-clock both ways at the two configs that
matter:

- paper/checkpoint layout (h16x4), B=2, bucket 192  (BASELINE train row)
- quality-training layout (h64x1), B=8, bucket 256  (cli/train configs)

Rows -> BASELINE.md; decides the remat default guidance in docs/SCALING.md.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from longctx_bench import timed_fetch as timed
from protein_redesign_tpu.config import ModelConfig, TrainConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.parallel.train_step import (
    make_train_state,
    make_train_step,
)
from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache


def measure(cfg, batch_size, bucket, n_res, label, iters=20):
    model = ProteinReDiffModel(cfg.replace(training_mode=True))
    batch_np = _make_batch(n_atoms=34, n_res=n_res, bucket=bucket,
                           esm_dim=cfg.esm_dim)
    batch = {
        k: jnp.concatenate([jnp.asarray(v)] * batch_size, 0)
        for k, v in batch_np.items()
    }
    train_cfg = TrainConfig()
    state = make_train_state(model, train_cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, train_cfg)

    @jax.jit
    def loop(state, b, k):
        def body(s, i):
            s2, metrics = step(s, b, jax.random.fold_in(k, i))
            return s2, metrics["loss"]
        return jax.lax.scan(body, state, jnp.arange(iters))

    timed(loop, state, batch, jax.random.PRNGKey(2))  # compile
    d, _ = timed(loop, state, batch, jax.random.PRNGKey(3))
    d2, _ = timed(loop, state, batch, jax.random.PRNGKey(4))
    ms = min(d, d2) / iters * 1e3
    print(f"[{label}] train step (B={batch_size}, bucket {bucket}): "
          f"{ms:.1f} ms ({1e3 / ms:.2f} steps/s/chip)", flush=True)


def measure_sample(cfg, batch_size, bucket, n_res, label):
    """Re-verify BASELINE's round-1 batch-scaling row (B=1: 0.152 /
    B=8: 0.082 samples/s/chip implies batching LOSES throughput —
    suspicious for linear-in-B O(N^3) work; re-measure cleanly)."""
    model = ProteinReDiffModel(cfg)
    batch_np = _make_batch(n_atoms=34, n_res=n_res, bucket=bucket,
                           esm_dim=cfg.esm_dim)
    batch = {
        k: jnp.concatenate([jnp.asarray(v)] * batch_size, 0)
        for k, v in batch_np.items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    sample = jax.jit(lambda p, b, k: model.sample(p, b, k, mask_prob=0.3))
    _, out = timed(sample, params, batch, jax.random.PRNGKey(1))  # compile
    assert np.isfinite(np.asarray(out[0])).all()
    d, _ = timed(sample, params, batch, jax.random.PRNGKey(2))
    print(f"[{label}] 1000-step DDPM sample B={batch_size}: {d:.2f} s "
          f"({batch_size / d:.3f} samples/s/chip total)", flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    BASE = ModelConfig(single_dim=512, pair_dim=64, num_blocks=4,
                       num_steps=1000)
    H64 = BASE.replace(head_dim=64, num_heads=1, esm_dim=320)

    for remat in (True, False):
        tag = "remat" if remat else "no-remat"
        measure(BASE.replace(remat=remat), 2, 192, 110, f"h16x4 {tag}")
    for remat in (True, False):
        tag = "remat" if remat else "no-remat"
        measure(H64.replace(remat=remat), 8, 256, 110, f"h64x1 {tag}")

    for B in (1, 4, 8):
        measure_sample(BASE, B, 192, 110, "h16x4")
