"""On-chip wall-clock for parallel-in-time sampling vs sequential DDIM.

Measures, on one TPU chip at paper scale (512/64/4 blocks, bucket 192):
  - sequential DDIM-50 steady-state wall-clock (the round-1 serving config)
  - ddim_parallel at window in {4, 8, 16}, tol 1e-3: wall-clock, Picard
    sweeps, and useful NFE.

Single-chip rationale (BASELINE.md batch study): the O(N^3) denoiser
leaves the batch dimension under-utilized at B=1 — a window-batched eval
costs far less than window x sequential evals — so Picard can win
wall-clock even without extra chips. On a v5e-8 mesh the window shards
over 'data' for a further ~window/sweeps speedup.

Run as a background task (remote compiles are 150-300 s per program).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.paratime import sample_ddim_parallel
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

S = 50


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return time.perf_counter() - t0, out


def bench(cfg, label):
    model = ProteinReDiffModel(cfg)
    batch_np = _make_batch(n_atoms=34, n_res=110, bucket=192,
                           esm_dim=cfg.esm_dim)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, batch)

    seq_fn = jax.jit(lambda p, b, k: model.sample_ddim(
        p, b, k, ddim_steps=S, eta=0.0, mask_prob=0.3))
    timed(seq_fn, params, batch, key)
    dt1, _ = timed(seq_fn, params, batch, jax.random.PRNGKey(1))
    dt2, _ = timed(seq_fn, params, batch, jax.random.PRNGKey(2))
    seq_wall = min(dt1, dt2)
    print(f"[{label}] sequential ddim-{S}: {seq_wall:.3f} s", flush=True)

    pos_seq = np.asarray(seq_fn(params, batch, jax.random.PRNGKey(1))[0])
    for W in (4, 8, 16):
        par_fn = jax.jit(lambda p, b, k: sample_ddim_parallel(
            model, p, b, k, ddim_steps=S, window=W, tol=1e-3,
            mask_prob=0.3))
        timed(par_fn, params, batch, key)
        dt1, out = timed(par_fn, params, batch, jax.random.PRNGKey(1))
        dt2, _ = timed(par_fn, params, batch, jax.random.PRNGKey(2))
        wall = min(dt1, dt2)
        it = int(out[2]["iterations"])
        nfe = int(out[2]["nfe"])
        # agreement with the sequential trajectory at this tol
        err = float(np.abs(np.asarray(out[0]) - pos_seq).max())
        print(f"[{label}] ddim_parallel W={W} tol=1e-3: {wall:.3f} s "
              f"({seq_wall / wall:.2f}x vs sequential), sweeps={it}, "
              f"nfe={nfe}, max|dpos|={err:.3f} A", flush=True)


# Paper-scale config (checkpoint-compatible head layout).
if "--coarse" not in sys.argv:
    bench(
        ModelConfig(single_dim=512, pair_dim=64, num_blocks=4,
                    num_steps=200),
        "paper 512/64/4 h16x4",
    )

# Coarse warm start: sweep-count reduction (multi-chip latency projector).
def bench_coarse(cfg, label):
    model = ProteinReDiffModel(cfg)
    batch_np = _make_batch(n_atoms=34, n_res=110, bucket=192,
                           esm_dim=cfg.esm_dim)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, batch)
    for ci in (6, 12):
        fn = jax.jit(lambda p, b, k: sample_ddim_parallel(
            model, p, b, k, ddim_steps=S, window=8, tol=1e-3,
            mask_prob=0.3, coarse_init=ci))
        timed(fn, params, batch, key)
        dt, out = timed(fn, params, batch, jax.random.PRNGKey(1))
        print(f"[{label}] W=8 coarse_init={ci}: {dt:.3f} s, "
              f"sweeps={int(out[2]['iterations'])}, "
              f"nfe={int(out[2]['nfe'])}", flush=True)


if "--coarse" in sys.argv:
    bench_coarse(
        ModelConfig(single_dim=512, pair_dim=64, num_blocks=4,
                    num_steps=200),
        "paper h16x4",
    )
