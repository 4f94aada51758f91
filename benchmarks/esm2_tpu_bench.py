"""ESM-2 650M embedder throughput on one TPU chip (JAX backend).

The reference computes ESM-2 650M embeddings with torch on a CUDA host
(`/root/reference/generate.py:41-44`); this framework can run the same
architecture on the TPU itself (`models/esm2.py`, `--esm_backend jax`).
Real weights are not downloadable in this environment, so the
measurement uses RANDOM weights at the exact 650M architecture
(33 layers / 1280 hidden / 20 heads / 5120 FFN) — identical compute
graph, hence identical throughput.

Measures per-sequence latency at chain lengths {128, 256, 512} (bucketed
as the JaxESM2 wrapper pads), f32 vs bf16 compute.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from protein_redesign_tpu.models.esm2 import (
    ESM2Config,
    esm2_forward,
    esm2_random_params,
)


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out.sum())
    return time.perf_counter() - t0


for dtype in ("bfloat16", "float32"):
    cfg = ESM2Config(dtype=dtype)  # 650M defaults
    params = jax.device_put(
        esm2_random_params(jax.random.PRNGKey(0), cfg)
    )
    fwd = jax.jit(lambda p, ids, m: esm2_forward(p, cfg, ids, m))
    for L in (128, 256, 512):
        ids = np.full((1, L), 7, np.int32)
        ids[0, 0] = 0
        ids[0, -1] = 2
        mask = np.ones((1, L), np.int32)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        timed(fwd, params, ids, mask)  # compile
        d1 = timed(fwd, params, ids, mask)
        d2 = timed(fwd, params, ids, mask)
        print(f"esm2-650M {dtype} L={L}: {min(d1, d2) * 1e3:.1f} ms/seq",
              flush=True)
