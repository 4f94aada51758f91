"""Long-context denoiser measurements on the real chip (N=768/1024).

For each (bucket, attn_chunk) config: paper-scale denoiser forward
ms/step via a scanned loop (one dispatch), peak-memory-safe thanks to the
query-chunked attention (`ops/chunked_attention.py`). attn_chunk=0 rows
document where the unchunked path stops fitting/fusing; Pallas rows show
whether the fused kernel pays at long N (it loses at paper N<=512,
BASELINE.md). Results -> BASELINE.md long-context table.

Usage (background task; remote compiles are 150-300 s per config):
    python benchmarks/longctx_bench.py [--buckets 768,1024]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache


def timed_fetch(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return time.perf_counter() - t0, out


_SHARED_PARAMS = None


def shared_params(cfg):
    """Denoiser params are independent of the complex axis N: init ONCE
    at a small bucket (the unchunked init at N=1024 would materialize
    the full [N,H,N,N] f32 attention logits and OOM the chip — the
    round-2 failure mode this replaces)."""
    global _SHARED_PARAMS
    if _SHARED_PARAMS is None:
        # Pin the init path: plain XLA attention at the small bucket,
        # independent of whichever row config calls first (a chunked
        # first-caller would pass an attn_chunk that does not divide 128).
        init_cfg = cfg.replace(
            attn_chunk=0, use_pallas=False, pallas_auto_min_n=0
        )
        model = ProteinReDiffModel(init_cfg)
        b_np = _make_batch(n_atoms=32, n_res=96, bucket=128,
                           esm_dim=cfg.esm_dim)
        b = {k: jnp.asarray(v) for k, v in b_np.items()}
        _SHARED_PARAMS = model.init_params(jax.random.PRNGKey(0), b)
    return _SHARED_PARAMS


def bench(cfg, bucket, n_res, iters=20, label=""):
    model = ProteinReDiffModel(cfg)
    b_np = _make_batch(n_atoms=32, n_res=n_res, bucket=bucket,
                       esm_dim=cfg.esm_dim)
    b = {k: jnp.asarray(v) for k, v in b_np.items()}
    B, N = b["residue_mask"].shape
    mask = b["atom_mask"] + b["residue_mask"]
    seq = jnp.zeros((B, N, 21))
    t = jnp.zeros((B,), jnp.int32)
    params = shared_params(cfg)

    @jax.jit
    def loop(params, z0):
        def body(z, _):
            noise_pred, _seq = model.apply(params, b, z, seq, mask, t)
            return z + 0.01 * noise_pred, None
        z, _ = jax.lax.scan(body, z0, None, length=iters)
        return z

    z0 = jnp.asarray(np.random.RandomState(0).randn(B, N, 3), jnp.float32)
    try:
        c0 = time.perf_counter()
        timed_fetch(loop, params, z0)
        compile_s = time.perf_counter() - c0
        dt, _ = timed_fetch(loop, params, z0)
        dt2, _ = timed_fetch(loop, params, z0)
        per = min(dt, dt2) / iters
        print(f"{label} N={bucket}: {per*1e3:.2f} ms/step "
              f"({1/per:.1f} steps/s/chip; compile {compile_s:.0f}s)",
              flush=True)
        return per
    except Exception as e:  # OOM rows are data, not failures
        print(f"{label} N={bucket}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return None


def bench_sample(cfg, bucket, n_res, label="", seg_steps=50):
    """End-to-end 1000-step DDPM sample wall-clock at a long-context
    bucket — the serving proof that the framework generates at 2-2.7x
    the reference's practical ceiling (`generate.py:125-128` warns above
    384 nodes). Uses the segmented sampling API (sample_init /
    sample_segment / sample_finish, <= seg_steps per dispatch): a
    single T-step program at these sizes exceeds the tunneled worker's
    ~1 min execution ceiling and hard-crashes it (BASELINE.md caveat) —
    segmentation is bit-identical and measured at zero overhead."""
    model = ProteinReDiffModel(cfg.replace(training_mode=False))
    b_np = _make_batch(n_atoms=32, n_res=n_res, bucket=bucket,
                       esm_dim=cfg.esm_dim)
    b = {k: jnp.asarray(v) for k, v in b_np.items()}
    params = shared_params(cfg)
    T = cfg.num_steps
    S = next(d for d in range(1, T + 1) if T % d == 0 and T // d <= seg_steps)
    L = T // S
    jit_init = jax.jit(
        lambda p, bb, k: model.sample_init(p, bb, k, mask_prob=0.3)
    )
    jit_seg = jax.jit(model.sample_segment)
    jit_fin = jax.jit(model.sample_finish)

    def run(key):
        prepared, carry = jit_init(params, b, key)
        k_scan = jax.random.split(key, 4)[3]
        ts = jnp.arange(T - 1, -1, -1)
        keys = jax.random.split(k_scan, T)
        for s in range(S):
            carry = jit_seg(params, prepared, carry,
                            ts[s * L:(s + 1) * L], keys[s * L:(s + 1) * L])
        out = jit_fin(prepared, carry)
        _ = float(out[0].sum())
        return out

    try:
        c0 = time.perf_counter()
        out = run(jax.random.PRNGKey(1))
        compile_s = time.perf_counter() - c0
        assert np.isfinite(np.asarray(out[0])).all()
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(2))
        dt = time.perf_counter() - t0
        print(f"{label} sample N={bucket}: {dt:.1f} s / {T} steps "
              f"({S} dispatches; compile {compile_s:.0f}s)", flush=True)
        return dt
    except Exception as e:
        print(f"{label} sample N={bucket}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return None


def bench_train(cfg, bucket, n_res, iters=10, label=""):
    """Train-step ms/step at a long-context bucket (B=1, remat, fwd+bwd+
    Adam+EMA in one jitted program): proves long-context TRAINING fits on
    one chip, not just inference — the chunked attention's per-chunk
    jax.checkpoint keeps the backward's live logits at one chunk."""
    from protein_redesign_tpu.config import TrainConfig
    from protein_redesign_tpu.parallel.train_step import (
        make_train_state,
        make_train_step,
    )

    model = ProteinReDiffModel(cfg.replace(training_mode=True))
    b_np = _make_batch(n_atoms=32, n_res=n_res, bucket=bucket,
                       esm_dim=cfg.esm_dim)
    b = {k: jnp.asarray(v) for k, v in b_np.items()}
    try:
        state = make_train_state(
            model, TrainConfig(), jax.random.PRNGKey(0), b
        )
        step = jax.jit(make_train_step(model, TrainConfig()))

        @jax.jit
        def loop(state):
            def body(s, i):
                s, m = step(s, b, jax.random.fold_in(jax.random.PRNGKey(1), i))
                return s, m["loss"]
            return jax.lax.scan(body, state, jnp.arange(iters))

        c0 = time.perf_counter()
        timed_fetch(loop, state)
        compile_s = time.perf_counter() - c0
        dt, (_, losses) = timed_fetch(loop, state)
        assert np.isfinite(np.asarray(losses)).all()
        per = dt / iters
        print(f"{label} train N={bucket}: {per*1e3:.0f} ms/step "
              f"(B=1; compile {compile_s:.0f}s)", flush=True)
        return per
    except Exception as e:
        print(f"{label} train N={bucket}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="768,1024")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sample_bucket", type=int, default=0,
                    help="also run a full 1000-step sample at this bucket "
                         "with the chunked attention path (0 = skip)")
    ap.add_argument("--sample_chunk", type=int, default=128,
                    help="attn_chunk used by BOTH the --sample_bucket and "
                         "--train_bucket rows")
    ap.add_argument("--train_bucket", type=int, default=0,
                    help="also time a B=1 train step at this bucket with "
                         "the chunked attention path (0 = skip)")
    args = ap.parse_args()
    enable_compilation_cache()
    base = ModelConfig(single_dim=512, pair_dim=64, num_blocks=4,
                       num_steps=1000)
    for bucket in [int(x) for x in args.buckets.split(",") if x.strip()]:
        n_res = bucket - 96
        for chunk in (0, 256, 128):
            # pallas_auto_min_n=0 pins the XLA path: chunk=0 must measure
            # the unchunked XLA lowering, not the auto-selected kernel.
            bench(base.replace(attn_chunk=chunk, pallas_auto_min_n=0),
                  bucket, n_res, iters=args.iters, label=f"chunk={chunk}")
        bench(base.replace(use_pallas=True), bucket, n_res,
              iters=args.iters, label="pallas")
        # Default config: proves resolve_use_pallas picks the kernel at
        # long context on real hardware (should match the pallas row).
        bench(base, bucket, n_res, iters=args.iters, label="auto(default)")
    if args.train_bucket:
        bench_train(
            base.replace(attn_chunk=args.sample_chunk),
            args.train_bucket, args.train_bucket - 96,
            label=f"chunk={args.sample_chunk}",
        )
    if args.sample_bucket:
        # Both rows run through the segmented API inside bench_sample
        # (single T-step programs at these sizes hard-crash the worker).
        bench_sample(
            base,
            args.sample_bucket, args.sample_bucket - 96,
            label="auto(default)",
        )
        bench_sample(
            base.replace(attn_chunk=args.sample_chunk),
            args.sample_bucket, args.sample_bucket - 96,
            label=f"chunk={args.sample_chunk}",
        )


if __name__ == "__main__":
    main()
