"""Round-4 on-chip probes (VERDICT r3 item 3: the h64x1 roofline).

The round-3 roofline table was h16x4-only and its conclusion ("C=16
format ceiling of 12.5%") does not transfer to the recommended h64x1
layout, where every per-head contraction is 64-wide (format ceiling 50%
of MXU) — yet BENCH_r03 measured only 16.9% fwd MFU at N=384. This
probe reproduces the per-op breakdown AT h64x1 and bounds each op two
ways:

- compute-SOL: analytic matmul FLOPs / (197 bf16-TF/s x the MXU format
  ceiling of the op's gemms, min(1, K/128) per contraction K)
- bandwidth-SOL: analytic minimum HBM traffic / 819 GB/s (v5e)

and prints which bound is binding, so the residual gap is attributed
(format / bandwidth / scheduling) per op rather than hand-waved.

Subcommands (fresh process each — Pallas knobs are import-time):
  roofline   per-op bench at h64x1, N=384 (and 512 with --wide)
  step       whole fwd + whole train step at h64x1 N=384/512,
             remat on/off — the MFU number VERDICT r3 wants >= 20%
  bf16pair   fwd + train step with the bf16 pair residual stream
             (ModelConfig.pair_stream_bf16) vs default, h64x1

Reference hot ops being modeled: `ProteinReDiff/modules.py:246-343`
(triangle ops, OuterLinear, transitions), `AF2_modules.py:613-627`.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from protein_redesign_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig, TrainConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache
from protein_redesign_tpu.utils.flops import PEAK_FLOPS_V5E, mfu

from r3_probes import (  # noqa: E402 (shares the probe harness)
    BASE,
    fwd_bench,
    module_bench,
    timed_fetch,
)

H64 = BASE.replace(head_dim=64, num_heads=1, esm_dim=320)
HBM_BW = 8.19e11  # v5e HBM ~819 GB/s


def sol_line(label, per_s, gemms, traffic_bytes):
    """gemms: list of (flops, contraction_K, out_width). Prints measured
    vs compute-SOL (format-ceiling-adjusted) vs bandwidth-SOL and names
    the binding constraint."""
    comp = 0.0
    fl = 0.0
    for flops, k, w in gemms:
        eff = min(1.0, k / 128.0) * min(1.0, max(w, 8) / 128.0)
        comp += flops / (PEAK_FLOPS_V5E * eff)
        fl += flops
    bw = traffic_bytes / HBM_BW
    bound = "compute" if comp >= bw else "bandwidth"
    sol = max(comp, bw)
    print(f"[sol {label}]: measured {per_s*1e3:.3f} ms | "
          f"compute-SOL {comp*1e3:.3f} ms | bw-SOL {bw*1e3:.3f} ms | "
          f"binding={bound} | headroom {per_s/sol:.2f}x | "
          f"MFU {mfu(fl, per_s)*100:.1f}%", flush=True)


def cmd_roofline(args):
    from protein_redesign_tpu.models.denoiser import (
        OuterLinear,
        TriangleAttention,
        TriangleMultiplication,
    )
    from protein_redesign_tpu.models.layers import TransitionMLP

    D, S, H, C, tf = 64, 512, 1, 64, 4
    HC = H * C
    rng = np.random.RandomState(0)
    ns = (384, 512) if args.wide else (384,)
    from r3_probes import dispatch_overhead
    ovh = dispatch_overhead()
    print(f"[harness]: dispatch+fetch overhead {ovh*1e3:.1f} ms "
          f"(subtracted; iters=400)", flush=True)
    ITERS = 400
    # --bf16io: pair stream in/out in bf16 (the pair_stream_bf16
    # regime) — re-attributes each op's bandwidth SOL under the halved
    # stream traffic measured as a whole-program win (bf16pair probe).
    sdt, sbytes = (jnp.bfloat16, 2) if args.bf16io else (jnp.float32, 4)
    for N in ns:
        N2, N3 = float(N) ** 2, float(N) ** 3
        pair = jnp.asarray(rng.randn(1, N, N, D), sdt)
        single = jnp.asarray(rng.randn(1, N, S), sdt)
        mask = jnp.ones((1, N), jnp.float32)
        mask2d = mask[:, :, None] * mask[:, None, :]

        def setup(mod, state, *extra):
            params = mod.init(jax.random.PRNGKey(0), state, *extra) \
                if extra else mod.init(jax.random.PRNGKey(0), state)
            return lambda: (mod, params, state, extra)

        # --- triangle multiplication (x2 per block) ---
        tm_fl = 12 * N2 * D * D + 2 * D * N3
        per = module_bench(setup(
            TriangleMultiplication("outgoing", dtype=jnp.bfloat16),
            pair, mask2d), tm_fl, f"trimul N={N}",
            iters=ITERS, overhead_s=ovh)
        sol_line(f"trimul N={N}", per,
                 [(8 * N2 * D * D, D, 4 * D),   # a/b + gates in-proj
                  (4 * N2 * D * D, D, D),       # out proj + out gate
                  (2 * D * N3, N, N)],          # the N-contraction einsum
                 traffic_bytes=9 * N2 * D * 2 + 2 * N2 * D * sbytes)

        # --- triangle attention (x2 per block), C=64 ---
        ta_fl = 10 * N2 * D * HC + 4 * HC * N3 + 2 * N2 * D * H
        for use_pallas, tag in ((True, "kernel"), (False, "xla")):
            per = module_bench(setup(
                TriangleAttention(C, H, "starting", use_pallas=use_pallas,
                                  dtype=jnp.bfloat16),
                pair, mask2d), ta_fl, f"tri-attn[{tag}] N={N}",
                iters=ITERS, overhead_s=ovh)
            sol_line(f"tri-attn[{tag}] N={N}", per,
                     [(8 * N2 * D * HC, D, HC),  # q,k,v,gate
                      (2 * HC * N3, C, N),       # logits (K=C)
                      (2 * HC * N3, N, C),       # AV (K=N)
                      (2 * N2 * HC * D, HC, D),  # out proj
                      (2 * N2 * D * H, D, H)],   # pair-bias proj
                     traffic_bytes=(2 + 8 + 2) * N2 * D * 2 + N2 * 4
                     + 2 * N2 * D * sbytes)

        # --- OuterLinear (x1 per block): factored vs concat ---
        ol_fl = 2 * N2 * (2 * S) * D
        for fac in (True, False):
            ol = OuterLinear(D, dtype=jnp.bfloat16, factored=fac)
            olp = ol.init(jax.random.PRNGKey(0), single)

            @jax.jit
            def ol_loop(params, s0):
                def body(s, _):
                    upd = ol.apply(params, s)
                    fold = jnp.tile(upd.mean(axis=1), (1, 1, S // D))
                    return s + 0.001 * fold.astype(s.dtype), None
                s, _ = jax.lax.scan(body, s0, None, length=400)
                return s

            compiled = ol_loop.lower(olp, single).compile()
            timed_fetch(compiled, olp, single)
            d1, _ = timed_fetch(compiled, olp, single)
            d2, _ = timed_fetch(compiled, olp, single)
            per = max(0.0, min(d1, d2) - ovh) / 400
            tag = "fac" if fac else "concat"
            print(f"[op outer_linear[{tag}] N={N}]: {per*1e3:.3f} ms",
                  flush=True)
            if fac:
                # Product half stays O(N^2 S D); difference half is O(N).
                sol_line(f"outer_linear[fac] N={N}", per,
                         [(2 * N2 * S * D, S, D), (4 * N * S * D, S, D)],
                         traffic_bytes=(N2 * D + N * S * D) * 2)
            else:
                sol_line(f"outer_linear[concat] N={N}", per,
                         [(ol_fl, 2 * S, D)],
                         traffic_bytes=(N2 * 2 * S + N2 * D) * 2)

        # --- pair transition (x1 per block) ---
        pf_fl = 4 * N2 * D * D * tf
        per = module_bench(setup(
            TransitionMLP(D * tf, D, dtype=jnp.bfloat16), pair),
            pf_fl, f"pair-transition N={N}", iters=ITERS, overhead_s=ovh)
        sol_line(f"pair-transition N={N}", per,
                 [(2 * N2 * D * D * tf, D, D * tf),
                  (2 * N2 * D * tf * D, D * tf, D)],
                 traffic_bytes=(2 + 2 * tf) * N2 * D * 2 + 2 * N2 * D * sbytes)

        # --- single-track transition (x1 per block; small) ---
        sf_fl = 4 * N * S * S * tf
        per = module_bench(setup(
            TransitionMLP(S * tf, S, dtype=jnp.bfloat16), single),
            sf_fl, f"single-transition N={N}", iters=ITERS, overhead_s=ovh)
        sol_line(f"single-transition N={N}", per,
                 [(2 * N * S * S * tf, S, S * tf),
                  (2 * N * S * tf * S, S * tf, S)],
                 traffic_bytes=(2 + 2 * tf) * N * S * 2)


def train_step_bench(cfg, bucket, n_res, iters, label):
    from protein_redesign_tpu.parallel.train_step import (
        make_train_state,
        make_train_step,
    )
    from protein_redesign_tpu.utils.flops import denoiser_forward_flops

    model = ProteinReDiffModel(cfg)
    b = {k: jnp.asarray(v)
         for k, v in _make_batch(32, n_res, bucket,
                                 esm_dim=cfg.esm_dim).items()}
    train_cfg = TrainConfig()
    try:
        state = make_train_state(model, train_cfg, jax.random.PRNGKey(0), b)
        step = make_train_step(model, train_cfg)

        @jax.jit
        def loop(state, b, k):
            def body(s, i):
                s2, metrics = step(s, b, jax.random.fold_in(k, i))
                return s2, metrics["loss"]
            return jax.lax.scan(body, state, jnp.arange(iters))

        c0 = time.perf_counter()
        compiled = loop.lower(state, b, jax.random.PRNGKey(2)).compile()
        compile_s = time.perf_counter() - c0
        timed_fetch(compiled, state, b, jax.random.PRNGKey(2))
        d, _ = timed_fetch(compiled, state, b, jax.random.PRNGKey(3))
        d2, _ = timed_fetch(compiled, state, b, jax.random.PRNGKey(4))
        per = min(d, d2) / iters
        # fwd + bwd ~= 3x fwd matmul FLOPs (standard convention).
        fl = 3 * denoiser_forward_flops(cfg, 1, bucket)
        print(f"[train {label}] B=1 bucket {bucket}: {per*1e3:.1f} ms/step "
              f"({1e3/(per*1e3):.2f} steps/s; 3xfwd {fl/1e9:.0f} GF -> "
              f"MFU {mfu(fl, per)*100:.1f}%; compile {compile_s:.0f}s)",
              flush=True)
        return per
    except Exception as e:
        print(f"[train {label}] bucket {bucket}: FAILED "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def cmd_step(args):
    for bucket, n_res in ((384, 304), (512, 420)):
        fwd_bench(H64, bucket, n_res, 20, "h64x1")
        for remat in (False, True):
            cfg = H64.replace(training_mode=True, remat=remat)
            train_step_bench(cfg, bucket, n_res, 6,
                             f"h64x1 remat={'on' if remat else 'off'}")


def cmd_stepkern(args):
    """Whole fwd + train step at h64x1 with the rows kernel FORCED
    (use_pallas=True), vs the auto plan (which currently excludes
    head_dim >= 32): the corrected op probes show the C=64 kernel core
    1.45x XLA at N=384 and 1.36x at N=512 — measure it at program level
    before flipping resolve_attention_plan."""
    for bucket, n_res in ((384, 304), (512, 420)):
        for kern, tag in ((False, "auto(xla)"), (True, "kernel")):
            cfg = H64.replace(use_pallas=kern)
            fwd_bench(cfg, bucket, n_res, 20, f"h64x1 {tag}")
        for kern, tag in ((False, "auto(xla)"), (True, "kernel")):
            cfg = H64.replace(training_mode=True, remat=False,
                              use_pallas=kern)
            train_step_bench(cfg, bucket, n_res, 6, f"h64x1 {tag}")


def cmd_bf16pair(args):
    """bf16 pair residual stream (the candidate h64x1 bandwidth lever):
    fwd + train step vs the f32-stream default. The 'combo' legs stack
    every independently-measured h64x1 lever — bf16 stream + forced
    rows kernel (the C>=64 plan-flip candidate) + fast_softmax (bf16
    kernel softmax, serving) — the whole-step MFU>=20% attempt
    (VERDICT r3 #3)."""
    for bucket, n_res in ((384, 304), (512, 420)):
        for bf16s, tag in ((False, "f32-stream"), (True, "bf16-stream")):
            cfg = H64.replace(pair_stream_bf16=bf16s)
            fwd_bench(cfg, bucket, n_res, 20, f"h64x1 {tag}")
        combo = H64.replace(pair_stream_bf16=True, use_pallas=True)
        fwd_bench(combo, bucket, n_res, 20, "h64x1 combo(bf16s+kern)")
        fwd_bench(combo.replace(fast_softmax=True), bucket, n_res, 20,
                  "h64x1 combo+fastsm")
        for bf16s, tag in ((False, "f32-stream"), (True, "bf16-stream")):
            cfg = H64.replace(training_mode=True, remat=False,
                              pair_stream_bf16=bf16s)
            train_step_bench(cfg, bucket, n_res, 6, f"h64x1 {tag}")
        combo_t = H64.replace(training_mode=True, remat=False,
                              pair_stream_bf16=True, use_pallas=True)
        train_step_bench(combo_t, bucket, n_res, 6,
                         "h64x1 combo(bf16s+kern)")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("roofline")
    r.add_argument("--wide", action="store_true")
    r.add_argument("--bf16io", action="store_true",
                   help="pair stream in/out in bf16 (pair_stream_bf16 "
                        "regime) — re-attributes the bandwidth SOLs")
    sub.add_parser("step")
    sub.add_parser("bf16pair")
    sub.add_parser("stepkern")
    args = p.parse_args()
    enable_compilation_cache()
    {"roofline": cmd_roofline, "step": cmd_step,
     "bf16pair": cmd_bf16pair, "stepkern": cmd_stepkern}[args.cmd](args)


if __name__ == "__main__":
    main()
