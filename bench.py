"""Benchmark harness.

Headline metric (BASELINE.md): end-to-end 1000-step diffusion sample
wall-clock for a 110-residue protein + drug-like ligand (~144 nodes,
bucket 192) at paper scale (single_dim 512, pair_dim 64, num_blocks 4 —
reference README.md:147-160), on one TPU chip.

North star (BASELINE.json): < 60 s on a v5e-8. vs_baseline = 60 / measured
(>1 means faster than the target). The reference publishes no numbers of
its own (SURVEY.md §6), so this harness *establishes* the baseline.

Timing notes: the per-call host<->TPU dispatch latency over the axon tunnel
is ~25 ms, so all measurements time a single jitted program (the scan-based
sampler / a scanned forward loop) and force materialization with a host
fetch before stopping the clock.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra measurements go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

NUM_STEPS = 1000
NORTH_STAR_S = 60.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_fetch(fn, *args):
    """Run fn and stop the clock only after a host fetch of the output."""
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return time.perf_counter() - t0, out


def bench_forward(model, params, bucket, n_res, iters=50, label=""):
    """Denoiser forward steps/sec/chip via an iters-long scanned loop
    (one dispatch; each step consumes the previous step's output).
    Reports MFU with XLA's own FLOP count for the timed program when
    the backend provides one (the analytic model otherwise) — the
    denominator the 'match or beat' perf bar needs (utils/flops.py)."""
    from protein_redesign_tpu.utils.flops import (
        compiled_flops,
        denoiser_forward_flops,
        mfu,
    )

    b_np = _make_batch(n_atoms=32, n_res=n_res, bucket=bucket,
                       esm_dim=model.cfg.esm_dim)
    b = {k: jnp.asarray(v) for k, v in b_np.items()}
    B, N = b["residue_mask"].shape
    mask = b["atom_mask"] + b["residue_mask"]
    seq = jnp.zeros((B, N, 21))
    t = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def loop(params, z0):
        def body(z, _):
            noise_pred, _seq = model.apply(params, b, z, seq, mask, t)
            return z + 0.01 * noise_pred, None
        z, _ = jax.lax.scan(body, z0, None, length=iters)
        return z

    z0 = jnp.asarray(np.random.RandomState(0).randn(B, N, 3), jnp.float32)
    compiled = loop.lower(params, z0).compile()
    timed_fetch(compiled, params, z0)  # warm
    dt, _ = timed_fetch(compiled, params, z0)
    dt2, _ = timed_fetch(compiled, params, z0)
    per_step = min(dt, dt2) / iters
    # MFU denominator: the analytic MODEL FLOPs (the convention — what
    # the math requires, not what the compiler emitted). XLA's count of
    # the same program is logged as a cross-check; HLO cost analysis
    # counts a while/scan body ONCE, so it approximates one step.
    flops = denoiser_forward_flops(model.cfg, B, N)
    xla_fl = compiled_flops(compiled)
    util = mfu(flops, per_step)
    xla_note = f", xla {xla_fl/1e9:.1f}" if xla_fl else ""
    log(f"denoiser fwd [{label or 'default'}] N={bucket}: "
        f"{per_step*1e3:.2f} ms/step ({1/per_step:.1f} steps/s/chip; "
        f"{flops/1e9:.1f} GFLOP/step{xla_note} -> MFU {util*100:.1f}%)")
    return per_step, flops, util


def wait_for_tpu(deadline_s=None):
    """Bounded wait for the tunneled TPU relay (observed down for hours,
    CLAUDE.md): probe a tiny matmul in a SUBPROCESS (a hung in-process
    backend init cannot be cancelled) every 60 s until it succeeds or
    the deadline passes. Returns True when the device answered. Override
    the deadline with PRD_TPU_WAIT_S (0 = skip waiting)."""
    import os
    import subprocess

    if deadline_s is None:
        # default raised 1200 -> 3600: relay outages of 2-5+ h observed
        # (CLAUDE.md); an hour of waiting triples the chance the
        # end-of-round bench lands on a live relay.
        deadline_s = float(os.environ.get("PRD_TPU_WAIT_S", 3600))
    if deadline_s <= 0:
        return True  # skip waiting entirely; attempt the bench directly
    probe = ("import jax; x = jax.numpy.ones((8, 8));"
             "print(float((x @ x).sum()))")
    t0 = time.monotonic()
    while True:
        try:
            # 420 s probe budget: ABOVE the 150-300 s remote-compile
            # ceiling (CLAUDE.md) — killing a probe mid-compile would
            # poison the tunnel grant for ~15 min and livelock the wait
            # against a healthy-but-slow relay.
            rc = subprocess.run(
                [sys.executable, "-c", probe], timeout=420,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        waited = time.monotonic() - t0
        if waited >= deadline_s:
            log(f"TPU relay still unreachable after {waited:.0f} s "
                f"(probe rc={rc}); giving up")
            return False
        log(f"TPU relay not ready (probe rc={rc}, {waited:.0f} s "
            f"elapsed); retrying in 60 s")
        time.sleep(60)


def main():
    from protein_redesign_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    if not wait_for_tpu():
        print(json.dumps({
            "metric": "sample_1000step_wallclock_192nodes",
            "value": -1.0,
            "unit": "s",
            "vs_baseline": 0.0,
            "error": "tpu_relay_unreachable",
        }))
        raise SystemExit(2)
    enable_compilation_cache()
    cfg = ModelConfig(
        single_dim=512, pair_dim=64, num_blocks=4, num_steps=NUM_STEPS
    )
    model = ProteinReDiffModel(cfg)

    batch_np = _make_batch(n_atoms=34, n_res=110, bucket=192,
                           esm_dim=cfg.esm_dim)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, batch)

    mfu_rows = {}
    for bucket, n_res in ((128, 96), (256, 200), (384, 320), (512, 420)):
        _, _, util = bench_forward(model, params, bucket, n_res,
                                   label="h16x4 auto")
        mfu_rows[f"h16x4_N{bucket}"] = round(util, 4)

    # --- head_dim data points (docs/SCALING.md: the 16-wide per-head
    # contraction uses 12.5% of the 128-wide MXU). Two labeled variants:
    # h64x4 (4x attention FLOPs at the checkpoint head count) and h64x1
    # (the RECOMMENDED new-training layout, ~2x faster than h16x4).
    cfg_h64x4 = cfg.replace(head_dim=64)
    model_h64x4 = ProteinReDiffModel(cfg_h64x4)
    params_h64x4 = model_h64x4.init_params(key, batch)
    _, _, u = bench_forward(model_h64x4, params_h64x4, 384, 320,
                            label="h64x4")
    mfu_rows["h64x4_N384"] = round(u, 4)
    del params_h64x4
    cfg_h64x1 = cfg.replace(head_dim=64, num_heads=1)
    model_h64x1 = ProteinReDiffModel(cfg_h64x1)
    params_h64x1 = model_h64x1.init_params(key, batch)
    _, _, u = bench_forward(model_h64x1, params_h64x1, 384, 320,
                            label="h64x1")
    mfu_rows["h64x1_N384"] = round(u, 4)
    # N=512: the round-4 wide-head plan flip engages the rows kernel
    # here (1.13x whole-fwd over XLA, r4_probes stepkern).
    _, _, u = bench_forward(model_h64x1, params_h64x1, 512, 420,
                            label="h64x1")
    mfu_rows["h64x1_N512"] = round(u, 4)
    # Best-known serving stack (round 4): bf16 pair residual stream
    # (numerics lever, opt-in pending quality validation) — under it the
    # kernel also engages at N=384 (BASELINE.md round-4 lever table).
    model_bf16s = ProteinReDiffModel(
        cfg_h64x1.replace(pair_stream_bf16=True)
    )
    _, _, u = bench_forward(model_bf16s, params_h64x1, 384, 320,
                            label="h64x1 bf16-stream")
    mfu_rows["h64x1_N384_bf16stream"] = round(u, 4)
    _, _, u = bench_forward(model_bf16s, params_h64x1, 512, 420,
                            label="h64x1 bf16-stream")
    mfu_rows["h64x1_N512_bf16stream"] = round(u, 4)

    # --- PARITY row: full 1000-step sample wall-clock (one jitted scan)
    # at the reference-checkpoint layout (h16x4) and parity-mode
    # numerics (f32 softmax, f32 pair stream). Retained as the
    # format-bound baseline; the HEADLINE below tracks the best-known
    # serving stack (VERDICT r4 #6).
    sample = jax.jit(lambda p, b, k: model.sample(p, b, k, mask_prob=0.3))
    dt, out = timed_fetch(sample, params, batch, key)
    log(f"sample (compile+run): {dt:.1f} s")
    assert np.isfinite(np.asarray(out[0])).all()
    dt1, _ = timed_fetch(sample, params, batch, jax.random.PRNGKey(1))
    dt2, _ = timed_fetch(sample, params, batch, jax.random.PRNGKey(2))
    parity_wall = min(dt1, dt2)
    log(f"sample {NUM_STEPS} steps steady-state [h16x4 parity]: "
        f"{parity_wall:.2f} s ({parity_wall / NUM_STEPS * 1e3:.2f} ms/step)")

    # --- secondary: h16x4 + fast_softmax (bf16 attention probabilities;
    # the round-3 1.61x serving lever on the XLA path). Guarded: a
    # failed secondary must not cost the headline.
    fdt = None
    try:
        fast_model = ProteinReDiffModel(cfg.replace(fast_softmax=True))
        fast_sample = jax.jit(
            lambda p, b, k: fast_model.sample(p, b, k, mask_prob=0.3)
        )
        timed_fetch(fast_sample, params, batch, key)  # compile
        fdt, _ = timed_fetch(fast_sample, params, batch,
                             jax.random.PRNGKey(3))
        log(f"sample {NUM_STEPS} steps (h16x4 --fast_softmax): "
            f"{fdt:.2f} s ({parity_wall / fdt:.2f}x)")
    except Exception as e:  # pragma: no cover - device-side resilience
        log(f"fast_softmax leg FAILED {type(e).__name__}: {str(e)[:200]}")
    del params

    # --- HEADLINE: best-known serving stack (VERDICT r4 #6) — h64x1
    # layout (the recommended new-training layout) + bf16 pair stream +
    # fast_softmax + auto kernel plan, same bucket-192 workload.
    # DDPM-1000 is the tracked value; DDIM-50 is the low-latency row.
    # Guarded: if a serving leg dies (compile OOM, relay drop), the
    # parity row becomes the reported value — one JSON line either way.
    best_wall = ddt = None
    try:
        cfg_serve = cfg_h64x1.replace(
            pair_stream_bf16=True, fast_softmax=True, training_mode=False,
        )
        model_serve = ProteinReDiffModel(cfg_serve)
        serve_sample = jax.jit(
            lambda p, b, k: model_serve.sample(p, b, k, mask_prob=0.3)
        )
        timed_fetch(serve_sample, params_h64x1, batch, key)  # compile
        sdt1, _ = timed_fetch(serve_sample, params_h64x1, batch,
                              jax.random.PRNGKey(4))
        sdt2, _ = timed_fetch(serve_sample, params_h64x1, batch,
                              jax.random.PRNGKey(5))
        best_wall = min(sdt1, sdt2)
        log(f"sample {NUM_STEPS} steps [BEST h64x1 bf16-stream fast]: "
            f"{best_wall:.2f} s ({best_wall / NUM_STEPS * 1e3:.2f} ms/step; "
            f"{parity_wall / best_wall:.2f}x vs parity row)")

        ddim_sample = jax.jit(
            lambda p, b, k: model_serve.sample_ddim(p, b, k, ddim_steps=50)
        )
        timed_fetch(ddim_sample, params_h64x1, batch, key)  # compile
        ddt, _ = timed_fetch(ddim_sample, params_h64x1, batch,
                             jax.random.PRNGKey(6))
        log(f"sample DDIM-50 [BEST serving stack]: {ddt:.3f} s "
            f"({ddt / 50 * 1e3:.2f} ms/step)")
    except Exception as e:  # pragma: no cover - device-side resilience
        log(f"serving-stack leg FAILED {type(e).__name__}: {str(e)[:200]}")

    value = best_wall if best_wall is not None else parity_wall
    serving = {}
    if best_wall is not None:
        serving["h64x1_bf16stream_fast_ddpm1000_s"] = round(best_wall, 3)
    if ddt is not None:
        serving["h64x1_bf16stream_fast_ddim50_s"] = round(ddt, 3)
    if fdt is not None:
        serving["h16x4_fast_softmax_ddpm1000_s"] = round(fdt, 3)
    print(json.dumps({
        "metric": "sample_1000step_wallclock_192nodes_best",
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(NORTH_STAR_S / value, 3),
        "parity_h16x4_s": round(parity_wall, 3),
        "serving": serving,
        "mfu": mfu_rows,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # pragma: no cover - device-side resilience
        # The tunneled relay drops live connections mid-compile
        # (measured round 5: four drops in one session; one killed a
        # bench run inside init_params, before any guarded leg). Every
        # program compiled before the drop is already in the persistent
        # cache, so one fresh-process retry typically completes in a
        # fraction of the first attempt. SystemExit (relay-unreachable
        # after the full wait) is deliberately not caught.
        import os

        if os.environ.get("PRD_BENCH_REEXEC") != "1":
            log(f"bench attempt failed ({type(e).__name__}: "
                f"{str(e)[:200]}); re-exec once on the warm cache")
            os.environ["PRD_BENCH_REEXEC"] = "1"
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
