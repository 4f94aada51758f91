"""Round-3 on-chip probes (run each subcommand in a FRESH process —
the Pallas K-chunk knobs are import-time, docs/SCALING.md).

Subcommands:
  trimul        d-minor vs d-major triangle-multiplication layout:
                per-op micro-bench + denoiser fwd, N=384/512, h16x4 and
                h64x1 (VERDICT r2 #1: the 0.78 ms vs ~0.2 ms roofline gap)
  k2048         forced fused-attention forward at N=2048 — compile-proof
                + timing of the grid-dimension K-chunked kernel
                (vs the 5540 ms chunk-128 fallback, BASELINE.md)
  f32_1024      forced-kernel forward at N=1024 with f32 activations
  flashbwd      train step at --bucket 768/1024, chunked vs forced
                kernel + flash backward (VERDICT r2 #3)
  attnbwd       standalone triangle-attention fwd+grad at --bucket N
                (R = N rows): CN K-chunked flash backward vs the
                query-chunked fallback's VJP. The FULL train step does
                not compile at N=2048 on one chip (either attention
                path — the pair stack's activations alone exceed HBM),
                so the 2048 backward is proven at the op level

Results -> BASELINE.md / resolve_attention_plan defaults.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from protein_redesign_tpu.utils.platform import apply_platform_override

apply_platform_override()  # PRD_PLATFORM=cpu for off-chip smoke runs

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig, TrainConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache
from protein_redesign_tpu.utils.flops import denoiser_forward_flops, mfu

BASE = ModelConfig(single_dim=512, pair_dim=64, num_blocks=4,
                   num_steps=1000)

_PARAMS_CACHE = {}


def timed_fetch(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return time.perf_counter() - t0, out


def shared_params(cfg):
    """Init once at a small bucket (params are N-independent); key on the
    dims that change the tree."""
    key = (cfg.single_dim, cfg.pair_dim, cfg.head_dim, cfg.num_heads,
           str(cfg.param_dtype))
    if key not in _PARAMS_CACHE:
        init_cfg = cfg.replace(attn_chunk=0, use_pallas=False,
                               pallas_auto_min_n=0)
        model = ProteinReDiffModel(init_cfg)
        b = {k: jnp.asarray(v)
             for k, v in _make_batch(32, 96, 128,
                                     esm_dim=cfg.esm_dim).items()}
        _PARAMS_CACHE[key] = model.init_params(jax.random.PRNGKey(0), b)
    return _PARAMS_CACHE[key]


def fwd_bench(cfg, bucket, n_res, iters, label):
    model = ProteinReDiffModel(cfg.replace(training_mode=False))
    b = {k: jnp.asarray(v)
         for k, v in _make_batch(32, n_res, bucket,
                                 esm_dim=cfg.esm_dim).items()}
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
        compiled = loop.lower(params, z0).compile()
        compile_s = time.perf_counter() - c0
        timed_fetch(compiled, params, z0)
        dt, _ = timed_fetch(compiled, params, z0)
        dt2, _ = timed_fetch(compiled, params, z0)
        per = min(dt, dt2) / iters
        # Analytic model FLOPs: HLO cost analysis counts the scan body
        # once, so compiled_flops(program)/iters is NOT per-step.
        fl = denoiser_forward_flops(cfg, B, N)
        # f32 matmuls run at half the v5e's bf16 peak (utils/flops.py).
        from protein_redesign_tpu.utils.flops import PEAK_FLOPS_V5E

        peak = PEAK_FLOPS_V5E / (2 if cfg.dtype == "float32" else 1)
        print(f"[{label}] fwd N={bucket}: {per*1e3:.2f} ms/step "
              f"({fl/1e9:.1f} GF -> MFU {mfu(fl, per, peak)*100:.1f}%; "
              f"compile {compile_s:.0f}s)", flush=True)
        return per
    except Exception as e:
        print(f"[{label}] fwd N={bucket}: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return None


def trimul_op_bench(dmajor, bucket, iters=30):
    """The TriangleMultiplication module alone, scanned."""
    from protein_redesign_tpu.models.denoiser import TriangleMultiplication

    D = 64
    mod = TriangleMultiplication("outgoing", dmajor=dmajor,
                                 dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    pair = jnp.asarray(rng.randn(1, bucket, bucket, D), jnp.float32)
    mask = jnp.ones((1, bucket), jnp.float32)
    mask2d = mask[:, :, None] * mask[:, None, :]
    params = mod.init(jax.random.PRNGKey(0), pair, mask2d)

    @jax.jit
    def loop(params, z0):
        def body(z, _):
            return z + 0.001 * mod.apply(params, z, mask2d), None
        z, _ = jax.lax.scan(body, z0, None, length=iters)
        return z

    compiled = loop.lower(params, pair).compile()
    timed_fetch(compiled, params, pair)
    dt, _ = timed_fetch(compiled, params, pair)
    dt2, _ = timed_fetch(compiled, params, pair)
    per = min(dt, dt2) / iters
    fl = float(12 * bucket**2 * D * D + 2 * D * bucket**3)
    lay = "dmajor" if dmajor else "dminor"
    print(f"[trimul-op {lay}] N={bucket}: {per*1e3:.3f} ms "
          f"({fl/1e9:.2f} GF -> MFU {mfu(fl, per)*100:.1f}%)", flush=True)


def dispatch_overhead():
    """Per-timed_fetch fixed cost (jit dispatch + tunnel RTT + host fetch)
    measured on a trivial program. The round-3/round-4 per-op tables were
    polluted by this: at iters=30 the ~25 ms axon RTT adds ~0.8 ms to
    every 'ms/call' — subtract it and amortize over many more iters."""
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0).lower(x).compile()
    timed_fetch(f, x)
    ts = [timed_fetch(f, x)[0] for _ in range(5)]
    return min(ts)


def module_bench(make_args, flops, label, iters=30, overhead_s=0.0):
    """One module scanned: state is the first argument; extra args are
    closed over. Returns s/call (minus the given fixed dispatch cost)."""
    mod, params, state0, extra = make_args()

    @jax.jit
    def loop(params, z0):
        def body(z, _):
            return z + 0.001 * mod.apply(params, z, *extra).astype(z.dtype), None
        z, _ = jax.lax.scan(body, z0, None, length=iters)
        return z

    compiled = loop.lower(params, state0).compile()
    timed_fetch(compiled, params, state0)
    dt, _ = timed_fetch(compiled, params, state0)
    dt2, _ = timed_fetch(compiled, params, state0)
    per = max(0.0, min(dt, dt2) - overhead_s) / iters
    print(f"[op {label}]: {per*1e3:.3f} ms/call "
          f"({flops/1e9:.2f} GF -> MFU {mfu(flops, per)*100:.1f}%)",
          flush=True)
    return per


def cmd_roofline(args):
    """Per-op timings at N=384/512, paper h16x4 bf16: where the denoiser
    step goes and what bounds each piece (BASELINE.md roofline table)."""
    from protein_redesign_tpu.models.denoiser import (
        OuterLinear,
        TriangleAttention,
        TriangleMultiplication,
    )
    from protein_redesign_tpu.models.layers import TransitionMLP

    D, S, H, C, tf = 64, 512, 4, 16, 4
    rng = np.random.RandomState(0)
    for N in (384, 512):
        pair = jnp.asarray(rng.randn(1, N, N, D), jnp.float32)
        single = jnp.asarray(rng.randn(1, N, S), jnp.float32)
        mask = jnp.ones((1, N), jnp.float32)
        mask2d = mask[:, :, None] * mask[:, None, :]

        def setup(mod, state, *extra):
            params = mod.init(jax.random.PRNGKey(0), state, *extra) \
                if extra else mod.init(jax.random.PRNGKey(0), state)
            return lambda: (mod, params, state, extra)

        tm_fl = 12 * N**2 * D * D + 2 * D * N**3
        module_bench(setup(
            TriangleMultiplication("outgoing", dtype=jnp.bfloat16),
            pair, mask2d), tm_fl, f"trimul N={N}")
        ta_fl = (10 * N**2 * D * H * C + 4 * H * C * N**3)
        for use_pallas, tag in ((False, "xla"), (True, "kernel")):
            module_bench(setup(
                TriangleAttention(C, H, "starting", use_pallas=use_pallas,
                                  dtype=jnp.bfloat16),
                pair, mask2d), ta_fl, f"tri-attn[{tag}] N={N}")
        ol_fl = 2 * N**2 * 2 * S * D
        # OuterLinear consumes single [1,N,S] and emits [1,N,N,D]: scan
        # over single, folding a reduced tile of the output back in so
        # each step depends on the previous (no constant folding).
        ol = OuterLinear(D, dtype=jnp.bfloat16)
        olp = ol.init(jax.random.PRNGKey(0), single)

        @jax.jit
        def ol_loop(params, s0):
            def body(s, _):
                upd = ol.apply(params, s)               # [1, N, N, D]
                fold = jnp.tile(upd.mean(axis=1), (1, 1, S // D))
                return s + 0.001 * fold.astype(s.dtype), None
            s, _ = jax.lax.scan(body, s0, None, length=20)
            return s

        compiled = ol_loop.lower(olp, single).compile()
        timed_fetch(compiled, olp, single)
        dt, _ = timed_fetch(compiled, olp, single)
        dt2, _ = timed_fetch(compiled, olp, single)
        per = min(dt, dt2) / 20
        print(f"[op outer_linear N={N}]: {per*1e3:.3f} ms/call "
              f"({ol_fl/1e9:.2f} GF -> MFU {mfu(ol_fl, per)*100:.1f}%)",
              flush=True)
        pf_fl = 4 * N**2 * D * D * tf
        module_bench(setup(
            TransitionMLP(D * tf, D, dtype=jnp.bfloat16), pair),
            pf_fl, f"pair-transition N={N}")


def cmd_rbsweep(args):
    """Full-key rows kernel row-block sweep (PRD_ROWS_RB, import-time —
    the chain runs each point in a fresh process): denoiser fwd at
    N=384/512 h16x4. Isolated-kernel MFU is ~3.4% (roofline probe);
    fewer/bigger programs may close some of the 4.7x gap to the
    C=16-format-bound SOL."""
    import protein_redesign_tpu.ops.pallas_attention as pa

    cfg = BASE.replace(use_pallas=True)
    tag = f"RB={pa._ROWS_RB_CAP}"
    fwd_bench(cfg, 384, 320, iters=20, label=f"rbsweep {tag}")
    fwd_bench(cfg, 512, 420, iters=12, label=f"rbsweep {tag}")


def cmd_serve2048(args):
    """End-to-end DDIM-50 segmented serving at N=2048 on the CN kernel
    (round-2 measured 276.7 s on chunk-128; projection ~82 s). 10
    segments keep each dispatch under the worker's ~1 min ceiling."""
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data

    model = ProteinReDiffModel(BASE.replace(training_mode=False))
    params = shared_params(BASE)
    runner = SamplingRunner(model, params, mask_prob=0.3, sampler="ddim",
                            ddim_steps=50, segments=10)
    mol = update_mol_positions(mol_from_smiles("CCO"), np.zeros((3, 3)))
    prot = protein_from_sequence("A" * 1900)
    data = {**ligand_to_data(mol),
            **protein_to_data(prot, esm_dim=BASE.esm_dim)}
    t0 = time.perf_counter()
    out = runner.run([data], jax.random.PRNGKey(0))
    cold = time.perf_counter() - t0
    assert np.isfinite(out[0][0]).all()
    t0 = time.perf_counter()
    runner.run([data], jax.random.PRNGKey(1))
    warm = time.perf_counter() - t0
    print(f"[serve2048] DDIM-50 segmented, N=2048: {warm:.1f} s "
          f"steady-state (cold incl. compile {cold:.1f} s)", flush=True)


def cmd_trimul(args):
    for bucket in (384, 512):
        for dm in (False, True):
            trimul_op_bench(dm, bucket)
    for cfg, tag in ((BASE, "h16x4"),
                     (BASE.replace(head_dim=64, num_heads=1,
                                   esm_dim=320), "h64x1")):
        for bucket, n_res, iters in ((384, 320, 20), (512, 420, 12)):
            for dm in (False, True):
                lay = "dmajor" if dm else "dminor"
                fwd_bench(cfg.replace(trimul_dmajor=dm), bucket, n_res,
                          iters, f"{tag} {lay}")


def cmd_k2048(args):
    cfg = BASE.replace(use_pallas=True)
    fwd_bench(cfg, 2048, 1800, iters=2, label="kernel-grid-kchunk")


def cmd_f32_1024(args):
    cfg = BASE.replace(use_pallas=True, dtype="float32")
    fwd_bench(cfg, 1024, 900, iters=3, label="kernel f32")


def outer_op_bench(factored, N, iters=20, S=512, D=64):
    """The OuterLinear module alone (same fold-back scan as the roofline
    probe so steps chain); MFU denominator is the REFERENCE math's FLOPs
    (4*N^2*S*D) for both variants — the factored path does half the
    arithmetic, so its 'MFU' is effective throughput on the op's math."""
    from protein_redesign_tpu.models.denoiser import OuterLinear

    rng = np.random.RandomState(0)
    single = jnp.asarray(rng.randn(1, N, S), jnp.float32)
    ol = OuterLinear(D, factored=factored, dtype=jnp.bfloat16)
    olp = ol.init(jax.random.PRNGKey(0), single)
    olp = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            np.random.RandomState(1).randn(*v.shape) * 0.02, v.dtype
        ), olp,
    )

    @jax.jit
    def loop(params, s0):
        def body(s, _):
            upd = ol.apply(params, s)               # [1, N, N, D]
            fold = jnp.tile(upd.mean(axis=1), (1, 1, S // D))
            return s + 0.001 * fold.astype(s.dtype), None
        s, _ = jax.lax.scan(body, s0, None, length=iters)
        return s

    tag = "factored" if factored else "default"
    ol_fl = 2 * N**2 * 2 * S * D
    try:
        compiled = loop.lower(olp, single).compile()
        timed_fetch(compiled, olp, single)
        dt, _ = timed_fetch(compiled, olp, single)
        dt2, _ = timed_fetch(compiled, olp, single)
        per = min(dt, dt2) / iters
        print(f"[op outer_linear {tag} N={N}]: {per*1e3:.3f} ms/call "
              f"({ol_fl/1e9:.2f} GF -> MFU {mfu(ol_fl, per)*100:.1f}%)",
              flush=True)
    except Exception as e:
        print(f"[op outer_linear {tag} N={N}]: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


def cmd_outerfac(args):
    """Factored OuterLinear (ModelConfig.outer_factored): op-level,
    end-to-end denoiser forward (h16x4 + h64x1), and a B=1 train step —
    the backward of the default concat path materializes d_feats
    [N,N,2S] too, so training should gain at least as much."""
    quick = getattr(args, "quick", False)
    op_ns = (128,) if quick else (384, 512)
    for N in op_ns:
        for fac in (False, True):
            outer_op_bench(fac, N, iters=2 if quick else 20)
    if quick:
        return
    for cfg, tag in ((BASE, "h16x4"),
                     (BASE.replace(head_dim=64, num_heads=1,
                                   esm_dim=320), "h64x1")):
        for bucket, n_res, iters in ((384, 320, 20), (512, 420, 12)):
            for fac in (False, True):
                lab = "outerfac" if fac else "default"
                fwd_bench(cfg.replace(outer_factored=fac), bucket, n_res,
                          iters, f"{tag} {lab}")
    # Train step, paper h16x4, B=1, bucket 384 (flash-bwd default plan).
    from protein_redesign_tpu.parallel.train_step import (
        make_train_state,
        make_train_step,
    )

    for fac in (False, True):
        cfg = BASE.replace(training_mode=True, outer_factored=fac)
        model = ProteinReDiffModel(cfg)
        b = {k: jnp.asarray(v)
             for k, v in _make_batch(32, 304, 384,
                                     esm_dim=cfg.esm_dim).items()}
        train_cfg = TrainConfig()
        tag = "outerfac" if fac else "default"
        iters = 6
        try:
            state = make_train_state(model, train_cfg,
                                     jax.random.PRNGKey(0), b)
            step = make_train_step(model, train_cfg)

            @jax.jit
            def loop(state, b, k):
                def body(s, i):
                    s2, metrics = step(s, b, jax.random.fold_in(k, i))
                    return s2, metrics["loss"]
                return jax.lax.scan(body, state, jnp.arange(iters))

            compiled = loop.lower(state, b, jax.random.PRNGKey(2)).compile()
            timed_fetch(compiled, state, b, jax.random.PRNGKey(2))
            d, _ = timed_fetch(compiled, state, b, jax.random.PRNGKey(3))
            d2, _ = timed_fetch(compiled, state, b, jax.random.PRNGKey(4))
            ms = min(d, d2) / iters * 1e3
            print(f"[train {tag}] B=1 bucket 384: {ms:.1f} ms/step "
                  f"({1e3/ms:.2f} steps/s/chip)", flush=True)
        except Exception as e:
            print(f"[train {tag}] bucket 384: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def cmd_flashbwd(args):
    from protein_redesign_tpu.parallel.train_step import (
        make_train_state,
        make_train_step,
    )

    bucket = args.bucket
    iters = 6 if bucket <= 768 else 3
    for forced, tag in ((False, "auto(chunked)"), (True, "kernel+flashbwd")):
        cfg = BASE.replace(training_mode=True, use_pallas=forced,
                           use_pallas_bwd=True)
        model = ProteinReDiffModel(cfg)
        b = {k: jnp.asarray(v)
             for k, v in _make_batch(32, bucket - 80, bucket,
                                     esm_dim=cfg.esm_dim).items()}
        train_cfg = TrainConfig()
        try:
            state = make_train_state(model, train_cfg,
                                     jax.random.PRNGKey(0), b)
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
            ms = min(d, d2) / iters * 1e3
            print(f"[train {tag}] B=1 bucket {bucket}: {ms:.1f} ms/step "
                  f"({1e3/ms:.2f} steps/s/chip; compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"[train {tag}] bucket {bucket}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def cmd_attnbwd(args):
    from protein_redesign_tpu.ops.chunked_attention import chunked_attention
    from protein_redesign_tpu.ops.pallas_attention import fused_attention

    N = args.bucket
    R, H, C = N, 4, 16
    iters = 3
    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret
    rng = np.random.RandomState(0)
    dt = jnp.float32 if getattr(args, "dtype", "bf16") == "f32" \
        else jnp.bfloat16
    q, k, v = (jnp.asarray(rng.randn(R, N, H, C), dt) for _ in range(3))
    mask = jnp.asarray((rng.rand(R, N) > 0.1).astype(np.float32))
    scale = 1.0 / np.sqrt(C)
    # fwd ~4, flash bwd ~7 more matmul-equivalents per (row, key) cell
    fl = 11 * R * H * N * N * C * 2 / 1e9  # GF per fwd+bwd

    def legs():
        yield "kernel+flashbwd", lambda q, k, v: fused_attention(
            q, k, v, mask, None, scale, interp, True)
        chunk = min(128, N)
        yield f"chunked({chunk})", lambda q, k, v: chunked_attention(
            q[None], k[None], v[None], mask[None], None, scale, chunk)

    for tag, attn in legs():
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32))

        grad = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def loop(q, k, v):
            def body(carry, _):
                dq, dk, dv = grad(*carry)
                return (carry[0] + 1e-6 * dq.astype(carry[0].dtype),
                        carry[1] + 1e-6 * dk.astype(carry[1].dtype),
                        carry[2] + 1e-6 * dv.astype(carry[2].dtype)), None
            out, _ = jax.lax.scan(body, (q, k, v), None, length=iters)
            return out[0]

        try:
            c0 = time.perf_counter()
            compiled = loop.lower(q, k, v).compile()
            compile_s = time.perf_counter() - c0
            timed_fetch(compiled, q, k, v)
            d, _ = timed_fetch(compiled, q, k, v)
            d2, _ = timed_fetch(compiled, q, k, v)
            ms = min(d, d2) / iters * 1e3
            print(f"[attnbwd {tag} {dt.__name__}] N={N}: "
                  f"{ms:.1f} ms/grad-step "
                  f"(~{fl/ms:.1f} TF/s; compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"[attnbwd {tag} {dt.__name__}] N={N}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("trimul")
    sub.add_parser("k2048")
    sub.add_parser("f32_1024")
    sub.add_parser("roofline")
    sub.add_parser("rbsweep")
    sub.add_parser("serve2048")
    fb = sub.add_parser("flashbwd")
    fb.add_argument("--bucket", type=int, default=768)
    ab = sub.add_parser("attnbwd")
    ab.add_argument("--bucket", type=int, default=2048)
    ab.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    of = sub.add_parser("outerfac")
    of.add_argument("--quick", action="store_true",
                    help="tiny CPU smoke (op legs only)")
    args = p.parse_args()
    enable_compilation_cache()
    {"trimul": cmd_trimul, "k2048": cmd_k2048,
     "f32_1024": cmd_f32_1024, "flashbwd": cmd_flashbwd,
     "roofline": cmd_roofline, "rbsweep": cmd_rbsweep,
     "serve2048": cmd_serve2048, "attnbwd": cmd_attnbwd,
     "outerfac": cmd_outerfac}[args.cmd](args)


if __name__ == "__main__":
    main()
