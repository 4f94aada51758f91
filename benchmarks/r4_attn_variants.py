"""C=64 (h64x1) rows-attention kernel variants, op-level (round 4).

The corrected r4 roofline shows tri-attention ~2.3-2.6x above its
compute-SOL at C=64 with BOTH the current kernel and XLA. Hypothesis:
the per-row f32 softmax (VPU) serializes against the two MXU gemms.
This probe times, at h64x1 N=384/512 (mask all-ones, the probe shape):

  xla        einsum reference (materialized logits)
  kern       the product kernel path (_rows_attention_impl)
  kern-bf16  local variant: logits+softmax in bf16 (packed VPU, half
             VMEM) — _attention_reference's fast_softmax semantics
  kern-nw    local variant: f32 softmax, no mask select (bounds the
             where() cost)
  kern-rbX   RB sweep of the f32 kernel (8 is the product default)

All timings subtract the measured dispatch floor and amortize over a
lax.scan of ITERS kernel calls. Run in a fresh process on the chip.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from protein_redesign_tpu.utils.platform import apply_platform_override

apply_platform_override()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from protein_redesign_tpu.ops.pallas_attention import (
    NEG_INF,
    _attention_reference,
    _rows_attention_impl,
)
from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache
from protein_redesign_tpu.utils.flops import PEAK_FLOPS_V5E

ITERS = 300


def timed_fetch(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return time.perf_counter() - t0, out


def dispatch_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0).lower(x).compile()
    timed_fetch(f, x)
    return min(timed_fetch(f, x)[0] for _ in range(5))


def make_variant_kernel(RB, softmax_dtype, use_mask):
    def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
        for b in range(RB):
            q = q_ref[b, 0]
            k = k_ref[b, 0]
            v = v_ref[b, 0]
            # MXU accumulators must be 32-bit; the softmax dtype applies
            # from the cast onward (bf16 = packed VPU exp/sum, half the
            # [N,N] VMEM).
            logits = jnp.dot(
                q, k.T, preferred_element_type=jnp.float32
            ).astype(softmax_dtype)
            if use_mask:
                mask = mask_ref[b, 0]
                logits = jnp.where(mask[None, :] < 0.5,
                                   jnp.asarray(NEG_INF, softmax_dtype),
                                   logits)
            probs = jax.nn.softmax(logits, axis=-1)
            out_ref[b, 0] = jnp.dot(
                probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)

    return kernel


def variant_call(qt, kt, vt, mask, RB, softmax_dtype, use_mask):
    R, H, N, C = qt.shape
    grid = (R // RB, H)
    spec_qkv = pl.BlockSpec(
        (RB, 1, N, C), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        make_variant_kernel(RB, softmax_dtype, use_mask),
        grid=grid,
        in_specs=[
            spec_qkv, spec_qkv, spec_qkv,
            pl.BlockSpec((RB, 1, N), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec_qkv,
        out_shape=jax.ShapeDtypeStruct((R, H, N, C), qt.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qt, kt, vt, mask[:, None, :])


def bench(label, fn, args, flops, ovh):
    @jax.jit
    def loop(q, k, v, m):
        def body(q, _):
            out = fn(q, k, v, m)
            return q + (0.001 * out).astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=ITERS)
        return q

    c = loop.lower(*args).compile()
    timed_fetch(c, *args)
    dt = min(timed_fetch(c, *args)[0] for _ in range(2))
    per = max(0.0, dt - ovh) / ITERS
    print(f"[attnvar {label}]: {per*1e3:.3f} ms/call "
          f"(MFU {flops/per/PEAK_FLOPS_V5E*100:.1f}%)", flush=True)
    return per


def main():
    enable_compilation_cache()
    ovh = dispatch_overhead()
    print(f"[harness]: overhead {ovh*1e3:.1f} ms; iters={ITERS}")
    rng = np.random.RandomState(0)
    for N in (384, 512):
        R, H, C = N, 1, 64  # one batch of tri-attn rows at h64x1
        qt = jnp.asarray(rng.randn(R, H, N, C), jnp.bfloat16) / 8
        kt = jnp.asarray(rng.randn(R, H, N, C), jnp.bfloat16) / 8
        vt = jnp.asarray(rng.randn(R, H, N, C), jnp.bfloat16)
        mask = jnp.ones((R, N), jnp.float32)
        fl = 4.0 * R * H * N * N * C
        args = (qt, kt, vt, mask)

        bench(f"xla N={N}", lambda q, k, v, m: _attention_reference(
            q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
            m, None, 1.0, False).swapaxes(1, 2), args, fl, ovh)
        bench(f"kern N={N}", lambda q, k, v, m: _rows_attention_impl(
            q, k, v, m, False), args, fl, ovh)
        for RB in (4, 8, 16):
            if R % RB:
                continue
            bench(f"kern-rb{RB} N={N}",
                  functools.partial(variant_call, RB=RB,
                                    softmax_dtype=jnp.float32,
                                    use_mask=True), args, fl, ovh)
        bench(f"kern-bf16 N={N}",
              functools.partial(variant_call, RB=8,
                                softmax_dtype=jnp.bfloat16,
                                use_mask=True), args, fl, ovh)
        bench(f"kern-nw N={N}",
              functools.partial(variant_call, RB=8,
                                softmax_dtype=jnp.float32,
                                use_mask=False), args, fl, ovh)
        # correctness spot-check of the bf16 variant vs reference
        ref = _attention_reference(
            qt.swapaxes(1, 2), kt.swapaxes(1, 2), vt.swapaxes(1, 2),
            mask, None, 1.0, False).swapaxes(1, 2)
        alt = variant_call(qt, kt, vt, mask, 8, jnp.bfloat16, True)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - alt.astype(jnp.float32))))
        print(f"[attnvar bf16-err N={N}]: max|diff| {err:.2e}")


if __name__ == "__main__":
    main()
