"""Fused triangle-multiplication Pallas kernel.

The reference's O(N^3) hot op (`/root/reference/ProteinReDiff/modules.py:
246-274`) is LN -> proj*sigmoid(gate) -> triangle einsum -> LN ->
out_proj*sigmoid(out_gate). The XLA path materializes the gated [N,N,2D]
activations, the f32 [N,N,D] product, and its normed copy in HBM — at
paper scale (N=384, D=64) that makes the op bandwidth-bound at ~4x its
roofline (BASELINE.md component breakdown, docs/ROADMAP.md #1).

This kernel fuses the WHOLE op: each (i, j) output tile loops over k
tiles, recomputing the LayerNorm + gated projections of the needed pair
blocks in VMEM (recompute is ~free; the op is bandwidth-bound), and
accumulates the triangle product in a [D, TI, TJ] f32 scratch so the MXU
sees D-leading batched [TI,TK]x[TK,TJ] matmuls. The epilogue (product
LayerNorm over D, out-projection, sigmoid gate from the (i, j) pair
block) runs entirely in registers/VMEM; only the final [TI,TJ,D] tile is
written to HBM. HBM traffic drops from ~7 full passes over [N,N,*] to
one pair read per k-tile + one output write.

MEASURED OUTCOME (v5e, 2026-08, BASELINE.md): correct but SLOWER than
XLA — 2.3x end-to-end at N=384 (74.7 vs 32.6 ms denoiser fwd). Mosaic
cannot lower lane-splitting reshapes or 2D x 3D contractions, which
forces (a) row-major projection + per-step [TI,TK,D]->[D,TI,TK]
transposes and (b) the D-batched product as 64 small matmuls per grid
step; XLA's native batched-gemm lowering of the same einsum wins at
pair_dim 64. `use_pallas_trimul` therefore defaults OFF; the kernel is
kept as a tested, differentiable reference for future Mosaic versions
(the constraints, not the fusion idea, are the bottleneck).

Gradients: `triangle_multiply` is a jax.custom_vjp whose backward pass
differentiates the pure-JAX reference implementation (`_reference_impl`)
— the kernel accelerates nothing today but trains correctly if enabled.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _ln_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    """Non-affine LayerNorm over the last dim, f32 (torch eps 1e-5)."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS)


def _project_dlead(x_ln, w_gate, b_gate, w_proj, b_proj, m, cdt):
    """sigmoid(gate)*proj*mask in D-LEADING layout.

    x_ln: [R, C, Din] f32; weights [Din, D]; biases [1, D]; m: [R, C].
    Returns [D, R, C] — batch-leading for the MXU triangle dot. Mosaic
    constraint: only major-collapsing reshapes and plain 2D matmuls are
    lowerable here, so project in row-major [R*C, Din] then transpose.
    """
    R, C, Din = x_ln.shape
    x2 = x_ln.astype(cdt).reshape(R * C, Din)
    g = jnp.dot(
        x2, w_gate, preferred_element_type=jnp.float32
    ) + b_gate
    p = jnp.dot(
        x2, w_proj, preferred_element_type=jnp.float32
    ) + b_proj
    a = jax.nn.sigmoid(g) * p * m.reshape(R * C, 1).astype(jnp.float32)
    return jnp.transpose(a.astype(cdt).reshape(R, C, -1), (2, 0, 1))


def _trimul_kernel(
    pa_ref, pb_ref, pij_ref, ma_ref, mb_ref,
    wga_ref, bga_ref, wpa_ref, bpa_ref,
    wgb_ref, bgb_ref, wpb_ref, bpb_ref,
    wog_ref, bog_ref, wop_ref, bop_ref,
    out_ref, acc_ref, *, mode: str, out_dtype, cdt,
):
    k = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mask blocks ride a trailing singleton dim ([B,N,N,1] at the wrapper)
    # so Mosaic's lane-alignment rule sees a full last dim and the k-tile
    # splits the 8-aligned sublane dim instead.
    ma = ma_ref[0, :, :, 0]
    mb = mb_ref[0, :, :, 0]

    # Gated projections of the two pair blocks, D-leading.
    a = _project_dlead(
        _ln_lastdim(pa_ref[0]), wga_ref[...], bga_ref[...],
        wpa_ref[...], bpa_ref[...], ma, cdt,
    )
    b = _project_dlead(
        _ln_lastdim(pb_ref[0]), wgb_ref[...], bgb_ref[...],
        wpb_ref[...], bpb_ref[...], mb, cdt,
    )
    if mode == "outgoing":
        # a: [D, TI, TK], b: [D, TJ, TK]; contract TK -> [D, TI, TJ]
        dn = (((2,), (2,)), ((0,), (0,)))
    else:
        # a: [D, TK, TI], b: [D, TK, TJ]; contract TK -> [D, TI, TJ]
        dn = (((1,), (1,)), ((0,), (0,)))
    acc_ref[...] += jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        prod = acc_ref[...]  # [D, TI, TJ] f32
        mu = jnp.mean(prod, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(prod - mu), axis=0, keepdims=True)
        normed = (prod - mu) * jax.lax.rsqrt(var + LN_EPS)
        D, TI, TJ = normed.shape
        n2 = jnp.transpose(normed.astype(cdt), (1, 2, 0)).reshape(
            TI * TJ, D
        )
        core = jnp.dot(
            n2, wop_ref[...], preferred_element_type=jnp.float32
        ) + bop_ref[...]
        gin = _ln_lastdim(pij_ref[0]).astype(cdt).reshape(TI * TJ, -1)
        gate = jax.nn.sigmoid(
            jnp.dot(gin, wog_ref[...], preferred_element_type=jnp.float32)
            + bog_ref[...]
        )
        out_ref[0] = (gate * core).reshape(TI, TJ, -1).astype(out_dtype)


def _pick_tile(n: int) -> int:
    # 64 (not 128): the epilogue's [TI*TJ, D] f32 temporaries must fit the
    # 16 MB VMEM stack alongside the accumulator and pipelined blocks —
    # measured 36 MB at TI=128 (compile-time scoped-vmem OOM).
    if n % 64 == 0:
        return 64
    return n  # tiny test shapes: one tile


def fused_triangle_multiply(
    pair: jnp.ndarray,       # [B, N, N, D]
    mask_2d: jnp.ndarray,    # [B, N, N]
    params: Dict[str, jnp.ndarray],
    mode: str,
    interpret: bool = None,
) -> jnp.ndarray:
    """Forward-only fused kernel. params: kernels [D, *] / biases [*]
    named {ab_gate,ab_proj,out_gate,out_proj}_{kernel,bias}."""
    assert mode in ("outgoing", "incoming")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Interpret mode runs on CPU, whose dot thunk lacks bf16 x bf16 -> f32.
    cdt = jnp.float32 if interpret else jnp.bfloat16
    B, N, _, D = pair.shape
    TI = _pick_tile(N)
    TK = TI
    grid = (B, N // TI, N // TI, N // TK)

    wdt = cdt
    wg = params["ab_gate_kernel"].astype(wdt)    # [D, 2D]
    wp = params["ab_proj_kernel"].astype(wdt)
    bg = params["ab_gate_bias"].astype(jnp.float32)
    bp = params["ab_proj_bias"].astype(jnp.float32)
    wga, wgb = wg[:, :D], wg[:, D:]
    wpa, wpb = wp[:, :D], wp[:, D:]
    bga, bgb = bg[:D].reshape(1, D), bg[D:].reshape(1, D)
    bpa, bpb = bp[:D].reshape(1, D), bp[D:].reshape(1, D)
    wog = params["out_gate_kernel"].astype(wdt)  # [D, D]
    wop = params["out_proj_kernel"].astype(wdt)
    bog = params["out_gate_bias"].astype(jnp.float32).reshape(1, D)
    bop = params["out_proj_bias"].astype(jnp.float32).reshape(1, D)

    if mode == "outgoing":
        # out[i,j] = sum_k f(pair[i,k]) * g(pair[j,k])
        a_map = lambda b, i, j, k: (b, i, k, 0)
        b_map = lambda b, i, j, k: (b, j, k, 0)
        a_blk = (1, TI, TK, D)
    else:
        # out[i,j] = sum_k f(pair[k,i]) * g(pair[k,j])
        a_map = lambda b, i, j, k: (b, k, i, 0)
        b_map = lambda b, i, j, k: (b, k, j, 0)
        a_blk = (1, TK, TI, D)
    # Mask blocks mirror the pair blocks' (row, col) tiling, with a
    # trailing singleton for lane alignment (see _trimul_kernel).
    ma_map = lambda b, i, j, k: a_map(b, i, j, k)
    mb_map = lambda b, i, j, k: b_map(b, i, j, k)
    m_blk = a_blk[:-1] + (1,)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda b, i, j, k: (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _trimul_kernel, mode=mode, out_dtype=pair.dtype, cdt=cdt
    )
    flops = 2 * B * N * N * N * D
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(a_blk, a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(a_blk, b_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, TI, TI, D), lambda b, i, j, k: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(m_blk, ma_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(m_blk, mb_map, memory_space=pltpu.VMEM),
            wspec((D, D)), wspec((1, D)), wspec((D, D)), wspec((1, D)),
            wspec((D, D)), wspec((1, D)), wspec((D, D)), wspec((1, D)),
            wspec((D, D)), wspec((1, D)), wspec((D, D)), wspec((1, D)),
        ],
        out_specs=pl.BlockSpec(
            (1, TI, TI, D), lambda b, i, j, k: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, N, D), pair.dtype),
        scratch_shapes=[pltpu.VMEM((D, TI, TI), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * N * N * N * D // TI * 2 + B * N * N * D * 4,
            transcendentals=2 * B * N * N * D,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pair, pair, pair, mask_2d[..., None], mask_2d[..., None],
        wga, bga, wpa, bpa, wgb, bgb, wpb, bpb, wog, bog, wop, bop,
    )


def _reference_impl(pair, mask_2d, params, mode):
    """Pure-JAX reference of the module math (bf16 compute, f32 product) —
    used for the custom_vjp backward and as the numeric oracle in tests."""
    D = pair.shape[-1]
    dt = pair.dtype
    x = _ln_lastdim(pair).astype(dt)
    gate = jax.nn.sigmoid(
        x @ params["ab_gate_kernel"].astype(dt)
        + params["ab_gate_bias"].astype(dt)
    )
    proj = x @ params["ab_proj_kernel"].astype(dt) + params[
        "ab_proj_bias"
    ].astype(dt)
    ab = mask_2d[..., None].astype(dt) * gate * proj
    a, b = ab[..., :D], ab[..., D:]
    if mode == "outgoing":
        prod = jnp.einsum(
            "...ikd,...jkd->...ijd", a, b, preferred_element_type=jnp.float32
        )
    else:
        prod = jnp.einsum(
            "...kid,...kjd->...ijd", a, b, preferred_element_type=jnp.float32
        )
    normed = _ln_lastdim(prod).astype(dt)
    out_gate = jax.nn.sigmoid(
        x @ params["out_gate_kernel"].astype(dt)
        + params["out_gate_bias"].astype(dt)
    )
    out = out_gate * (
        normed @ params["out_proj_kernel"].astype(dt)
        + params["out_proj_bias"].astype(dt)
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def triangle_multiply(pair, mask_2d, params, mode):
    """Fused forward (Pallas) with reference-math backward."""
    return fused_triangle_multiply(pair, mask_2d, params, mode)


def _tm_fwd(pair, mask_2d, params, mode):
    return triangle_multiply(pair, mask_2d, params, mode), (
        pair, mask_2d, params,
    )


def _tm_bwd(mode, res, g):
    pair, mask_2d, params = res
    _, vjp = jax.vjp(
        lambda p, m, w: _reference_impl(p, m, w, mode), pair, mask_2d, params
    )
    return vjp(g)


triangle_multiply.defvjp(_tm_fwd, _tm_bwd)
