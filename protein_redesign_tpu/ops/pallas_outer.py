"""Fused OuterLinear kernel.

The reference's pair update from single (`/root/reference/ProteinReDiff/
modules.py:277-287`) is ``Linear(cat[x_i*x_j, x_i-x_j])``. The XLA path
must materialize the concat features — [B, N, N, 2*single_dim] bf16 is
~302 MB at N=384 (vs a 19 MB output), so the op is pure HBM traffic.

Algebraic split: with W = [W1; W2] over the concat axis,

    out[i,j] = (x_i * x_j) @ W1 + u_i - u_j + bias,   u = x_ln @ W2

u is a tiny [B, N, pair_dim] tensor computed in XLA (f32). The kernel
tiles the i axis and keeps the j axis whole: per (b, i-tile) program it
holds x_ln rows and u in VMEM and emits the [TI, N, pair_dim] output
tile; the [N, 2D] product features exist only in VMEM one row at a
time. HBM traffic collapses from ~2 passes over [N, N, 2D] to one
output write.

Explicit opt-in via `ModelConfig.use_pallas_outer` (default off until
measured end-to-end on real hardware); the Denoiser disables it under
sequence parallelism (GSPMD cannot repartition a pallas_call).
Gradients recompute via the pure-JAX reference (custom_vjp), like the
repo's other fused kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _ln(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + LN_EPS)


def _reference_impl(x, w, b):
    """Module math oracle: LN -> cat[x_i*x_j, x_i-x_j] -> Dense."""
    dt = x.dtype
    xl = _ln(x).astype(dt)
    x_i = xl[..., :, None, :]
    x_j = xl[..., None, :, :]
    feats = jnp.concatenate([x_i * x_j, x_i - x_j], axis=-1)
    return feats @ w.astype(dt) + b.astype(dt)


def _make_kernel(TI: int, cdt):
    def kernel(xi_ref, xj_ref, ui_ref, uj_ref, w1_ref, b_ref, out_ref):
        xj = xj_ref[0]                        # [N, Din]
        uj = uj_ref[0]                        # [N, Dp] f32
        corr = b_ref[...] - uj                # [N, Dp]
        for i in range(TI):
            prod = xi_ref[0, i:i + 1, :] * xj  # [N, Din]
            o = jnp.dot(
                prod, w1_ref[...], preferred_element_type=jnp.float32
            )                                  # [N, Dp]
            out_ref[0, i] = (
                o + ui_ref[0, i:i + 1, :] + corr
            ).astype(out_ref.dtype)

    return kernel


def _fused_outer_impl(x, w, b, interpret):
    B, N, Din = x.shape
    Dp = w.shape[-1]
    cdt = jnp.bfloat16 if not interpret else jnp.float32
    xl32 = _ln(x)
    xl = xl32.astype(cdt)
    w1 = w[:Din].astype(cdt)
    w2 = w[Din:].astype(jnp.float32)
    u = jnp.einsum(
        "bnc,cd->bnd", xl32, w2, preferred_element_type=jnp.float32
    )
    TI = 8
    while N % TI != 0:
        TI //= 2
    kernel = _make_kernel(TI, cdt)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda b_, i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        grid=(B, N // TI),
        in_specs=[
            pl.BlockSpec((1, TI, Din), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Din), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TI, Dp), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((Din, Dp)), wspec((1, Dp)),
        ],
        out_specs=pl.BlockSpec(
            (1, TI, N, Dp), lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, N, Dp), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * Din * Dp,
            bytes_accessed=B * N * N * Dp * 2,
            transcendentals=0,
        ),
    )(xl, xl, u, u, w1, b.reshape(1, Dp).astype(jnp.float32))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_outer_linear(x, w, b, interpret: bool = False):
    """LN -> Linear(cat[x_i*x_j, x_i-x_j]) as one kernel (+XLA LN/u)."""
    return _fused_outer_impl(x, w, b, interpret)


def _fo_fwd(x, w, b, interpret):
    return _fused_outer_impl(x, w, b, interpret), (x, w, b)


def _fo_bwd(interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(_reference_impl, x, w, b)
    return vjp(g)


fused_outer_linear.defvjp(_fo_fwd, _fo_bwd)
