"""Fused LN -> Linear -> ReLU -> Linear transition kernel.

The denoiser's TransitionMLP (reference `modules.py:290-343` transition
sub-blocks: LN -> expand 4x -> ReLU -> contract) is bandwidth-bound on
the XLA path: the f32 LayerNorm copy and the 4x-expanded hidden
activations round-trip HBM (~6 passes over [*, N, N, D] per pair
transition). This kernel tiles the flattened row axis and keeps LN,
both matmuls and the ReLU in VMEM — HBM traffic drops to one read of x
and one write of the output.

Weights live in VMEM blocks (D=64 -> hidden=256 at paper scale: 48 KB
bf16 total), re-fetched per grid step; negligible next to the x tile.

Explicit opt-in via `ModelConfig.use_pallas_transition` (default off
until measured end-to-end on real hardware); the Denoiser disables it
under sequence parallelism (GSPMD cannot repartition a pallas_call).
Gradients recompute via the pure-JAX reference (custom_vjp), matching
the repo's other fused kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, cdt):
    x = x_ref[...].astype(jnp.float32)               # [TM, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xl = ((x - mu) * jax.lax.rsqrt(var + LN_EPS)).astype(cdt)
    h = jnp.dot(
        xl, w1_ref[...], preferred_element_type=jnp.float32
    ) + b1_ref[...]
    h = jnp.maximum(h, 0.0).astype(cdt)
    out = jnp.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32
    )
    if b2_ref is not None:
        out = out + b2_ref[...]
    out_ref[...] = out.astype(out_ref.dtype)


def _reference_impl(x, w1, b1, w2, b2):
    """Pure-JAX math of the TransitionMLP module path (backward oracle)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xl = ((xf - mu) * jax.lax.rsqrt(var + LN_EPS)).astype(dt)
    h = jax.nn.relu(xl @ w1.astype(dt) + b1.astype(dt))
    out = h @ w2.astype(dt)
    if b2 is not None:
        out = out + b2.astype(dt)
    return out


def _pick_tile(m: int) -> int:
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if m % t == 0:
            return t
    return m


def _fused_transition_impl(x, w1, b1, w2, b2, interpret):
    lead = x.shape[:-1]
    D = x.shape[-1]
    Hd = w1.shape[-1]
    Dout = w2.shape[-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, D)
    TM = _pick_tile(M)
    cdt = jnp.bfloat16 if not interpret else jnp.float32

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    args = [
        x2,
        w1.astype(cdt), b1.reshape(1, Hd).astype(jnp.float32),
        w2.astype(cdt),
    ]
    in_specs = [
        pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        wspec((D, Hd)), wspec((1, Hd)), wspec((Hd, Dout)),
    ]
    if b2 is not None:
        args.append(b2.reshape(1, Dout).astype(jnp.float32))
        in_specs.append(wspec((1, Dout)))
        kern = functools.partial(_kernel, cdt=cdt)
    else:
        def kern(x_ref, w1_ref, b1_ref, w2_ref, out_ref):
            _kernel(x_ref, w1_ref, b1_ref, w2_ref, None, out_ref, cdt=cdt)

    out = pl.pallas_call(
        kern,
        grid=(M // TM,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TM, Dout), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, Dout), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * Hd * (D + Dout),
            bytes_accessed=(M * D + M * Dout) * 2,
            transcendentals=0,
        ),
    )(*args)
    return out.reshape(lead + (Dout,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_transition(x, w1, b1, w2, b2, interpret: bool = False):
    """LN -> W1+b1 -> ReLU -> W2[+b2] as one kernel over flattened rows."""
    return _fused_transition_impl(x, w1, b1, w2, b2, interpret)


def _ft_fwd(x, w1, b1, w2, b2, interpret):
    return _fused_transition_impl(x, w1, b1, w2, b2, interpret), (
        x, w1, b1, w2, b2,
    )


def _ft_bwd(interpret, res, g):
    x, w1, b1, w2, b2 = res
    if b2 is None:
        _, vjp = jax.vjp(
            lambda x, w1, b1, w2: _reference_impl(x, w1, b1, w2, None),
            x, w1, b1, w2,
        )
        dx, dw1, db1, dw2 = vjp(g)
        return dx, dw1, db1, dw2, None
    _, vjp = jax.vjp(_reference_impl, x, w1, b1, w2, b2)
    return vjp(g)


fused_transition.defvjp(_ft_fwd, _ft_bwd)
