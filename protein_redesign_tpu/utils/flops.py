"""FLOP accounting and MFU (model FLOPs utilization) for the denoiser.

The perf bar ("match or beat the reference") needs a denominator: this
module supplies two, cross-checked against each other in
tests/test_flops.py:

- ``compiled_flops``: XLA's own count for the exact compiled program
  being timed (``Compiled.cost_analysis()['flops']``) — authoritative
  when the backend reports it.
- ``denoiser_forward_flops``: an analytic matmul-FLOP model of one
  denoiser forward (reference architecture: ``model.py:139-158`` dims,
  ``modules.py:290-343`` block structure), used as the fallback
  denominator when the backend's cost analysis is unavailable (and as
  the documentation of where the FLOPs are).

MFU convention: analytic/total FLOPs divided by (time x chip peak).
Peak for a v5e chip is 197 bf16 TFLOP/s (PEAK_FLOPS_V5E); programs that
run f32 matmuls on the MXU have half that peak, which callers can pass
explicitly.
"""

from __future__ import annotations

from typing import Optional

PEAK_FLOPS_V5E = 1.97e14  # bf16 peak, one v5e chip


def compiled_flops(compiled) -> Optional[float]:
    """XLA-reported FLOPs of a ``jax.stages.Compiled`` program, or None
    when the backend does not report a usable cost analysis (some PJRT
    plugins return nothing; a 0/negative count is also treated as
    unavailable)."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):  # older JAX returned [dict]
        ca = ca[0] if ca else None
    if not isinstance(ca, dict):
        return None
    flops = ca.get("flops", 0.0)
    return float(flops) if flops and flops > 0 else None


def mfu(flops: float, seconds: float,
        peak_flops: float = PEAK_FLOPS_V5E) -> float:
    """Fraction of chip peak achieved by `flops` of work in `seconds`.
    seconds <= 0 (an op benchmarked below the measurement floor) maps to
    inf rather than raising — probe harnesses print and move on."""
    if seconds <= 0:
        return float("inf")
    return flops / (seconds * peak_flops)


def denoiser_forward_flops(cfg, batch: int, n: int) -> float:
    """Analytic matmul FLOPs (2*M*N*K per dot) of ONE denoiser forward
    at padded complex size ``n`` — the O(N^2)/O(N^3) terms plus every
    projection with an N or N^2 leading extent. Elementwise/LayerNorm
    work is excluded (sub-percent at paper dims); so are the embedding
    and readout heads (vocab-sized, <2% at N>=128 — the cross-check test
    bounds the total error vs XLA's count).

    Matches the module structure in models/denoiser.py:
    OPM + SPAttention once, then per FoldingBlock the bias projection,
    single gated attention + transition, OuterLinear, two triangle
    multiplications, two triangle attentions, and the pair transition.
    """
    S = cfg.single_dim
    D = cfg.pair_dim
    H = cfg.num_heads
    C = cfg.head_dim
    tf = cfg.transition_factor
    HC = H * C
    N2 = float(n) ** 2
    N3 = float(n) ** 3

    # --- once per forward ---
    hid = S // 4  # OuterProductUpdate hidden (modules.py:372-374)
    opm = 2 * (2 * n * S * hid) + 2 * N2 * hid * D
    # SPAttention: per-head width is the FULL single_dim (parity quirk,
    # AF2_modules.py:369-473): q/k/v/gate project S -> H*S.
    spa = (
        2 * N2 * D * H            # pair-bias projection
        + 4 * (2 * n * S * H * S)  # q, k, v, gate
        + 2 * (2 * H * S * N2)     # logits + AV
        + 2 * n * H * S * S        # out projection
    )

    # --- per block ---
    single_attn = (
        4 * (2 * n * S * HC)       # q, k, v, gate
        + 2 * (2 * H * C * N2)     # logits + AV
        + 2 * n * HC * S           # out projection
    )
    single_fc = 2 * (2 * n * S * S * tf)
    outer_linear = 2 * N2 * (2 * S) * D
    trimul = 12 * N2 * D * D + 2 * D * N3
    tri_attn = (
        4 * (2 * N2 * D * HC)      # q, k, v, gate over every row
        + 2 * (2 * H * C * N3)     # logits + AV, N rows
        + 2 * N2 * HC * D          # out projection
    )
    pair_fc = 2 * (2 * N2 * D * D * tf)
    block = (
        2 * N2 * D * H             # attn_bias projection
        + single_attn + single_fc + outer_linear
        + 2 * trimul + 2 * tri_attn + pair_fc
    )
    return float(batch) * (opm + spa + cfg.num_blocks * block)
