"""Parallel-in-time diffusion sampling (Picard / ParaDiGMS-style).

The reference's sampler is strictly sequential: ``num_steps`` (up to 2000)
Python-loop denoiser forwards, one after another
(`/root/reference/ProteinReDiff/model.py:403-420`). Beyond re-designing
that loop as a single `lax.scan` (`prdiff.py:sample*`), this module breaks
the *sequential dependency itself*: a sliding-window Picard fixed-point
iteration over the DDIM trajectory evaluates the denoiser at many
timesteps simultaneously — trading parallel FLOPs (extra chips, or a
single chip's unused batch dimension) for wall-clock latency. Technique:
"Parallel Sampling of Diffusion Models" (Shih et al., 2023) /
"Accelerating Parallel Sampling of Diffusion Models" (PAPERS.md),
re-derived here for the joint coordinate+sequence state.

Math. With ``a_i = alphas_cumprod[tau_i]`` and the change of variables
``y_i = z_i / sqrt(a_i)``, ``gamma_i = sqrt((1 - a_i) / a_i)``, the
deterministic (eta=0) DDIM coordinate update is the explicit sum

    y_{i+1} = y_i + (gamma_{i+1} - gamma_i) * eps(z_i, seq_i, tau_i)

(equivalent to `prdiff.py:sample_ddim`'s x0/direction form: divide that
update by sqrt(a_{i+1}); remove_mean is a mathematical no-op because the
equivariant readout already returns mean-free eps and z_0 is mean-free).
The sequence state is the reference's "last prediction wins" recurrence
``seq_{i+1} = softmax(seq_pred_i)*2 - 1`` (`model.py:414`). A window of W
candidate states is evaluated in ONE batched (vmapped) denoiser call —
on a mesh the window axis is sharded over 'data' — the trajectory is
rebuilt by a cumulative sum of drift increments, and the window slides
past every point whose value stopped changing (masked mean-square change
in z- and seq-space <= tol^2). Sliding is guaranteed to make progress:
the entry right after the window start is recomputed from a converged
state, so it is exact after at most two visits. tol=0 therefore still
terminates and reproduces the sequential DDIM trajectory exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import nanometre_to_angstrom, remove_mean

Batch = Dict[str, jnp.ndarray]


def _ddim_time_tables(cfg, S: int):
    """Host-side numpy time tables shared by both Picard samplers:
    (taus_np [S], a_np [S+1] f64 with the x0 endpoint appended,
    gamma_np [S+1] f32). Recomputed from the schedule's own numpy source
    (`get_betas`) so they stay compile-time constants even under jit
    (the jnp schedule pytree becomes a tracer there); the f32 round-trip
    matches `sched.alphas_cumprod`'s stored values exactly."""
    from .diffusion import get_betas
    from .prdiff import ddim_taus_np

    taus_np = ddim_taus_np(cfg.num_steps, S)
    acp_np = np.cumprod(
        1.0 - get_betas(cfg.num_steps, cfg.diffusion_schedule)
    ).astype(np.float32)
    a_np = np.concatenate([acp_np[taus_np], [1.0]]).astype(np.float64)
    gamma_np = np.sqrt((1.0 - a_np) / a_np).astype(np.float32)
    return taus_np, a_np, gamma_np


def _window_sharding(mesh, W: int):
    """NamedSharding placing the Picard window on the mesh 'data' axis,
    warning when the window shards unevenly (per-sweep latency then
    matches the next multiple of the chip count)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    d_size = mesh.shape["data"]
    if W % d_size:
        import warnings

        warnings.warn(
            f"ddim_parallel window={W} is not a multiple of the mesh "
            f"data axis ({d_size}); the window shards unevenly and "
            f"per-sweep latency matches the next multiple "
            f"({-(-W // d_size) * d_size}) — pick window as a multiple "
            "of the chip count."
        )
    return NamedSharding(mesh, P("data"))


def sample_ddim_parallel(
    model,
    params: Any,
    batch: Batch,
    key: jax.Array,
    ddim_steps: int = 50,
    window: int = 8,
    tol: float = 1e-3,
    mask_prob: Optional[float] = None,
    mesh=None,
    coarse_init: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Deterministic DDIM sampling with window-parallel Picard iteration.

    Same contract as ``model.sample_ddim(..., eta=0)`` — identical key
    handling, so the same ``key`` yields the same initialization and, as
    ``tol -> 0``, the same trajectory. Returns (positions [B,N,3] in
    Angstrom, residue-masked seq logits [B,N,21], stats) where stats has
    ``iterations`` (Picard sweeps) and ``nfe`` (total denoiser
    evaluations; the sequential sampler's nfe is ``ddim_steps``).

    ``window``: timesteps evaluated per sweep. On a ('data','model') mesh
    the window axis is sharded over 'data' (use a multiple of the data
    axis size); single-chip, it fills the batch dimension the O(N^3)
    denoiser leaves idle at B=1 (BASELINE.md batch study).

    ``coarse_init``: > 0 warm-starts the Picard iteration from a cheap
    ``coarse_init``-step sequential DDIM solve on a sub-grid of the fine
    trajectory, extended to fine indices by gamma-linear extrapolation of
    each segment's drift ("Accelerating Parallel Sampling of Diffusion
    Models", PAPERS.md) — typically far fewer sweeps than the constant
    init, at the price of ``coarse_init`` extra sequential evaluations.
    The fixed point (and the tol=0 exactness guarantee) is unchanged.
    """
    cfg = model.cfg
    if int(window) < 1:
        raise ValueError(
            f"window must be >= 1, got {window} (an empty Picard window "
            "evaluates nothing and would return the init noise)"
        )
    if int(ddim_steps) < 1:
        raise ValueError(f"ddim_steps must be >= 1, got {ddim_steps}")
    if cfg.seq_reverse != "reference":
        raise NotImplementedError(
            "ddim_parallel implements the reference sequence recurrence; "
            "seq_reverse='ancestral' is only available on the sequential "
            "samplers (model.sample / model.sample_ddim)"
        )
    if cfg.self_cond:
        raise NotImplementedError(
            "ddim_parallel cannot run with self_cond: self-conditioning "
            "threads the previous step's x0-hat through the scan carry, "
            "which makes each step's denoiser input depend on the "
            "sequential predecessor — the Picard window's step map must "
            "be a function of (z_t, t) alone. Sample self-conditioned "
            "checkpoints with model.sample / model.sample_ddim"
        )
    if cfg.seq_process == "absorbing":
        if cfg.reveal_temperature > 0.0 or cfg.reveal_conf_noise > 0.0:
            raise NotImplementedError(
                "ddim_parallel with seq_process='absorbing' requires the "
                "deterministic reveal (reveal_temperature=0, "
                "reveal_conf_noise=0): the Picard fixed point is only "
                "well-defined for a deterministic step map"
            )
        if coarse_init > 0:
            raise NotImplementedError(
                "coarse_init warm starts are implemented for the gaussian "
                "sequence channel (extending a coarse commitment "
                "trajectory to fine indices has no exact analogue)"
            )
        return _sample_absorbing_parallel(
            model, params, batch, key, int(ddim_steps), int(window),
            tol, mask_prob, mesh,
        )
    S = int(ddim_steps)
    W = int(window)

    # --- identical init path to sample_ddim (prdiff.py) ------------------
    k_prep, k_z, k_seq, _k_scan = jax.random.split(key, 4)
    batch = model.prepare_batch(
        batch, k_prep, training=False, mask_prob=mask_prob
    )
    x = batch["x"]
    mask = batch["residue_and_atom_mask"]
    residue_mask = batch["residue_mask"]
    seq = batch["residue_one_hot"]
    extra = batch["residue_extra_mask"][..., None]
    inv = batch["residue_inv_extra_mask"][..., None]
    B = x.shape[0]

    z0 = remove_mean(jax.random.normal(k_z, x.shape, x.dtype), mask)
    s0 = remove_mean(
        jax.random.normal(k_seq, seq.shape, seq.dtype), residue_mask
    )
    s0 = extra * seq + inv * s0

    # y-space tables over trajectory indices 0..S (index S = x0 endpoint,
    # alpha_bar := 1, gamma := 0, so y_S = z_S) — see _ddim_time_tables.
    taus_np, a_np, gamma_np = _ddim_time_tables(cfg, S)
    taus = jnp.asarray(taus_np)
    gamma = jnp.asarray(gamma_np)
    dgamma = gamma[1:] - gamma[:-1]                     # [S]
    sqrt_a = jnp.asarray(np.sqrt(a_np), jnp.float32)    # [S+1]

    def eval_one_(z, sq, t_scalar):
        t = jnp.broadcast_to(t_scalar, (B,))
        return model.apply(params, batch, z, sq, mask, t)

    # --- buffers (padded by W so window writes never clip) ---------------
    SP = S + W
    y0 = z0 / sqrt_a[0]
    if coarse_init > 0:
        C = min(int(coarse_init), S)
        # Static sub-grid of fine trajectory indices 0 = c_0 < ... < c_C = S.
        cpts = np.unique(
            np.round(np.linspace(0, S, C + 1)).astype(np.int32)
        )
        C = len(cpts) - 1

        def cstep(carry, seg):
            y, sq = carry
            i0, dg = seg
            eps, seqp = eval_one_(
                sqrt_a[i0] * y, sq, taus[i0]
            )
            y1 = y + dg * eps
            sq1 = jax.nn.softmax(seqp, axis=-1) * 2.0 - 1.0
            return (y1, sq1), (eps, sq)

        seg_dg = jnp.asarray(
            gamma_np[cpts[1:]] - gamma_np[cpts[:-1]], jnp.float32
        )
        (_, _), (eps_c, sq_c) = jax.lax.scan(
            cstep, (y0, s0), (jnp.asarray(cpts[:-1]), seg_dg)
        )
        # Fine index i lives in segment seg(i); its warm start follows the
        # segment's (constant-eps) drift from the segment start. Exact at
        # every coarse point by construction.
        fine = np.arange(SP + 1)
        seg = np.clip(
            np.searchsorted(cpts, np.minimum(fine, S), side="right") - 1,
            0, C - 1,
        )
        gmi = jnp.asarray(
            gamma_np[np.minimum(fine, S)] - gamma_np[cpts[seg]], jnp.float32
        )
        # y at segment starts: y_c[j] = y0 + sum of earlier segment drifts.
        y_starts = jnp.concatenate(
            [y0[None],
             y0[None] + jnp.cumsum(
                 seg_dg[:, None, None, None] * eps_c, axis=0
             )[:-1]],
            axis=0,
        )                                              # [C, B, N, 3]
        segj = jnp.asarray(seg)
        y_buf = (
            jnp.take(y_starts, segj, axis=0)
            + gmi[:, None, None, None] * jnp.take(eps_c, segj, axis=0)
        )
        seq_buf = jnp.take(sq_c, segj, axis=0)
        nfe0 = jnp.asarray(C, jnp.int32)
    else:
        y_buf = jnp.broadcast_to(y0[None], (SP + 1, *z0.shape))
        seq_buf = jnp.broadcast_to(s0[None], (SP + 1, *s0.shape))
        nfe0 = jnp.asarray(0, jnp.int32)
    # Raw seq_pred logits produced by the evaluation feeding each index
    # (the reference returns the LAST raw prediction, `model.py:421-422`).
    logit_buf = jnp.zeros((SP + 1, *s0.shape), s0.dtype)

    idx_eval_max = S - 1
    mask_sum = jnp.maximum(jnp.sum(mask), 1.0)
    rmask_sum = jnp.maximum(jnp.sum(residue_mask), 1.0)
    tol2 = jnp.asarray(tol, jnp.float32) ** 2

    if mesh is not None:
        win_sharding = _window_sharding(mesh, W)

    # NOTE: the window indexing / y-cumsum rebuild / convergence-slide
    # scaffolding below is mirrored in _sample_absorbing_parallel (only
    # the sequence channel differs) — keep the two bodies in lockstep.
    def body(carry):
        y_buf, seq_buf, logit_buf, s, iters, nfe = carry
        offs = jnp.arange(W)
        idx = s + offs                                   # eval indices
        valid = (idx <= idx_eval_max)
        idx_c = jnp.minimum(idx, idx_eval_max)

        ys = jnp.take(y_buf, idx_c, axis=0)              # [W,B,N,3]
        seqs = jnp.take(seq_buf, idx_c, axis=0)          # [W,B,N,21]
        zs = sqrt_a[idx_c][:, None, None, None] * ys
        if mesh is not None:
            zs = jax.lax.with_sharding_constraint(zs, win_sharding)
            seqs = jax.lax.with_sharding_constraint(seqs, win_sharding)
        eps, seqp = jax.vmap(eval_one_)(zs, seqs, taus[idx_c])

        # Trajectory rebuild: cumulative drift from the converged y[s].
        vmaskf = valid.astype(jnp.float32)[:, None, None, None]
        inc = dgamma[idx_c][:, None, None, None] * eps * vmaskf
        y_new = y_buf[s][None] + jnp.cumsum(inc, axis=0)      # -> idx s+1..s+W
        seq_new = jax.nn.softmax(seqp, axis=-1) * 2.0 - 1.0   # -> idx+1
        seq_new = jnp.where(vmaskf > 0, seq_new, jnp.take(
            seq_buf, jnp.minimum(idx + 1, SP), axis=0))
        logit_new = jnp.where(vmaskf > 0, seqp, jnp.take(
            logit_buf, jnp.minimum(idx + 1, SP), axis=0))

        # Masked mean-square change per window position, z- and seq-space.
        y_old = jax.lax.dynamic_slice_in_dim(y_buf, s + 1, W, axis=0)
        seq_old = jax.lax.dynamic_slice_in_dim(seq_buf, s + 1, W, axis=0)
        sa_next = sqrt_a[jnp.minimum(idx + 1, S)][:, None, None, None]
        dz2 = jnp.square(sa_next * (y_new - y_old))
        err_z = jnp.sum(
            mask[None, ..., None] * dz2, axis=(1, 2, 3)
        ) / (3.0 * mask_sum)
        ds2 = jnp.square(seq_new - seq_old)
        err_s = jnp.sum(
            residue_mask[None, ..., None] * ds2, axis=(1, 2, 3)
        ) / (21.0 * rmask_sum)
        ok = jnp.where(valid, jnp.maximum(err_z, err_s) <= tol2, True)
        h = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))   # leading-ok run

        y_buf = jax.lax.dynamic_update_slice_in_dim(y_buf, y_new, s + 1, 0)
        seq_buf = jax.lax.dynamic_update_slice_in_dim(
            seq_buf, seq_new, s + 1, 0
        )
        logit_buf = jax.lax.dynamic_update_slice_in_dim(
            logit_buf, logit_new, s + 1, 0
        )
        return (
            y_buf, seq_buf, logit_buf,
            jnp.minimum(s + h, S),
            iters + 1,
            nfe + jnp.sum(valid.astype(jnp.int32)),
        )

    def cond(carry):
        _, _, _, s, iters, _ = carry
        # 2S sweeps suffice (each index is exact after <= 2 visits); the
        # bound is a safety net against fp-degenerate tol settings.
        return (s < S) & (iters < 2 * S + 2)

    init = (
        y_buf, seq_buf, logit_buf,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        nfe0,
    )
    y_buf, seq_buf, logit_buf, s, iters, nfe = jax.lax.while_loop(
        cond, body, init
    )

    z_final = y_buf[S]  # sqrt_a[S] == 1
    pos = nanometre_to_angstrom(z_final)
    stats = {"iterations": iters, "nfe": nfe}
    return pos, residue_mask[..., None] * logit_buf[S], stats


def _sample_absorbing_parallel(
    model, params, batch, key, S, W, tol, mask_prob, mesh,
):
    """Picard iteration for the absorbing sequence process
    (`prdiff.py:_ddim_absorbing_step_fn` parallelized in time).

    The coordinate channel is the same y-space drift as the gaussian
    path (eta=0 DDIM). The sequence channel is the sticky
    confidence-ranked reveal: commitments at index i+1 are a
    DETERMINISTIC function of (logits_i, commitments_i) when
    reveal_temperature == reveal_conf_noise == 0 (enforced by the
    caller), so each sweep re-derives the whole window's commitment
    trajectory with a cheap `lax.scan` over `_reveal_update` (no model
    evals) seeded from the exact state at the window start — the same
    two-visit exactness argument as the gaussian path applies, and
    tol=0 reproduces `model.sample_ddim` exactly.

    Convergence is measured on the coordinate change (z-space, as in the
    gaussian path) joined with the committed-one-hot change: a single
    commitment flip at any window position contributes ~1/num_residues
    to the masked mean square, far above any practical tol^2."""
    cfg = model.cfg
    # sample_init validates this for the sequential samplers; an invalid
    # value would otherwise silently fall back to the linear curve inside
    # `_reveal_update`'s static branch.
    if cfg.reveal_schedule not in ("linear", "cosine"):
        raise ValueError(
            f"reveal_schedule must be 'linear' or 'cosine', "
            f"got {cfg.reveal_schedule!r}"
        )

    # --- identical init path to sample_ddim / sample_init ----------------
    k_prep, k_z, _k_seq, _k_scan = jax.random.split(key, 4)
    batch = model.prepare_batch(
        batch, k_prep, training=False, mask_prob=mask_prob
    )
    x = batch["x"]
    mask = batch["residue_and_atom_mask"]
    residue_mask = batch["residue_mask"]
    B = x.shape[0]
    z0 = remove_mean(jax.random.normal(k_z, x.shape, x.dtype), mask)
    seq_known, inv2 = model._absorbing_known_and_designable(batch)
    n_inv = jnp.sum(inv2, axis=-1, keepdims=True)

    taus_np, a_np, gamma_np = _ddim_time_tables(cfg, S)
    taus = jnp.asarray(taus_np)
    gamma = jnp.asarray(gamma_np)
    dgamma = gamma[1:] - gamma[:-1]                     # [S]
    sqrt_a = jnp.asarray(np.sqrt(a_np), jnp.float32)    # [S+1]
    # Reveal target times: the current tau at each index, except the
    # LAST index which evaluates at t=0 whatever the grid (must commit
    # every remaining position — `_ddim_absorbing_step_fn`).
    t_reveal_np = taus_np.copy()
    t_reveal_np[-1] = 0
    t_reveal = jnp.asarray(t_reveal_np)

    def eval_one_(z, sq, t_scalar):
        t = jnp.broadcast_to(t_scalar, (B,))
        return model.apply(params, batch, z, sq, mask, t)

    SP = S + W
    y0 = z0 / sqrt_a[0]
    y_buf = jnp.broadcast_to(y0[None], (SP + 1, *z0.shape))
    cm_buf = jnp.zeros((SP + 1, *inv2.shape), jnp.float32)
    co_buf = jnp.zeros((SP + 1, *seq_known.shape), jnp.float32)
    # Keys are dead under the deterministic reveal (static Python
    # branches in `_reveal_update` never touch them) but the signature
    # requires them.
    dead_key = jax.random.PRNGKey(0)

    idx_eval_max = S - 1
    mask_sum = jnp.maximum(jnp.sum(mask), 1.0)
    rmask_sum = jnp.maximum(jnp.sum(residue_mask), 1.0)
    tol2 = jnp.asarray(tol, jnp.float32) ** 2

    if mesh is not None:
        win_sharding = _window_sharding(mesh, W)

    # NOTE: mirrors sample_ddim_parallel's loop scaffolding (window
    # indexing, y-cumsum rebuild, convergence-slide) — keep in lockstep.
    def body(carry):
        y_buf, cm_buf, co_buf, s, iters, nfe = carry
        offs = jnp.arange(W)
        idx = s + offs
        valid = (idx <= idx_eval_max)
        idx_c = jnp.minimum(idx, idx_eval_max)

        ys = jnp.take(y_buf, idx_c, axis=0)              # [W,B,N,3]
        cos = jnp.take(co_buf, idx_c, axis=0)            # [W,B,N,21]
        zs = sqrt_a[idx_c][:, None, None, None] * ys
        seqs = seq_known[None] + cos
        if mesh is not None:
            zs = jax.lax.with_sharding_constraint(zs, win_sharding)
            seqs = jax.lax.with_sharding_constraint(seqs, win_sharding)
        eps, logits = jax.vmap(eval_one_)(zs, seqs, taus[idx_c])

        vmaskf = valid.astype(jnp.float32)[:, None, None, None]
        inc = dgamma[idx_c][:, None, None, None] * eps * vmaskf
        y_new = y_buf[s][None] + jnp.cumsum(inc, axis=0)  # -> idx s+1..s+W

        # Commitment trajectory rebuild: sticky reveal scanned from the
        # EXACT state at s with this sweep's fresh logits. Invalid
        # (past-the-end) positions hold their carry.
        def rstep(carry_c, inp):
            cm, co = carry_c
            logit, tr, v = inp
            cm2, co2 = model._reveal_update(
                logit, cm, co, inv2, n_inv, tr, dead_key, dead_key
            )
            keep = v.astype(jnp.float32)
            cm2 = keep * cm2 + (1.0 - keep) * cm
            co2 = keep * co2 + (1.0 - keep) * co
            return (cm2, co2), (cm2, co2)

        (_, _), (cm_new, co_new) = jax.lax.scan(
            rstep, (cm_buf[s], co_buf[s]),
            (logits, jnp.take(t_reveal, idx_c), valid),
        )

        y_old = jax.lax.dynamic_slice_in_dim(y_buf, s + 1, W, axis=0)
        co_old = jax.lax.dynamic_slice_in_dim(co_buf, s + 1, W, axis=0)
        sa_next = sqrt_a[jnp.minimum(idx + 1, S)][:, None, None, None]
        dz2 = jnp.square(sa_next * (y_new - y_old))
        err_z = jnp.sum(
            mask[None, ..., None] * dz2, axis=(1, 2, 3)
        ) / (3.0 * mask_sum)
        ds2 = jnp.square(co_new - co_old)
        err_s = jnp.sum(
            residue_mask[None, ..., None] * ds2, axis=(1, 2, 3)
        ) / (21.0 * rmask_sum)
        ok = jnp.where(valid, jnp.maximum(err_z, err_s) <= tol2, True)
        h = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))

        y_buf = jax.lax.dynamic_update_slice_in_dim(y_buf, y_new, s + 1, 0)
        cm_buf = jax.lax.dynamic_update_slice_in_dim(
            cm_buf, cm_new, s + 1, 0
        )
        co_buf = jax.lax.dynamic_update_slice_in_dim(
            co_buf, co_new, s + 1, 0
        )
        return (
            y_buf, cm_buf, co_buf,
            jnp.minimum(s + h, S),
            iters + 1,
            nfe + jnp.sum(valid.astype(jnp.int32)),
        )

    def cond(carry):
        _, _, _, s, iters, _ = carry
        return (s < S) & (iters < 2 * S + 2)

    init = (
        y_buf, cm_buf, co_buf,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    y_buf, cm_buf, co_buf, s, iters, nfe = jax.lax.while_loop(
        cond, body, init
    )

    pos = nanometre_to_angstrom(y_buf[S])  # sqrt_a[S] == 1
    logits_out = residue_mask[..., None] * (seq_known + co_buf[S])
    return pos, logits_out, {"iterations": iters, "nfe": nfe}
