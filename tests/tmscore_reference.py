"""Independent brute-force TM-score reference (pure NumPy).

Written from the TM-score DEFINITION (Zhang & Skolnick 2004) with no
code shared with `native/tmalign/tmalign.cpp` — its purpose is to
differential-test the C++ aligner's absolute scores
(tests/test_tmalign.py::TestDifferentialVsNumpyReference), bounding the
drift that docs/TMALIGN.md's divergence notes leave open.

Definition implemented:
    TM2 = max over (alignment, superposition) of
          (1/Lref) * sum_aligned 1 / (1 + (d_i/d0(Lref))^2)
    d0(L) = max(0.5, 1.24 * cbrt(L - 15) - 1.8)

Search strategy (brute force, small L only):
- candidate seed alignments: every gapless offset of the shorter chain
  against the longer (>= 5 aligned pairs)
- for each seed: TM-score-style iterative refinement — Kabsch
  superposition on the currently-included pairs, re-include pairs with
  d < cutoff, growing the cutoff when fewer than 3 pairs survive
- between refinement rounds: a sequential Needleman-Wunsch DP on the
  score matrix S[i,j] = 1/(1+(d_ij/d0)^2) (gap penalty -0.6, TM-align's
  published inner loop) to revise the alignment under the current
  superposition
- the reported score is the max over everything visited.

O(L^3)-ish per pair; keep L <= ~60 in tests.
"""

from __future__ import annotations

import numpy as np


def d0_of(L: int) -> float:
    if L <= 15:
        return 0.5
    return max(0.5, 1.24 * (L - 15) ** (1.0 / 3.0) - 1.8)


def kabsch(P: np.ndarray, Q: np.ndarray):
    """Optimal proper rotation R and translation t minimizing
    ||(P @ R + t) - Q||; row-vector convention."""
    pc, qc = P.mean(0), Q.mean(0)
    H = (P - pc).T @ (Q - qc)
    U, _, Vt = np.linalg.svd(H)
    sign = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, sign])
    R = U @ D @ Vt
    t = qc - pc @ R
    return R, t


def _tm_sum(prb_al: np.ndarray, ref_al: np.ndarray, R, t, d0: float):
    d2 = np.sum((prb_al @ R + t - ref_al) ** 2, axis=1)
    return float(np.sum(1.0 / (1.0 + d2 / d0**2))), np.sqrt(d2)


def _refine(prb_al: np.ndarray, ref_al: np.ndarray, d0: float):
    """TM-score iterative superposition refinement on a FIXED pairing:
    returns the best (score_sum, R, t) found."""
    n = len(prb_al)
    best = (-1.0, None, None)
    include = np.ones(n, bool)
    for _ in range(20):
        if include.sum() < 3:
            break
        R, t = kabsch(prb_al[include], ref_al[include])
        s, d = _tm_sum(prb_al, ref_al, R, t, d0)
        if s > best[0]:
            best = (s, R, t)
        cutoff = d0 + 1.0
        new_inc = d < cutoff
        while new_inc.sum() < 3 and cutoff < 50.0:
            cutoff += 0.5
            new_inc = d < cutoff
        if new_inc.sum() < 3 or (new_inc == include).all():
            break
        include = new_inc
    return best


def _nw_dp(S: np.ndarray, gap: float = -0.6):
    """Sequential Needleman-Wunsch on score matrix S: returns list of
    (i, j) aligned index pairs (monotone, one-to-one)."""
    n, m = S.shape
    F = np.zeros((n + 1, m + 1))
    ptr = np.zeros((n + 1, m + 1), np.int8)  # 0 diag, 1 up, 2 left
    for i in range(1, n + 1):
        F[i, 0] = F[i - 1, 0] + gap
        ptr[i, 0] = 1
    for j in range(1, m + 1):
        F[0, j] = F[0, j - 1] + gap
        ptr[0, j] = 2
    for i in range(1, n + 1):
        diag = F[i - 1, :-1] + S[i - 1]
        for j in range(1, m + 1):
            up = F[i - 1, j] + gap
            left = F[i, j - 1] + gap
            dd = diag[j - 1]
            if dd >= up and dd >= left:
                F[i, j], ptr[i, j] = dd, 0
            elif up >= left:
                F[i, j], ptr[i, j] = up, 1
            else:
                F[i, j], ptr[i, j] = left, 2
    pairs = []
    i, j = n, m
    while i > 0 or j > 0:
        p = ptr[i, j]
        if p == 0 and i > 0 and j > 0:
            pairs.append((i - 1, j - 1))
            i, j = i - 1, j - 1
        elif p == 1 or j == 0:
            i -= 1
        else:
            j -= 1
    pairs.reverse()
    return pairs


def tmscore_numpy(prb_xyz: np.ndarray, ref_xyz: np.ndarray,
                  mirror: bool = False) -> float:
    """Brute-force TM2 (normalized by len(ref)) of CA traces."""
    prb = np.asarray(prb_xyz, float)
    ref = np.asarray(ref_xyz, float)
    if mirror:
        prb = prb * np.array([1.0, 1.0, -1.0])
    Lp, Lr = len(prb), len(ref)
    d0 = d0_of(Lr)
    best = 0.0

    def consider(pairs):
        nonlocal best
        if len(pairs) < 3:
            return
        ip = np.array([p for p, _ in pairs])
        ir = np.array([r for _, r in pairs])
        s, R, t = _refine(prb[ip], ref[ir], d0)
        if s / Lr > best:
            best = s / Lr
        if R is None:
            return
        # one DP revision of the alignment under this superposition,
        # then refine again
        d2 = np.sum(((prb @ R + t)[:, None, :] - ref[None, :, :]) ** 2,
                    axis=-1)
        S = 1.0 / (1.0 + d2 / d0**2)
        new_pairs = _nw_dp(S)
        if len(new_pairs) >= 3 and new_pairs != pairs:
            ip2 = np.array([p for p, _ in new_pairs])
            ir2 = np.array([r for _, r in new_pairs])
            s2, _, _ = _refine(prb[ip2], ref[ir2], d0)
            if s2 / Lr > best:
                best = s2 / Lr

    # gapless threading seeds (all offsets with >= 5 pairs), plus
    # half-length fragment seeds of each offset
    for off in range(-(Lp - 5), Lr - 4):
        pairs = [(i, i + off) for i in range(Lp)
                 if 0 <= i + off < Lr]
        if len(pairs) >= 5:
            consider(pairs)
            half = max(5, len(pairs) // 2)
            consider(pairs[:half])
            consider(pairs[-half:])
    return best
