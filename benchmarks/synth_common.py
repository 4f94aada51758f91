"""Shared helpers for the synthetic-structure quality benchmarks.

The synthetic cache (`prep_synth_dataset.py`) stores each complex's
ground-truth CA trace in ``residue_atom_pos[:, 1]``, so evaluation scripts
reconstruct the reference structure straight from the cache instead of
re-deriving it.
"""
import dataclasses
import sys
import zlib

sys.path.insert(0, "/root/repo")

import numpy as np

from protein_redesign_tpu.chem.protein import (
    RESIDUE_TYPES,
    protein_from_sequence,
)

# One-letter code in MODEL VOCABULARY ORDER (reference `protein.py:28-33`,
# "ARNDC..."), NOT alphabetical: index i here must invert aatype == i.
AA = "".join(RESIDUE_TYPES)

# CA-trace pseudo bond angle / dihedral (degrees) per secondary-structure
# state: ideal alpha-helix and beta-strand values for consecutive-CA
# geometry (|CA-CA| = 3.8 A).
SS_GEOMETRY = {
    "H": (89.0, 50.0),
    "E": (124.0, -170.0),
}

# Chou-Fasman-flavoured formers: which residues pull their window toward
# helix vs strand. Everything else tends to coil.
HELIX_FORMERS = set("AELMQKRH")
STRAND_FORMERS = set("VIYCWFT")


def assign_secondary_structure(seq: str) -> str:
    """Deterministic per-residue H/E/C assignment from smoothed residue
    propensities, with minimum run lengths (H>=4, E>=3) eroded to coil."""
    n = len(seq)
    h = np.array([1.0 if c in HELIX_FORMERS else 0.0 for c in seq])
    e = np.array([1.0 if c in STRAND_FORMERS else 0.0 for c in seq])
    # Smooth over a 5-residue window.
    kernel = np.ones(5) / 5.0
    hs = np.convolve(h, kernel, mode="same")
    es = np.convolve(e, kernel, mode="same")
    states = []
    for i in range(n):
        if hs[i] >= 0.5 and hs[i] >= es[i]:
            states.append("H")
        elif es[i] >= 0.5 and es[i] > hs[i]:
            states.append("E")
        else:
            states.append("C")
    s = "".join(states)
    # Erode runs shorter than the minimum into coil.
    out = list(s)
    i = 0
    while i < n:
        j = i
        while j < n and s[j] == s[i]:
            j += 1
        run = j - i
        if (s[i] == "H" and run < 4) or (s[i] == "E" and run < 3):
            for k in range(i, j):
                out[k] = "C"
        i = j
    return "".join(out)


def _next_ca(p0, p1, p2, theta_deg, tau_deg, r=3.8):
    """NeRF placement of the next CA from the previous three."""
    theta = np.deg2rad(theta_deg)
    tau = np.deg2rad(tau_deg)
    bc = p2 - p1
    bc = bc / np.linalg.norm(bc)
    ab = p1 - p0
    n = np.cross(ab, bc)
    n = n / (np.linalg.norm(n) + 1e-12)
    m = np.cross(n, bc)
    d = r * np.array(
        [
            -np.cos(theta),
            np.sin(theta) * np.cos(tau),
            np.sin(theta) * np.sin(tau),
        ]
    )
    return p2 + d[0] * bc + d[1] * m + d[2] * n


def fold_ca_trace(seq: str) -> np.ndarray:
    """Deterministic sequence-dependent CA trace: ideal helix/strand
    geometry on the assigned secondary structure, coil torsions drawn from
    a local-sequence-seeded RNG (so coils are sequence-dependent too)."""
    n = len(seq)
    ss = assign_secondary_structure(seq)
    pos = np.zeros((n, 3), dtype=np.float64)
    pos[0] = (0.0, 0.0, 0.0)
    if n > 1:
        pos[1] = (3.8, 0.0, 0.0)
    if n > 2:
        pos[2] = pos[1] + 3.8 * np.array(
            [np.cos(np.deg2rad(180 - 91)), np.sin(np.deg2rad(180 - 91)), 0.0]
        )
    for i in range(3, n):
        state = ss[i - 1]
        if state in SS_GEOMETRY:
            theta, tau = SS_GEOMETRY[state]
        else:
            # Coil: torsion seeded by the local tripeptide -> deterministic
            # per sequence, variable along the chain.
            local_seed = zlib.crc32(seq[max(0, i - 2) : i + 1].encode())
            rng = np.random.RandomState(local_seed)
            theta = rng.uniform(85.0, 140.0)
            tau = rng.uniform(-180.0, 180.0)
        pos[i] = _next_ca(pos[i - 3], pos[i - 2], pos[i - 1], theta, tau)
    pos = pos - pos.mean(0)
    return pos.astype(np.float32)


def protein_with_ca(seq: str, ca: np.ndarray):
    prot = protein_from_sequence(seq)
    ap = prot.atom_pos.copy()
    ap[:, 1] = ca
    return dataclasses.replace(prot, atom_pos=ap)


def seq_from_residue_types(residue_type: np.ndarray) -> str:
    return "".join(
        AA[i] if 0 <= i < 20 else "X" for i in np.asarray(residue_type)
    )


def reference_from_cache(data) -> "object":
    """Ground-truth Protein rebuilt from a cached complex dict."""
    seq = seq_from_residue_types(data["residue_type"])
    ca = np.asarray(data["residue_atom_pos"])[:, 1]
    return protein_with_ca(seq, ca)


def _redesigned_positions(runner, data, num_samples, key, mask_prob=None):
    """Reproduce the per-design masked (redesigned) residue positions.

    ``SamplingRunner.run`` splits the key once per batch group and the
    sampler hands the first 4-way subkey to prepare_batch
    (``ProteinReDiffModel.inference_extra_mask``); with num_samples <=
    batch_size there is exactly one group, so the draw is recoverable
    host-side. Returns [num_samples, n_res] bool (True = was masked)."""
    import jax
    import jax.numpy as jnp

    from protein_redesign_tpu.data.collate import (
        collate_fn,
        numeric_batch,
        pick_bucket,
    )

    assert num_samples <= runner.batch_size, "single-group assumption"
    n_lig = int(data["num_atoms"])
    n_res = int(data["num_residues"])
    sub = jax.random.split(key)[1]
    bucket = pick_bucket(n_lig + n_res, runner.buckets)
    cb = numeric_batch(collate_fn([data] * num_samples, buckets=(bucket,)))
    mp = runner.mask_prob if mask_prob is None else mask_prob
    _, inv = runner.model.inference_extra_mask(
        sub, jnp.asarray(cb["residue_mask"]), mp
    )
    return np.asarray(inv)[:, n_lig : n_lig + n_res] > 0.5


def eval_complexes(
    runner, ids, cache_dir, num_samples, label="", verbose=False,
    mask_prob=None,
):
    """Per-complex quality rows shared by quality_report/quality_sweep:
    mirror-aware TM vs the cached ground-truth fold, sequence recovery
    (overall AND restricted to the redesigned/masked positions — at
    mask_prob 0.15 overall recovery is ~0.86 even for a model that copies
    the 85% known residues and guesses the rest, so the masked-position
    number is the honest one) and diversity over ``num_samples`` designs
    (seeded per complex id)."""
    import jax

    from protein_redesign_tpu.data.dataset import load_complex_cache
    from protein_redesign_tpu.utils import metrics as M

    rows = []
    for pid in ids:
        data = load_complex_cache(cache_dir, pid)
        n_res = int(data["num_residues"])
        n_lig = int(data["num_atoms"])
        true_seq = seq_from_residue_types(data["residue_type"])
        ref = reference_from_cache(data)
        key = jax.random.PRNGKey(zlib.crc32(pid.encode()))
        results = runner.run([data] * num_samples, key, mask_prob=mask_prob)
        masked = _redesigned_positions(
            runner, data, num_samples, key, mask_prob=mask_prob
        )
        tms, seqs, rec_masked = [], [], []
        for row, (pos, seq_prob) in enumerate(results):
            sp = protein_with_ca(true_seq, pos[n_lig : n_lig + n_res])
            tms.append(M.tm_scores([sp], ref)[0])
            toks = np.argmax(seq_prob[n_lig : n_lig + n_res], axis=-1)
            s = "".join(("X" + AA)[t] for t in toks)
            seqs.append(s)
            mpos = np.nonzero(masked[row])[0].tolist()
            if mpos:
                rec_masked.append(
                    M.sequence_recovery([s], true_seq, masked_only=mpos)
                )
        rows.append({
            "id": pid, "n_res": n_res,
            "tm_mean": float(np.mean(tms)), "tm_max": float(np.max(tms)),
            "recovery": M.sequence_recovery(seqs, true_seq),
            "recovery_masked": (
                float(np.mean(rec_masked)) if rec_masked else float("nan")
            ),
            "diversity": M.sequence_diversity(seqs),
        })
        if verbose:
            r = rows[-1]
            print(
                f"{label} {pid}: n={n_res} tm_mean={r['tm_mean']:.3f} "
                f"recovery={r['recovery']:.3f} "
                f"recovery_masked={r['recovery_masked']:.3f} "
                f"diversity={r['diversity']:.3f}",
                flush=True,
            )
    return rows
