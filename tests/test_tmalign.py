"""Conformance tests for the in-repo C++ TM-align implementation."""

import numpy as np
import pytest

from protein_redesign_tpu.chem.protein import Protein
from protein_redesign_tpu.utils.tmalign import best_tmalign, find_tmalign, run_tmalign


def helix_protein(n=60, seed=0, noise=0.0):
    """Ideal alpha-helix CA trace (rise 1.5 A, radius 2.3 A, 100 deg/res)."""
    rng = np.random.RandomState(seed)
    theta = np.deg2rad(100.0) * np.arange(n)
    pos = np.stack(
        [2.3 * np.cos(theta), 2.3 * np.sin(theta), 1.5 * np.arange(n)],
        axis=-1,
    ).astype(np.float32)
    if noise:
        pos = pos + rng.randn(n, 3).astype(np.float32) * noise
    atom_pos = np.zeros((n, 37, 3), np.float32)
    atom_pos[:, 1] = pos
    atom_mask = np.zeros((n, 37), np.float32)
    atom_mask[:, 1] = 1.0
    return Protein(
        chain_index=np.zeros(n, np.int64),
        residue_index=np.arange(n, dtype=np.int64),
        aatype=rng.randint(0, 20, n),
        atom_pos=atom_pos,
        atom_mask=atom_mask,
    )


def transform(prot, R, t):
    atom_pos = prot.atom_pos @ R.T + t
    import dataclasses

    return dataclasses.replace(prot, atom_pos=atom_pos.astype(np.float32))


def rotation(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


class TestTMalign:
    def test_binary_builds(self):
        assert find_tmalign()

    def test_self_alignment(self):
        p = helix_protein()
        tm, t, R = run_tmalign(p, p)
        assert tm == pytest.approx(1.0, abs=2e-3)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-4)
        np.testing.assert_allclose(t, 0.0, atol=1e-3)

    def test_rotated_copy_recovered(self):
        p = helix_protein()
        R_true = rotation([1, 2, 3], 1.1)
        t_true = np.array([5.0, -3.0, 2.0])
        q = transform(p, R_true, t_true)
        tm, t, R = run_tmalign(q, p)
        assert tm == pytest.approx(1.0, abs=2e-3)
        # q aligned back onto p: pos @ R + t must equal p's coords.
        aligned = q.atom_pos[:, 1] @ R + t
        np.testing.assert_allclose(aligned, p.atom_pos[:, 1], atol=0.05)

    def test_noisy_copy_high_tm(self):
        p = helix_protein()
        q = helix_protein(noise=0.5, seed=1)
        tm, _, _ = run_tmalign(q, p)
        assert 0.7 < tm <= 1.0

    def test_unrelated_low_tm(self):
        p = helix_protein(60)
        rng = np.random.RandomState(7)
        # Random-walk chain with CA-CA distance 3.8 A
        steps = rng.randn(60, 3)
        steps = 3.8 * steps / np.linalg.norm(steps, axis=-1, keepdims=True)
        pos = np.cumsum(steps, axis=0).astype(np.float32)
        q = helix_protein(60, seed=2)
        q.atom_pos[:, 1] = pos
        tm, _, _ = run_tmalign(q, p)
        assert tm < 0.5

    def test_mirror_disambiguation(self):
        """A mirrored helix aligns poorly normally but well with -mirror."""
        p = helix_protein(80)
        import dataclasses

        mirrored_pos = p.atom_pos.copy()
        mirrored_pos[..., 2] *= -1
        q = dataclasses.replace(p, atom_pos=mirrored_pos)
        tm_normal, _, _ = run_tmalign(q, p)
        tm_mirror, t, R = run_tmalign(q, p, mirror=True)
        assert tm_mirror > tm_normal
        assert tm_mirror == pytest.approx(1.0, abs=5e-3)
        # The mirror-composed transform maps q back onto p.
        aligned = q.atom_pos[:, 1] @ R + t
        np.testing.assert_allclose(aligned, p.atom_pos[:, 1], atol=0.1)
        # best_tmalign picks the mirror branch.
        tm_best, _, _ = best_tmalign(q, p)
        assert tm_best == pytest.approx(tm_mirror, abs=1e-6)

    def test_fragment_alignment(self):
        """A 30-residue fragment of a 60-residue helix: TM2 ~ fraction."""
        p = helix_protein(60)
        import dataclasses

        frag = dataclasses.replace(
            p,
            chain_index=p.chain_index[:30],
            residue_index=p.residue_index[:30],
            aatype=p.aatype[:30],
            atom_pos=p.atom_pos[:30],
            atom_mask=p.atom_mask[:30],
        )
        tm, _, _ = run_tmalign(frag, p)
        # ~30 perfectly aligned residues normalized by 60 with d0(60)
        assert 0.4 < tm < 0.65

    def test_different_lengths_dp(self):
        p = helix_protein(50)
        q = helix_protein(64, seed=3, noise=0.2)
        tm, _, _ = run_tmalign(q, p)
        assert 0.5 < tm <= 1.0
