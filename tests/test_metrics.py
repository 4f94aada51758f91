"""Evaluation-metric tests."""

import numpy as np
import pytest

from protein_redesign_tpu.utils.metrics import (
    ca_lddt,
    ca_rmsd,
    kabsch_rmsd,
    sequence_diversity,
    sequence_identity,
    sequence_recovery,
)


class TestSequenceMetrics:
    def test_identity(self):
        assert sequence_identity("ACDE", "ACDE") == 1.0
        assert sequence_identity("ACDE", "ACDF") == 0.75
        assert sequence_identity("", "") == 0.0

    def test_recovery_masked_positions(self):
        ref = "ACDEFG"
        designs = ["ACDEFG", "ACDEYG"]
        import pytest

        assert sequence_recovery(designs, ref) == pytest.approx(
            1.0 - (1 / 6) / 2
        )
        assert sequence_recovery(designs, ref, masked_only=[4]) == 0.5

    def test_diversity(self):
        assert sequence_diversity(["AAAA", "AAAA"]) == 0.0
        assert sequence_diversity(["AAAA", "CCCC"]) == 1.0
        assert sequence_diversity(["AAAA"]) == 0.0


class TestStructureMetrics:
    def test_kabsch_rmsd_invariant(self):
        rng = np.random.RandomState(0)
        x = rng.randn(20, 3)
        theta = 0.7
        R = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ])
        y = x @ R.T + np.array([1.0, -2.0, 3.0])
        assert kabsch_rmsd(x, y) < 1e-8

    def test_kabsch_no_reflection(self):
        rng = np.random.RandomState(1)
        x = rng.randn(20, 3)
        y = x.copy()
        y[:, 2] *= -1  # mirror image: proper rotation can't undo it
        assert kabsch_rmsd(x, y) > 0.5

    def test_ca_rmsd(self):
        from protein_redesign_tpu.chem import protein_from_sequence

        p = protein_from_sequence("ACDEF")
        q = protein_from_sequence("ACDEF")
        p.atom_pos[:, 1] = np.random.RandomState(2).randn(5, 3)
        q.atom_pos[:, 1] = p.atom_pos[:, 1] + 0.1
        assert ca_rmsd(p, q) < 1e-6  # pure translation


class TestLDDT:
    def _trace(self, n=30, seed=0):
        # compact random walk so plenty of pairs fall inside 15 A
        rng = np.random.RandomState(seed)
        steps = rng.randn(n, 3)
        steps = 2.0 * steps / np.linalg.norm(steps, axis=-1, keepdims=True)
        return np.cumsum(steps, axis=0)

    def test_identity_is_one(self):
        x = self._trace()
        assert ca_lddt(x, x) == 1.0

    def test_rigid_motion_invariant(self):
        # lDDT is superposition-free: rotation+translation changes nothing
        x = self._trace()
        theta = 1.1
        R = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ])
        y = x @ R.T + np.array([5.0, -3.0, 2.0])
        assert abs(ca_lddt(y, x) - 1.0) < 1e-6

    def test_small_perturbation_thresholds(self):
        # displacing ONE atom by 1.5 A breaks its pairs at the 0.5/1.0 A
        # thresholds but not at 2/4 A -> score strictly between
        x = self._trace()
        y = x.copy()
        y[10] += np.array([1.5, 0.0, 0.0])
        s = ca_lddt(y, x)
        assert 0.5 < s < 1.0

    def test_garbage_low(self):
        x = self._trace(seed=1)
        y = self._trace(seed=2) * 3.0
        assert ca_lddt(y, x) < 0.5

    def test_gap_aware_separation(self):
        # collinear CAs 4 A apart; atom 1 displaced +1.5 A along the
        # line, so every scored pair involving atom 1 has |delta| = 1.5
        # (fails 0.5/1.0 A, passes 2/4 A).
        x = np.zeros((5, 3))
        x[:, 0] = [0.0, 4.0, 8.0, 12.0, 16.0]
        y = x.copy()
        y[1, 0] += 1.5
        # contiguous numbering: in-radius sep>=2 pairs are
        # (0,2),(0,3),(1,3),(1,4),(2,4); two involve atom 1
        assert ca_lddt(y, x) == pytest.approx((0.6 + 0.6 + 1 + 1) / 4)
        # a gap between array indices 1 and 2 promotes the (1,2) pair
        # (residue sep 4) into the scored set: three bad of six
        nums_gapped = np.array([0, 1, 5, 6, 7])
        assert ca_lddt(
            y, x, residue_numbers=nums_gapped
        ) == pytest.approx((0.5 + 0.5 + 1 + 1) / 4)

    def test_interchain_pairs_always_scored(self):
        x = self._trace(8)
        chains = np.array([0, 0, 0, 0, 1, 1, 1, 1])
        nums = np.array([0, 1, 2, 3, 0, 1, 2, 3])  # per-chain numbering
        assert ca_lddt(
            x, x, residue_numbers=nums, chain_indices=chains
        ) == 1.0
