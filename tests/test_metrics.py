"""Evaluation-metric tests."""

import numpy as np

from protein_redesign_tpu.utils.metrics import (
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
