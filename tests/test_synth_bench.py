"""Guards for the synthetic quality-benchmark fold generator
(`benchmarks/synth_common.py`): the quality tables in BASELINE.md are only
meaningful if the sequence->structure mapping is deterministic and the
cached ground truth reconstructs exactly."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "benchmarks")
)

from synth_common import (  # noqa: E402
    assign_secondary_structure,
    fold_ca_trace,
    protein_with_ca,
    reference_from_cache,
    seq_from_residue_types,
)

SEQ = (
    "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVKALPD"
    "AQFEVVHSLAKWKRQTLGQHDFSAGEGLYTHMKALRPDEDRLSPLHSVYVDQWDWE"
)


def test_secondary_structure_states_and_min_runs():
    ss = assign_secondary_structure(SEQ)
    assert len(ss) == len(SEQ)
    assert set(ss) <= {"H", "E", "C"}
    # Minimum run lengths enforced: no H run < 4, no E run < 3.
    import re

    for m in re.finditer(r"H+", ss):
        assert len(m.group()) >= 4
    for m in re.finditer(r"E+", ss):
        assert len(m.group()) >= 3
    # A propensity-driven assignment must produce more than one state
    # for a mixed sequence (otherwise TM against ground truth measures
    # nothing sequence-specific).
    assert len(set(ss)) >= 2


def test_fold_ca_trace_geometry_and_determinism():
    ca1 = fold_ca_trace(SEQ)
    ca2 = fold_ca_trace(SEQ)
    np.testing.assert_array_equal(ca1, ca2)
    d = np.linalg.norm(np.diff(ca1, axis=0), axis=1)
    np.testing.assert_allclose(d, 3.8, atol=1e-3)
    # Mean-centred.
    np.testing.assert_allclose(ca1.mean(0), 0.0, atol=1e-3)
    # Different sequences give different folds.
    other = fold_ca_trace(SEQ[::-1])
    assert np.abs(ca1 - other).max() > 1.0


def test_reference_from_cache_round_trip():
    from protein_redesign_tpu.data.featurize import protein_to_data

    seq = SEQ[:48]
    ca = fold_ca_trace(seq)
    prot = protein_with_ca(seq, ca)
    data = protein_to_data(prot, esm_dim=8)
    ref = reference_from_cache(data)
    np.testing.assert_allclose(ref.atom_pos[:, 1], ca, atol=1e-6)
    assert seq_from_residue_types(data["residue_type"]) == seq
