"""Procedural sequence generator shared by the XL quality dataset
(`prep_synth_dataset_xl.py`) and the PDBbind-scale raw-data generator
(`prep_pdbbind_scale.py`). Factored out so both sample from the SAME
distribution; importing this module has no side effects (the prep
scripts are run-on-import)."""
import sys

sys.path.insert(0, "/root/repo/benchmarks")

from synth_common import AA, HELIX_FORMERS, STRAND_FORMERS

HELIX = sorted(HELIX_FORMERS)
STRAND = sorted(STRAND_FORMERS)
COIL_BIAS = sorted(set("GPSNDT"))


def _segment(rng, kind, length):
    """Residues for one SS segment: 70% from the propensity set that
    pulls `assign_secondary_structure` toward that state, 30% background
    (uniform over all 20) so composition stays protein-like."""
    pool = {"H": HELIX, "E": STRAND, "C": COIL_BIAS}[kind]
    out = []
    for _ in range(length):
        if rng.random_sample() < 0.7:
            out.append(pool[rng.randint(len(pool))])
        else:
            out.append(AA[rng.randint(20)])
    return out


def sample_sequence(rng):
    """Alternating structured/coil segments to a 60-210 residue target."""
    target = rng.randint(60, 211)
    seq = []
    while len(seq) < target:
        if seq:
            seq += _segment(rng, "C", rng.randint(2, 9))
        kind = "H" if rng.random_sample() < 0.55 else "E"
        length = rng.randint(5, 16) if kind == "H" else rng.randint(3, 10)
        seq += _segment(rng, kind, length)
    return "".join(seq[:target])
