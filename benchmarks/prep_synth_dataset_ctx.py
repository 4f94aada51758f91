"""Build the CONTEXT-DETERMINED quality dataset (VERDICT r4 #2).

Three rounds of matched-budget cells on the XL task plateaued at masked
recovery 0.083-0.084 vs a 0.070 random-init control, and the task's own
math explains why: XL sequences are drawn 70% uniform-over-pool / 30%
uniform-over-20 per position, i.i.d. GIVEN the secondary-structure
segment — so the Bayes-optimal per-position accuracy (know the segment
kind perfectly, predict the argmax) is

    helix  (pool 8): 0.7/8 + 0.3/20 = 0.1025
    strand (pool 7): 0.7/7 + 0.3/20 = 0.1150
    coil   (pool 6): 0.7/6 + 0.3/20 = 0.1317

i.e. a ~0.11 ceiling on the training distribution — and the XL val split
is REAL fixture sequences, where even that propensity signal is weaker.
The 0.095 bar demands >= 86%-of-Bayes behavior; the measured 0.083 is
~30% of the achievable (0.070 -> ~0.11) window. The bar was never
reachable by objective or budget changes: the DATA had (almost) no
sequence signal. (Derivation pinned by tests/test_synth_ceiling.py.)

This script regenerates the task with sequence identity fully
DETERMINED by structure + position: the same segment layout and fold
generator (`synth_common.fold_ca_trace`), but within a segment of kind
k the residue at global index i is

    P_k[i mod |P_k|]         (P_k = sorted propensity pool of k)

— a deterministic cyclic pattern. A masked position is exactly
recoverable from the local geometry (segment kind) plus the residue
index (phase), so the Bayes ceiling is ~1.0 and masked recovery finally
measures model capability instead of data noise. Val/test are held-out
complexes from the SAME generator (unlike XL's out-of-distribution real
sequences), so TM also measures in-distribution structure learning.

Reference workflow being modeled: training/sampling quality per
`/root/reference/README.md:147-160` + `model.py:377-422`.

Usage:
    python benchmarks/prep_synth_dataset_ctx.py [n_train]
Writes PRD_CTX_ROOT (default /tmp/prd_ctx): data/cache + split files.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pathlib import Path

import numpy as np

from synth_common import fold_ca_trace, protein_with_ca
from prep_synth_dataset_xl_gen import COIL_BIAS, HELIX, STRAND

from protein_redesign_tpu.chem.mol import mol_from_smiles, update_mol_positions
from protein_redesign_tpu.chem.smiles import strip_cxsmiles
from protein_redesign_tpu.data.dataset import save_complex_cache
from protein_redesign_tpu.data.featurize import ligand_to_data, protein_to_data

ESM_DIM = int(os.environ.get("PRD_ESM_DIM", "320"))
ROOT = Path(os.environ.get("PRD_CTX_ROOT", "/tmp/prd_ctx"))
DATA = ROOT / "data"
CACHE = DATA / "cache"
N_TRAIN = 1000  # overridable from the CLI (see __main__)
N_VAL = 10
N_TEST = 10

POOLS = {"H": HELIX, "E": STRAND, "C": COIL_BIAS}


def sample_sequence_ctx(rng, return_kinds=False):
    """Same segment layout as the XL task (`sample_sequence`), residues
    deterministic: P_k[i mod |P_k|] at global index i in kind k."""
    target = rng.randint(60, 211)
    kinds = []  # per-residue segment kind
    while len(kinds) < target:
        if kinds:
            kinds += ["C"] * rng.randint(2, 9)
        kind = "H" if rng.random_sample() < 0.55 else "E"
        length = rng.randint(5, 16) if kind == "H" else rng.randint(3, 10)
        kinds += [kind] * length
    kinds = kinds[:target]
    seq = "".join(POOLS[k][i % len(POOLS[k])] for i, k in enumerate(kinds))
    return (seq, "".join(kinds)) if return_kinds else seq


def fixture_ligands():
    lines = [
        strip_cxsmiles(l.strip())
        for l in open("/root/reference/scripts/test_pdb.smiles")
        if l.strip()
    ]
    mols = []
    for smi in lines:
        try:
            mol = mol_from_smiles(smi)
        except Exception:
            continue
        if 3 <= mol.num_atoms() <= 40:
            mols.append(mol)
    return mols


def main():
    CACHE.mkdir(parents=True, exist_ok=True)
    ligands = fixture_ligands()
    assert ligands, "no usable fixture ligands"
    splits = {"train": [], "val": [], "test": []}
    plan = (
        [("train", i) for i in range(N_TRAIN)]
        + [("val", i) for i in range(N_VAL)]
        + [("test", i) for i in range(N_TEST)]
    )
    for split, i in plan:
        # Disjoint seed spaces per split => held-out but in-distribution.
        seed = {"train": 0, "val": 5_000_000, "test": 6_000_000}[split] + i
        rng = np.random.RandomState(seed)
        seq = sample_sequence_ctx(rng)
        mol = ligands[seed % len(ligands)]
        if len(seq) + mol.num_atoms() > 250:  # stay inside the 256 bucket
            seq = seq[: 250 - mol.num_atoms()]
        ca = fold_ca_trace(seq)
        prot = protein_with_ca(seq, ca)
        lig_pos = (
            ca.mean(0)
            + rng.randn(mol.num_atoms(), 3).astype(np.float32) * 2.0
        )
        mol = update_mol_positions(mol, lig_pos)
        data = {
            **ligand_to_data(mol),
            **protein_to_data(prot, esm_dim=ESM_DIM),
        }
        pdb_id = f"ctx_{split}_{i:04d}"
        save_complex_cache(CACHE, pdb_id, data)
        splits[split].append(pdb_id)
    for split, ids in splits.items():
        (DATA / f"PRD_{split}_pdb_ids").write_text("\n".join(ids) + "\n")
    print(
        f"ctx dataset: {len(splits['train'])} train / "
        f"{len(splits['val'])} val / {len(splits['test'])} test -> {DATA}"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1:
        N_TRAIN = int(sys.argv[1])
    main()
