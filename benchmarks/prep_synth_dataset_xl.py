"""Expand the synthetic quality-training cache with procedurally
generated sequences (default +900 -> ~1000 train complexes).

Round-2 found the quality ceiling was DATA, not steps: 90 train
complexes overfit long before convergence (train masked recovery 0.160
vs val 0.102, BASELINE.md). The fold generator (`synth_common`) is fully
procedural, so training data is unlimited: this script samples sequences
as secondary-structure segments (helix/strand/coil runs drawn from the
same propensity sets `assign_secondary_structure` smooths over, plus
background composition), folds each with `fold_ca_trace`, and pairs it
with a fixture ligand. The ORIGINAL train/val split files are preserved:
generated ids are appended to PRD_train_pdb_ids only, so val rows stay
comparable across rounds (same 10 real-fixture-derived complexes).

Run after prep_synth_dataset.py:
    python benchmarks/prep_synth_dataset.py
    python benchmarks/prep_synth_dataset_xl.py [n_generated]
"""
import sys

sys.path.insert(0, "/root/repo")
import os
from pathlib import Path

import numpy as np

from synth_common import fold_ca_trace, protein_with_ca
from prep_synth_dataset_xl_gen import _segment, sample_sequence  # noqa: F401

from protein_redesign_tpu.chem.mol import mol_from_smiles, update_mol_positions
from protein_redesign_tpu.chem.smiles import strip_cxsmiles
from protein_redesign_tpu.data.dataset import save_complex_cache
from protein_redesign_tpu.data.featurize import ligand_to_data, protein_to_data

ESM_DIM = int(os.environ.get("PRD_ESM_DIM", "320"))
ROOT = Path(os.environ.get("PRD_QUALITY_ROOT", "/tmp/prd_quality"))
DATA = ROOT / "data"
CACHE = DATA / "cache"
N_GEN = int(sys.argv[1]) if len(sys.argv) > 1 else 900



def fixture_ligands():
    """The reference fixture SMILES that pass the round-2 filters
    (prep_synth_dataset.py kept the same set for the real complexes)."""
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


ligands = fixture_ligands()
assert ligands, "no usable fixture ligands"
train_file = DATA / "PRD_train_pdb_ids"
existing = train_file.read_text().split()

added = []
for i in range(N_GEN):
    rng = np.random.RandomState(1_000_000 + i)
    seq = sample_sequence(rng)
    mol = ligands[i % len(ligands)]
    if len(seq) + mol.num_atoms() > 250:  # keep inside the 256 bucket
        seq = seq[: 250 - mol.num_atoms()]
    ca = fold_ca_trace(seq)
    prot = protein_with_ca(seq, ca)
    lig_pos = ca.mean(0) + rng.randn(mol.num_atoms(), 3).astype(np.float32) * 2.0
    mol = update_mol_positions(mol, lig_pos)
    data = {
        **ligand_to_data(mol),
        **protein_to_data(prot, esm_dim=ESM_DIM),
    }
    pdb_id = f"gen_{i:04d}"
    save_complex_cache(CACHE, pdb_id, data)
    added.append(pdb_id)

merged = [p for p in existing if not p.startswith("gen_")] + added
train_file.write_text("\n".join(merged) + "\n")
print(f"train ids: {len(merged)} ({len(added)} generated); val untouched")
