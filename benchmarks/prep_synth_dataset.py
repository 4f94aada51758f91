"""Build a synthetic-structure training cache from the reference's 207
inference fixtures (sequences + ligand SMILES,
`/root/reference/scripts/test_sequences_from_pdb.fasta` / `test_pdb.smiles`).

Each protein gets a DETERMINISTIC, SEQUENCE-DEPENDENT CA trace: secondary
structure assigned from residue propensities (helix/strand/coil), built
with ideal helix/strand CA geometry and sequence-seeded coil torsions
(`synth_common.fold_ca_trace`). Each ligand is a compact gaussian cloud at
the fold centroid. This gives the diffusion model a learnable
sequence->structure mapping, so TM-score against the cached ground truth
measures real learning — unlike the round-2 pilot's shared ideal helix.
"""
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")
from pathlib import Path

import numpy as np

from synth_common import fold_ca_trace, protein_with_ca
from protein_redesign_tpu.chem.mol import mol_from_smiles, update_mol_positions
from protein_redesign_tpu.chem.protein import protein_from_sequence, read_fasta
from protein_redesign_tpu.chem.smiles import strip_cxsmiles
from protein_redesign_tpu.data.dataset import save_complex_cache
from protein_redesign_tpu.data.featurize import ligand_to_data, protein_to_data

ESM_DIM = int(os.environ.get("PRD_ESM_DIM", "320"))
ROOT = Path(os.environ.get("PRD_QUALITY_ROOT", "/tmp/prd_quality"))
DATA = ROOT / "data"
CACHE = DATA / "cache"

fasta = read_fasta("/root/reference/scripts/test_sequences_from_pdb.fasta")
smiles_lines = [
    strip_cxsmiles(l.strip())
    for l in open("/root/reference/scripts/test_pdb.smiles")
    if l.strip()
]

kept = []
for idx, (name, seq) in enumerate(fasta):
    if idx >= len(smiles_lines):
        break
    smi = smiles_lines[idx]
    if not (30 <= len(seq) <= 220):
        continue
    try:
        mol = mol_from_smiles(smi)
    except Exception:
        continue
    n_lig = mol.num_atoms()
    if not (3 <= n_lig <= 40) or len(seq) + n_lig > 250:
        continue
    ca = fold_ca_trace(seq)
    prot = protein_with_ca(seq, ca)
    rng = np.random.RandomState(idx)
    lig_pos = ca.mean(0) + rng.randn(n_lig, 3).astype(np.float32) * 2.0
    mol = update_mol_positions(mol, lig_pos)
    data = {
        **ligand_to_data(mol),
        **protein_to_data(prot, esm_dim=ESM_DIM),
    }
    pdb_id = f"synth_{idx:04d}"
    save_complex_cache(CACHE, pdb_id, data)
    kept.append(pdb_id)

rng = np.random.RandomState(0)
rng.shuffle(kept)
n_val = max(8, len(kept) // 10)
val, train = kept[:n_val], kept[n_val:]
DATA.mkdir(parents=True, exist_ok=True)
for split, ids in (("train", train), ("val", val), ("test", val)):
    (DATA / f"PRD_{split}_pdb_ids").write_text("\n".join(ids) + "\n")
print(f"cache: {len(kept)} complexes ({len(train)} train / {len(val)} val)")
