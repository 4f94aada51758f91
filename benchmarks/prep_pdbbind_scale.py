"""PDBbind-SCALE synthetic raw-data generator (VERDICT r3 item 4).

The reference trains on 25,631 PDBbind complexes
(`ProteinReDiff/data.py:221-230`), which cannot be downloaded here
(zero egress). This script proves the data pipeline AT THAT SCALE
synthetically: it materializes a raw PDBbind_processed/-layout tree —
one `<id>_protein_processed.pdb` + `<id>_ligand.sdf` per id — for every
id in the REAL vendored split lists (`data/PRD_{train,val,test}_pdb_ids`,
25,631/1,452/1,108), so the actual `cli/preprocess_pdbbind.py` →
`data/dataset.py` → training epoch path runs end-to-end exactly as it
would on the real corpus (same ids, same file formats, same loaders).

Proteins are procedurally sampled sequences (same SS-segment generator
as the XL quality dataset) folded by the deterministic
`synth_common.fold_ca_trace`; ligands cycle the reference fixture
SMILES. Deterministic per id.

    python benchmarks/prep_pdbbind_scale.py [--splits train val test]
    python -m protein_redesign_tpu.cli.preprocess_pdbbind \
        --data_dir $PRD_PDBBIND_ROOT/data \
        --pdbbind_dir $PRD_PDBBIND_ROOT/data/PDBbind_processed
    # then: one full epoch via cli.train (BASELINE.md "PDBbind scale")
"""
import argparse
import hashlib
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from synth_common import fold_ca_trace, protein_with_ca
from prep_synth_dataset_xl_gen import sample_sequence  # shared generator
from protein_redesign_tpu.chem.mol import (
    mol_from_smiles,
    mol_to_sdf,
    update_mol_positions,
)
from protein_redesign_tpu.chem.protein import protein_to_pdb_file
from protein_redesign_tpu.chem.smiles import strip_cxsmiles

ROOT = Path(os.environ.get("PRD_PDBBIND_ROOT", "/tmp/prd_pdbbind25k"))
DATA = ROOT / "data"
RAW = DATA / "PDBbind_processed"
SPLIT_SRC = Path("/root/repo/data")


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
            mols.append((mol, mol_to_sdf(mol)))
    return mols


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    ap.add_argument("--limit", type=int, default=0,
                    help="first N ids per split (smoke runs; 0 = all)")
    args = ap.parse_args()

    DATA.mkdir(parents=True, exist_ok=True)
    ligands = fixture_ligands()
    assert ligands, "no usable fixture ligands"

    t0 = time.time()
    n = 0
    for split in args.splits:
        ids = (SPLIT_SRC / f"PRD_{split}_pdb_ids").read_text().split()
        if args.limit:
            ids = ids[: args.limit]
        # The loaders read the split lists from --data_dir.
        (DATA / f"PRD_{split}_pdb_ids").write_text("\n".join(ids) + "\n")
        for pdb_id in ids:
            out = RAW / pdb_id
            pdb_path = out / f"{pdb_id}_protein_processed.pdb"
            if pdb_path.exists():
                continue
            # Deterministic per id, independent of split order.
            seed = int.from_bytes(
                hashlib.sha256(pdb_id.encode()).digest()[:4], "little"
            )
            rng = np.random.RandomState(seed)
            seq = sample_sequence(rng)
            li = rng.randint(len(ligands))
            mol, _ = ligands[li]
            if len(seq) + mol.num_atoms() > 250:  # inside the 256 bucket
                seq = seq[: 250 - mol.num_atoms()]
            ca = fold_ca_trace(seq)
            prot = protein_with_ca(seq, ca)
            lig_pos = ca.mean(0) + rng.randn(
                mol.num_atoms(), 3
            ).astype(np.float32) * 2.0
            mol = update_mol_positions(mol, lig_pos)
            out.mkdir(parents=True, exist_ok=True)
            protein_to_pdb_file(prot, pdb_path)
            (out / f"{pdb_id}_ligand.sdf").write_text(
                mol_to_sdf(mol, name=pdb_id)
            )
            n += 1
            if n % 2000 == 0:
                dt = time.time() - t0
                print(f"{n} complexes written ({n/dt:.0f}/s)", flush=True)
    dt = time.time() - t0
    du = shutil.disk_usage(ROOT)
    print(f"DONE: {n} new complexes in {dt:.0f} s ({n/max(dt,1e-9):.0f}/s); "
          f"disk free {du.free/2**30:.0f} GiB", flush=True)


if __name__ == "__main__":
    main()
