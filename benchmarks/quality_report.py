"""Post-training sampling-quality report: exercises the entire L0->L6
stack with the in-framework-trained weights (VERDICT round-1 item #5).

For each evaluated complex: sample NUM_SAMPLES designs, score the CA
trace against the synthetic helix reference with mirror-aware TM-align,
and measure sequence recovery/diversity. A random-init model is scored
on the val split as the control.
"""
import json
import os
import sys
import zlib

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from synth_common import (
    AA,
    protein_with_ca,
    reference_from_cache,
    seq_from_residue_types,
)
from protein_redesign_tpu.cli.common import SamplingRunner
from protein_redesign_tpu.cli.generate import _load_params
from protein_redesign_tpu.data.collate import collate_fn, numeric_batch
from protein_redesign_tpu.data.dataset import load_complex_cache, load_split_ids
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.utils import metrics as M

CKPT = "/tmp/prd_quality/run/checkpoints"
DATA = "/tmp/prd_quality/data"
NUM_SAMPLES = 4

from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

params, cfg = _load_params(CKPT)  # sample at the trained T
model = ProteinReDiffModel(cfg.replace(training_mode=False))
val_ids = load_split_ids(DATA, "val")
train_ids = load_split_ids(DATA, "train")[:8]


def eval_ids(runner, ids, label):
    rows = []
    for pid in ids:
        data = load_complex_cache(f"{DATA}/cache", pid)
        n_res = int(data["num_residues"])
        n_lig = int(data["num_atoms"])
        true_seq = seq_from_residue_types(data["residue_type"])
        ref = reference_from_cache(data)
        results = runner.run(
            [data] * NUM_SAMPLES, jax.random.PRNGKey(zlib.crc32(pid.encode()))
        )
        tms, seqs = [], []
        for pos, seq_prob in results:
            sp = protein_with_ca(true_seq, pos[n_lig:n_lig + n_res])
            tms.append(M.tm_scores([sp], ref)[0])
            toks = np.argmax(seq_prob[n_lig:n_lig + n_res], axis=-1)
            seqs.append("".join(("X" + AA)[t] for t in toks))
        rows.append({
            "id": pid, "n_res": n_res,
            "tm_mean": float(np.mean(tms)), "tm_max": float(np.max(tms)),
            "recovery": M.sequence_recovery(seqs, true_seq),
            "diversity": M.sequence_diversity(seqs),
        })
        r = rows[-1]
        print(f"{label} {pid}: n={n_res} tm_mean={r['tm_mean']:.3f} "
              f"recovery={r['recovery']:.3f} diversity={r['diversity']:.3f}",
              flush=True)
    return rows


trained = SamplingRunner(model, params, batch_size=4, mask_prob=0.15)
out = {
    "val": eval_ids(trained, val_ids, "val"),
    "train_subset": eval_ids(trained, train_ids, "train"),
}

# Random-init control on the val split.
init_batch = {
    k: np.asarray(v)
    for k, v in numeric_batch(collate_fn(
        [load_complex_cache(f"{DATA}/cache", val_ids[0])], buckets=(256,)
    )).items()
}
rand_params = model.init_params(jax.random.PRNGKey(99), init_batch)
control = SamplingRunner(model, rand_params, batch_size=4, mask_prob=0.15)
out["val_random_init"] = eval_ids(control, val_ids, "control")

for split, rows in out.items():
    tm = np.mean([r["tm_mean"] for r in rows])
    rec = np.mean([r["recovery"] for r in rows])
    div = np.mean([r["diversity"] for r in rows])
    print(f"== {split}: TM(mean)={tm:.3f} recovery={rec:.3f} "
          f"diversity={div:.3f}")
json.dump(out, open("/tmp/prd_quality/report.json", "w"), indent=1)
print("report written")
