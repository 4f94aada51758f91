"""Post-training sampling-quality report: exercises the entire L0->L6
stack with the in-framework-trained weights (VERDICT round-1 item #5).

For each evaluated complex: sample NUM_SAMPLES designs, score the CA
trace against the cached ground-truth fold with mirror-aware TM-align,
and measure sequence recovery/diversity. A random-init model is scored
on the val split as the control. Methodology: docs/QUALITY.md.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from synth_common import eval_complexes
from protein_redesign_tpu.cli.common import SamplingRunner
from protein_redesign_tpu.cli.generate import _load_params
from protein_redesign_tpu.data.collate import collate_fn, numeric_batch
from protein_redesign_tpu.data.dataset import load_complex_cache, load_split_ids
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache

CKPT = os.environ.get(
    "PRD_QUALITY_CKPT", "/tmp/prd_quality/run/checkpoints"
)
DATA = os.environ.get("PRD_QUALITY_DATA", "/tmp/prd_quality/data")
NUM_SAMPLES = 4

enable_compilation_cache()

params, cfg = _load_params(CKPT)  # sample at the trained T
# PRD_QUALITY_OVERRIDES='{"pair_stream_bf16": true}': sampling-side
# ModelConfig overrides for serving-lever validation on a trained
# checkpoint (ROADMAP #2 — numerics-only flags; params are unchanged).
_overrides = json.loads(os.environ.get("PRD_QUALITY_OVERRIDES", "{}"))
if _overrides:
    print(f"config overrides: {_overrides}")
    cfg = cfg.replace(**_overrides)
model = ProteinReDiffModel(cfg.replace(training_mode=False))
val_ids = load_split_ids(DATA, "val")
train_ids = load_split_ids(DATA, "train")[:8]


def eval_ids(runner, ids, label):
    return eval_complexes(
        runner, ids, f"{DATA}/cache", NUM_SAMPLES, label=label, verbose=True
    )


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
    recm = np.nanmean([r["recovery_masked"] for r in rows])
    div = np.mean([r["diversity"] for r in rows])
    print(f"== {split}: TM(mean)={tm:.3f} recovery={rec:.3f} "
          f"recovery_masked={recm:.3f} diversity={div:.3f}")
json.dump(out, open(os.environ.get("PRD_QUALITY_REPORT_OUT", "/tmp/prd_quality/report.json"), "w"), indent=1)
print("report written")
