"""Re-run the ROUND-3 DIVERGED control: pp-configuration (Gaussian
sequence channel, `--loss_mode per_position`) random-init model scored
on the quality val split — now with the default-on sampler guard
(`cli/common.py sample_guard`, round-4) so non-finite trajectories
clamp instead of decoding to all-X (VERDICT r3 item 7, second half).

A random-init control needs no trained checkpoint, only the cell's
ModelConfig (docs/QUALITY.md pp cell: paper h64x1, T=1000), so the
round-3 pp checkpoint's deletion does not block the rerun.
Writes benchmarks/quality_report_r4_pp_control.json.
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
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.data.collate import collate_fn, numeric_batch
from protein_redesign_tpu.data.dataset import load_complex_cache, load_split_ids
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache

DATA = os.environ.get("PRD_QUALITY_DATA", "/tmp/prd_quality/data")
OUT = os.environ.get(
    "PRD_QUALITY_REPORT_OUT",
    "/root/repo/benchmarks/quality_report_r4_pp_control.json",
)

enable_compilation_cache()

# The pp cell's architecture (docs/QUALITY.md protocol; the Gaussian
# sequence channel is the config DEFAULT — seq_process unset).
cfg = ModelConfig(
    esm_dim=320, head_dim=64, num_heads=1,
    single_dim=512, pair_dim=64, num_blocks=4, num_steps=1000,
    training_mode=False,
)
model = ProteinReDiffModel(cfg)
val_ids = load_split_ids(DATA, "val")

init_batch = {
    k: np.asarray(v)
    for k, v in numeric_batch(collate_fn(
        [load_complex_cache(f"{DATA}/cache", val_ids[0])], buckets=(256,)
    )).items()
}
rand_params = model.init_params(jax.random.PRNGKey(99), init_batch)
control = SamplingRunner(model, rand_params, batch_size=4, mask_prob=0.15)
rows = eval_complexes(
    control, val_ids, f"{DATA}/cache", 4, label="pp-control", verbose=True
)
tm = np.mean([r["tm_mean"] for r in rows])
rec = np.mean([r["recovery"] for r in rows])
recm = np.nanmean([r["recovery_masked"] for r in rows])
div = np.mean([r["diversity"] for r in rows])
print(f"== pp random-init control (guarded): TM(mean)={tm:.3f} "
      f"recovery={rec:.3f} recovery_masked={recm:.3f} diversity={div:.3f}")
json.dump({"val_random_init_pp": rows}, open(OUT, "w"), indent=1)
print("report written")
