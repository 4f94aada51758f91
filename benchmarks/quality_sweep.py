"""Sampler quality sweep on in-framework-trained weights (ROADMAP #5).

Compares the full sequential DDPM sampler against accelerated DDIM
subsequences and the parallel-in-time Picard sampler, all from the SAME
trained checkpoint, on the synthetic val split: mirror-aware TM-score to
the cached ground-truth fold, sequence recovery, and sequence diversity
(`utils/metrics.py`). Publishes the official serving configuration in
BASELINE.md. Methodology: docs/QUALITY.md.

Usage (TPU, after benchmarks/prep_synth_dataset.py + cli.train):
    python benchmarks/quality_sweep.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from synth_common import eval_complexes
from protein_redesign_tpu.cli.common import SamplingRunner
from protein_redesign_tpu.cli.generate import _load_params
from protein_redesign_tpu.data.dataset import load_split_ids
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.utils.compile_cache import enable_compilation_cache

CKPT = os.environ.get(
    "PRD_QUALITY_CKPT", "/tmp/prd_quality/run/checkpoints"
)
DATA = os.environ.get("PRD_QUALITY_DATA", "/tmp/prd_quality/data")
OUT = os.environ.get("PRD_QUALITY_SWEEP_OUT", "/tmp/prd_quality/sweep.json")
NUM_SAMPLES = 4
MASK_PROB = 0.15

enable_compilation_cache()

params, cfg = _load_params(CKPT)  # sample at the trained T
model = ProteinReDiffModel(cfg.replace(training_mode=False))
val_ids = load_split_ids(DATA, "val")


def eval_runner(runner, label, mask_prob=None):
    t_start = time.perf_counter()
    rows = eval_complexes(
        runner, val_ids, f"{DATA}/cache", NUM_SAMPLES, mask_prob=mask_prob
    )
    wall = time.perf_counter() - t_start
    agg = {
        "tm_mean": float(np.mean([r["tm_mean"] for r in rows])),
        "tm_max": float(np.mean([r["tm_max"] for r in rows])),
        "recovery": float(np.mean([r["recovery"] for r in rows])),
        "recovery_masked": float(
            np.nanmean([r["recovery_masked"] for r in rows])
        ),
        "diversity": float(np.mean([r["diversity"] for r in rows])),
        "wall_s_incl_compile": round(wall, 1),
        "rows": rows,
    }
    print(f"== {label}: TM={agg['tm_mean']:.3f} (max {agg['tm_max']:.3f}) "
          f"recovery={agg['recovery']:.3f} "
          f"recovery_masked={agg['recovery_masked']:.3f} "
          f"diversity={agg['diversity']:.3f} "
          f"wall={wall:.0f}s", flush=True)
    return agg


CONFIGS = [
    ("ddpm_full", dict(sampler="ddpm")),
    ("ddim_100", dict(sampler="ddim", ddim_steps=100)),
    ("ddim_50", dict(sampler="ddim", ddim_steps=50)),
    ("ddim_25", dict(sampler="ddim", ddim_steps=25)),
    ("ddim_parallel_50_w8", dict(sampler="ddim_parallel", ddim_steps=50,
                                 window=8, ptol=1e-3)),
]

out = {}
ddpm_runner = None
for label, kw in CONFIGS:
    runner = SamplingRunner(
        model, params, batch_size=NUM_SAMPLES, mask_prob=MASK_PROB, **kw
    )
    if kw.get("sampler") == "ddpm":
        ddpm_runner = runner
    out[label] = eval_runner(runner, label)

# Mask-fraction sweep: mask_prob is a TRACED argument of the compiled
# sampler, so these rows reuse the DDPM runner with zero recompiles.
for mp in (0.3, 0.5, 1.0):
    out[f"ddpm_mask{int(mp * 100)}"] = eval_runner(
        ddpm_runner, f"ddpm_mask{int(mp * 100)}", mask_prob=mp
    )

json.dump(out, open(OUT, "w"), indent=1)
print(f"sweep written to {OUT}")
