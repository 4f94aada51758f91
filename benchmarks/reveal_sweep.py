"""Absorbing reveal-strategy sweep on a trained absorbing checkpoint.

Evaluates the round-2 inference controls (ModelConfig.reveal_schedule /
reveal_temperature / reveal_conf_noise — MaskGIT-style) against the
linear/argmax default, all from the SAME weights, on the synthetic val
split: mirror-aware TM, masked-position recovery, diversity. Each combo
is a distinct compiled program (the controls are structural), so the list
is kept short; rows -> BASELINE.md.

Usage (TPU, after an absorbing cli.train run):
    PRD_QUALITY_CKPT=.../run_xl/checkpoints python benchmarks/reveal_sweep.py
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
    "PRD_QUALITY_CKPT", "/tmp/prd_quality/run_xl/checkpoints"
)
DATA = os.environ.get("PRD_QUALITY_DATA", "/tmp/prd_quality/data")
OUT = os.environ.get(
    "PRD_QUALITY_REVEAL_OUT", "/tmp/prd_quality/reveal_sweep.json"
)
NUM_SAMPLES = 4
MASK_PROB = 0.15

enable_compilation_cache()

params, cfg = _load_params(CKPT)
assert cfg.seq_process == "absorbing", "needs an absorbing checkpoint"
val_ids = load_split_ids(DATA, "val")

CONFIGS = [
    ("linear_argmax", dict(), dict()),
    ("cosine_argmax", dict(reveal_schedule="cosine"), dict()),
    ("cosine_temp05", dict(reveal_schedule="cosine",
                           reveal_temperature=0.5), dict()),
    ("linear_noise10", dict(reveal_conf_noise=1.0), dict()),
    # Serving config: absorbing reveal over the DDIM-50 coordinate grid
    # (20x fewer denoiser evals than the full-T DDPM rows above).
    ("linear_ddim50", dict(), dict(sampler="ddim", ddim_steps=50)),
]

out = {}
for label, overrides, runner_kw in CONFIGS:
    model = ProteinReDiffModel(
        cfg.replace(training_mode=False, **overrides)
    )
    runner = SamplingRunner(
        model, params, batch_size=NUM_SAMPLES, mask_prob=MASK_PROB,
        **runner_kw,
    )
    t0 = time.perf_counter()
    rows = eval_complexes(runner, val_ids, f"{DATA}/cache", NUM_SAMPLES)
    wall = time.perf_counter() - t0
    agg = {
        "tm_mean": float(np.mean([r["tm_mean"] for r in rows])),
        "recovery_masked": float(
            np.nanmean([r["recovery_masked"] for r in rows])
        ),
        "diversity": float(np.mean([r["diversity"] for r in rows])),
        "wall_s_incl_compile": round(wall, 1),
        "rows": rows,
    }
    print(f"== {label}: TM={agg['tm_mean']:.3f} "
          f"recovery_masked={agg['recovery_masked']:.3f} "
          f"diversity={agg['diversity']:.3f} wall={wall:.0f}s", flush=True)
    out[label] = agg

json.dump(out, open(OUT, "w"), indent=1)
print(f"reveal sweep written to {OUT}")
