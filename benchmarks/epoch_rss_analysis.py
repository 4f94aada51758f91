"""Summarize the device-side epoch-leg RSS samples (VERDICT r4 #7).

Input: the chain watcher's RSS sample files (`<t_epoch_s> <rss_kb>` per
line, 10 s cadence) plus the training log for step timestamps. Emits one
JSON line per leg: steady-state RSS slope (MB/step and MB/s over the
stepping window), peak RSS, steps completed, and step rate — the numbers
that close the host transfer-leak story (CLAUDE.md: the axon client
leaks every host->device staging buffer; `--cache_device_batches` is
the mitigation; reference epoch loop `data.py:206-259`).

    python benchmarks/epoch_rss_analysis.py \
        /tmp/r5s2_epoch_stream.rss /tmp/r5s2_epoch_stream.log stream
"""

import json
import re
import sys

import numpy as np


def main(rss_path, log_path, label):
    rows = []
    for line in open(rss_path):
        parts = line.split()
        if len(parts) == 2:
            rows.append((float(parts[0]), float(parts[1]) / 1024.0))
    if len(rows) < 3:
        print(json.dumps({"leg": label, "error": "too few RSS samples"}))
        return
    t = np.array([r[0] for r in rows])
    rss = np.array([r[1] for r in rows])
    t -= t[0]

    steps = 0
    step_rate = None
    text = open(log_path, errors="replace").read()
    step_nums = [int(m) for m in re.findall(r"step[ =:]+(\d+)", text)]
    if step_nums:
        steps = max(step_nums)
    # step rate over the whole wall window (includes compile; labeled)
    if steps and t[-1] > 0:
        step_rate = steps / t[-1]

    # Steady-state slope: skip the first third (compile + warmup ramp).
    k = max(2, len(t) // 3)
    A = np.vstack([t[k:], np.ones_like(t[k:])]).T
    slope_mb_s, _ = np.linalg.lstsq(A, rss[k:], rcond=None)[0]
    out = {
        "leg": label,
        "samples": len(rows),
        "wall_s": round(float(t[-1]), 1),
        "steps": steps,
        "steps_per_s": round(step_rate, 3) if step_rate else None,
        "rss_start_mb": round(float(rss[0]), 1),
        "rss_peak_mb": round(float(rss.max()), 1),
        "rss_slope_mb_per_s": round(float(slope_mb_s), 3),
        "rss_slope_mb_per_step": (
            round(float(slope_mb_s / step_rate), 2) if step_rate else None
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(*sys.argv[1:4])
