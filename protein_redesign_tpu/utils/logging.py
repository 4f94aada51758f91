"""Metrics logging + profiling hooks (aux subsystem; SURVEY.md §5).

The reference logs only train/val loss through Lightning (`model.py:541-548`)
with no tracing. Here: JSONL + CSV metric streams and first-class
``jax.profiler`` trace capture around chosen steps.
"""

from __future__ import annotations

import csv
import json
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Union


class MetricsLogger:
    """Append-only JSONL + CSV metrics under <save_dir>/metrics.*

    ``enabled=False`` turns every log() into a no-op: on multi-host
    runs only process 0 may write (every host computes identical global
    metrics, and hosts share the save dir on clustered filesystems —
    unconditional appends interleave duplicate rows; the reference's
    Lightning logger is rank-zero-only the same way)."""

    def __init__(self, save_dir: Union[str, Path], enabled: bool = True):
        self.enabled = enabled
        self.dir = Path(save_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.jsonl_path = self.dir / "metrics.jsonl"
        self.csv_path = self.dir / "metrics.csv"
        self._csv_fields: Optional[list] = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        row = {
            "step": int(step),
            "time": round(time.time() - self._t0, 3),
            **{k: _scalar(v) for k, v in metrics.items()},
        }
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._csv_fields is None:
            self._csv_fields = list(row.keys())
            if not self.csv_path.exists():
                with open(self.csv_path, "w", newline="") as f:
                    csv.DictWriter(f, self._csv_fields).writeheader()
        with open(self.csv_path, "a", newline="") as f:
            csv.DictWriter(
                f, self._csv_fields, extrasaction="ignore"
            ).writerow(row)


def _scalar(v: Any) -> Any:
    # A replicated global array on a multi-process mesh refuses float();
    # host_scalar reads this host's shard (single multi-host read path).
    from ..parallel.mesh import host_scalar

    try:
        return float(host_scalar(v))
    except (TypeError, ValueError):
        return str(v)


@contextmanager
def maybe_profile(
    save_dir: Union[str, Path], enabled: bool
) -> Iterator[None]:
    """Capture a jax.profiler trace into <save_dir>/profile when enabled."""
    if not enabled:
        yield
        return
    import jax

    trace_dir = str(Path(save_dir) / "profile")
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
