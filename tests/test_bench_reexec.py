"""bench.py relay-drop resilience: one re-exec on the warm cache.

The tunneled relay drops live connections mid-compile (four times in the
round-5 session; one drop killed a bench run inside init_params, before
any guarded leg). bench.py's __main__ must re-exec itself exactly once
(PRD_BENCH_REEXEC guard) so the second attempt rides the persistent
compilation cache, and must re-raise on the second failure.

Driven by exec'ing the real file with a raising main() and a stubbed
os.execv — no TPU, no jax backend touched.
"""

import os
import sys
from pathlib import Path

import pytest

BENCH = Path(__file__).resolve().parents[1] / "bench.py"


def _exec_bench_with_raising_main(monkeypatch, env_reexec):
    src = BENCH.read_text().replace(
        "def main():",
        'def main():\n    raise RuntimeError("boom")\n\ndef _unused():',
        1,
    )
    if env_reexec is None:
        monkeypatch.delenv("PRD_BENCH_REEXEC", raising=False)
    else:
        monkeypatch.setenv("PRD_BENCH_REEXEC", env_reexec)
    calls = []
    monkeypatch.setattr(
        os, "execv", lambda exe, argv: calls.append((exe, argv))
    )
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    try:
        exec(compile(src, str(BENCH), "exec"), {"__name__": "__main__"})
    except RuntimeError as e:
        return calls, e
    return calls, None


def test_first_failure_reexecs_once(monkeypatch):
    calls, err = _exec_bench_with_raising_main(monkeypatch, None)
    assert len(calls) == 1
    exe, argv = calls[0]
    assert exe == sys.executable and argv[0] == sys.executable
    assert os.environ["PRD_BENCH_REEXEC"] == "1"
    # with execv stubbed, control falls through to the re-raise
    assert err is not None and "boom" in str(err)


def test_second_failure_reraises_without_reexec(monkeypatch):
    calls, err = _exec_bench_with_raising_main(monkeypatch, "1")
    assert calls == []
    assert err is not None and "boom" in str(err)
