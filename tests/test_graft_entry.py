"""Driver entry-point decision logic (__graft_entry__.py).

The driver imports dryrun_multichip under the pinned tunneled-TPU
platform ("axon,cpu"). The decision of whether to re-exec into a
virtual-CPU subprocess must be made from CONFIG ALONE: calling
jax.devices() on the pinned platform initializes the tunneled backend,
which blocks indefinitely while the TPU relay is down (observed
multi-hour outages) and would hang the driver's multichip check.
"""

import jax
import pytest

import __graft_entry__ as g


def _restore_platforms():
    return jax.config.jax_platforms


@pytest.mark.parametrize("pinned", ["axon,cpu", "axon", ""])
def test_pinned_platform_reexecs_without_touching_devices(
    monkeypatch, pinned
):
    saved = jax.config.jax_platforms
    calls = []
    monkeypatch.setattr(g, "_reexec_dryrun", lambda n: calls.append(n))
    monkeypatch.setattr(
        g, "_dryrun_multichip_inprocess",
        lambda n: pytest.fail("in-process branch taken on pinned platform"),
    )
    monkeypatch.setattr(
        jax, "devices",
        lambda *a, **k: pytest.fail(
            "jax.devices() called on the pinned platform (hangs when "
            "the relay is down)"
        ),
    )
    try:
        jax.config.update("jax_platforms", pinned or None)
        g.dryrun_multichip(8)
    finally:
        jax.config.update("jax_platforms", saved)
    assert calls == [8]


def test_cpu_primary_platform_runs_in_process(monkeypatch):
    # conftest forces the cpu platform with 8 virtual devices: the
    # in-process branch must be chosen (no subprocess respawn storms
    # when tests or the __main__ path call dryrun_multichip).
    assert (jax.config.jax_platforms or "").split(",")[0] == "cpu"
    ran = []
    monkeypatch.setattr(
        g, "_dryrun_multichip_inprocess", lambda n: ran.append(n)
    )
    monkeypatch.setattr(
        g, "_reexec_dryrun",
        lambda n: pytest.fail("re-exec taken on cpu platform"),
    )
    g.dryrun_multichip(len(jax.devices()))
    assert ran == [len(jax.devices())]
