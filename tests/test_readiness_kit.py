"""Real-data readiness kit (scripts/fetch_real_assets.py): every step
that can run offline must run NOW, so the day egress exists only the
downloads themselves are untested (VERDICT r2 #5)."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_preprocess_cli import pdbbind_layout  # noqa: F401


def _kit(tmp_path, monkeypatch):
    # Load by file path: `scripts/` is a namespace package (no
    # __init__.py), and earlier tests in a full-suite run can poison the
    # cached `scripts` namespace portion (observed: ModuleNotFoundError
    # for scripts.fetch_real_assets after 234 green tests), so a plain
    # `import scripts.fetch_real_assets` is order-dependent.
    kit = sys.modules.get("_fetch_real_assets_kit")
    if kit is None:
        path = Path(__file__).resolve().parents[1] / "scripts" / \
            "fetch_real_assets.py"
        spec = importlib.util.spec_from_file_location(
            "_fetch_real_assets_kit", path)
        kit = importlib.util.module_from_spec(spec)
        sys.modules["_fetch_real_assets_kit"] = kit
        spec.loader.exec_module(kit)

    monkeypatch.setattr(kit, "OUT_ROOT", tmp_path / "assets")
    monkeypatch.setattr(kit, "MANIFEST",
                        tmp_path / "assets" / "real_assets_manifest.json")
    return kit


def test_esm2_step_fails_gracefully_offline(tmp_path, monkeypatch):
    kit = _kit(tmp_path, monkeypatch)
    rc = kit.main(["esm2", "--esm_model", "/nonexistent/esm2"])
    assert rc == 1  # clean failure, no traceback


def test_prd_ckpt_step_converts_and_smokes(tmp_path, monkeypatch):
    """The convert -> sample leg runs end-to-end on a synthetic
    Lightning checkpoint and records source hash + smoke result in the
    manifest."""
    pytest.importorskip("torch")
    from tests.test_convert_cli import make_lightning_ckpt

    kit = _kit(tmp_path, monkeypatch)
    ckpt = tmp_path / "PRD_ver1.ckpt"
    make_lightning_ckpt(ckpt)
    rc = kit.main(["prd_ckpt", "--ckpt", str(ckpt)])
    assert rc == 0
    manifest = json.loads(kit.MANIFEST.read_text())
    assert manifest["prd_ckpt"]["sample_smoke_ok"] is True
    assert len(manifest["prd_ckpt"]["source_sha256"]) == 64


def test_pdbbind_step_preprocesses_shard(tmp_path, monkeypatch,
                                         pdbbind_layout):  # noqa: F811
    kit = _kit(tmp_path, monkeypatch)
    data_dir, ids = pdbbind_layout
    # Point the kit's in-repo id lists at the fixture's (monkeypatch the
    # repo-data resolution by copying fixture ids over OUT_ROOT's view is
    # heavier; instead call with --src and patch repo_data via argv is
    # not exposed — so patch Path resolution through the env: simplest is
    # to chdir into the fixture's data dir layout).
    import protein_redesign_tpu.cli.preprocess_pdbbind as prep

    orig_main = prep.main

    def patched(argv):
        # swap the kit's repo data dir for the fixture's
        argv = list(argv)
        argv[argv.index("--data_dir") + 1] = str(data_dir)
        return orig_main(argv)

    monkeypatch.setattr(prep, "main", patched)
    rc = kit.main(["pdbbind", "--src",
                   str(data_dir / "PDBbind_processed"), "--limit", "1"])
    assert rc == 0
    manifest = json.loads(kit.MANIFEST.read_text())
    assert manifest["pdbbind"]["complexes_cached"] == 1


def test_prd_ckpt_requires_path(tmp_path, monkeypatch):
    kit = _kit(tmp_path, monkeypatch)
    assert kit.main(["prd_ckpt"]) == 1
    assert kit.main(["pdbbind"]) == 1
