"""Serving CLI: JSONL in -> JSONL out, with error isolation."""

import json

from tests.test_cli import TINY, tiny_ckpt  # noqa: F401  (fixture reuse)


def test_serve_jsonl_roundtrip(tiny_ckpt, tmp_path):  # noqa: F811
    from protein_redesign_tpu.cli.serve import main

    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text(
        json.dumps({
            "id": "a", "protein": "ACDEFGHIKL", "ligand": "CCO",
            "num_samples": 2, "seed": 1,
        }) + "\n"
        + json.dumps({"id": "bad", "protein": "ACDE#@!", "ligand": "CCO"})
        + "\n"
        # Same bucket, different mask_prob: must reuse the compiled program.
        + json.dumps({
            "id": "c", "protein": "ACDEFGHIKL", "ligand": "CCO",
            "num_samples": 1, "seed": 2, "mask_prob": 0.9,
        }) + "\n"
        # Malformed-but-{-prefixed line: the error handler itself must not
        # raise (round-1 bug: json.loads(line) inside except).
        + '{"id": "broken", not json\n'
    )
    out = tmp_path / "results.jsonl"
    main([
        "-c", str(tiny_ckpt), "-o", str(tmp_path / "srv"),
        "--num_steps", "2",
        "--input", str(reqs), "--output", str(out),
    ])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 4
    ok = lines[0]
    assert ok["id"] == "a"
    assert len(ok["sequences"]) == 2
    assert len(ok["tmscores"]) == 2
    for p in ok["pdb_files"]:
        assert open(p).read().startswith("ATOM")
    bad = lines[1]
    assert bad["id"] == "bad"
    assert "error" in bad
    ok2 = lines[2]
    assert ok2["id"] == "c"
    assert len(ok2["sequences"]) == 1
    broken = lines[3]
    assert "error" in broken  # handler survived unparseable JSON


def test_request_dir_never_escapes_output_dir(tmp_path):
    """Request ids come from the network: traversal / absolute ids must
    be reduced to a safe component under --output_dir."""
    from protein_redesign_tpu.cli.serve import _claim_request_dir

    for evil in ("../../../etc", "/tmp/evil_abs", "a/../../b", "..", ""):
        d = _claim_request_dir(tmp_path, evil)
        assert d.is_dir()
        assert d.parent == tmp_path, (evil, d)


def test_request_dir_uniquified_across_restarts(tmp_path):
    """Directories left by a previous server process are never silently
    overwritten: the claim skips existing dirs."""
    import protein_redesign_tpu.cli.serve as serve_mod

    (tmp_path / "job1").mkdir()  # from a "previous run"
    serve_mod._claimed_counts.clear()  # fresh process
    d = serve_mod._claim_request_dir(tmp_path, "job1")
    assert d.name == "job1_2"
    d2 = serve_mod._claim_request_dir(tmp_path, "job1")
    assert d2.name == "job1_3"


def test_zero_samples_is_an_error(tmp_path):
    """num_samples<1 must yield an error result, not a silently-empty
    success (the guard fires before the runner/embedder are touched)."""
    from protein_redesign_tpu.cli.serve import handle_line

    result = handle_line(
        json.dumps({"id": "r", "protein": "ACDE", "ligand": "*",
                    "num_samples": 0}),
        runner=None, embedder=None, output_dir=tmp_path,
        default_mask_prob=0.3,
    )
    assert result["id"] == "r" and "error" in result
    assert "num_samples" in result["error"]


def test_warmup_precompiles_buckets(tiny_ckpt, tmp_path):  # noqa: F811
    """warmup_runner compiles the listed buckets so a real request at the
    same bucket does not retrace (first-request latency excludes the
    150-300 s remote compile)."""
    import jax
    import numpy as np

    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.cli.serve import warmup_runner
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

    from __graft_entry__ import _make_batch
    import jax.numpy as jnp

    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = {
        k: jnp.asarray(v) for k, v in _make_batch(4, 8, 16, esm_dim=16).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    runner = SamplingRunner(model, params, buckets=(16,), mask_prob=0.5)
    warmup_runner(runner, [16], esm_dim=16)
    traced = runner.trace_count
    assert traced >= 1
    mol = update_mol_positions(mol_from_smiles("CC"), np.zeros((2, 3)))
    prot = protein_from_sequence("ACDEFGHI")
    data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}
    out = runner.run([data], jax.random.PRNGKey(1))
    assert np.isfinite(out[0][0]).all()
    assert runner.trace_count == traced  # no retrace after warmup


def test_serve_trajectory_request(tiny_ckpt, tmp_path):  # noqa: F811
    """A request with "trajectory": K returns K-model PDB movie paths."""
    from protein_redesign_tpu.cli.serve import main

    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text(json.dumps({
        "id": "t", "protein": "ACDEFGHIKL", "ligand": "CCO",
        "num_samples": 1, "seed": 1, "trajectory": 2,
    }) + "\n")
    out = tmp_path / "results.jsonl"
    main([
        "-c", str(tiny_ckpt), "-o", str(tmp_path / "srv"),
        "--num_steps", "4",
        "--input", str(reqs), "--output", str(out),
    ])
    (resp,) = [json.loads(l) for l in out.read_text().splitlines()]
    assert resp["id"] == "t"
    (traj,) = resp["trajectory_files"]
    assert open(traj).read().count("MODEL") >= 2


def test_serve_ddim_parallel_sampler(tiny_ckpt, tmp_path):  # noqa: F811
    """The parallel-in-time sampler behind the serve CLI."""
    from protein_redesign_tpu.cli.serve import main

    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text(json.dumps({
        "id": "p", "protein": "ACDEFGHIKL", "ligand": "CCO",
        "num_samples": 1, "seed": 5,
    }) + "\n")
    out = tmp_path / "results.jsonl"
    main([
        "-c", str(tiny_ckpt), "-o", str(tmp_path / "srv"),
        "--sampler", "ddim_parallel", "--ddim_steps", "4",
        "--window", "4", "--ptol", "1e-3",
        "--input", str(reqs), "--output", str(out),
    ])
    (resp,) = [json.loads(l) for l in out.read_text().splitlines()]
    assert resp["id"] == "p" and len(resp["sequences"]) == 1


def test_serve_tcp_mode(tiny_ckpt, tmp_path):  # noqa: F811
    """JSONL-over-TCP: two requests (one bad) over a live socket."""
    import queue
    import socket
    import threading

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.cli.serve import serve_tcp
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
    from protein_redesign_tpu.utils.esm import ESMEmbedder

    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = {
        k: jnp.asarray(v) for k, v in _make_batch(4, 8, 16, esm_dim=16).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    runner = SamplingRunner(model, params, buckets=(16,), mask_prob=0.5)
    embedder = ESMEmbedder(esm_dim=16)

    port_q = queue.Queue()
    t = threading.Thread(
        target=serve_tcp,
        args=(0, runner, embedder, tmp_path / "srv", 0.5),
        kwargs={"max_requests": 2, "ready_cb": port_q.put},
        daemon=True,
    )
    t.start()
    port = port_q.get(timeout=60)

    with socket.create_connection(("127.0.0.1", port), timeout=120) as s:
        f = s.makefile("rw")
        f.write(json.dumps({
            "id": "t1", "protein": "ACDEFGHI", "ligand": "CC",
            "num_samples": 1, "seed": 0,
        }) + "\n")
        f.flush()
        r1 = json.loads(f.readline())
        f.write('{"id": "oops", not json\n')
        f.flush()
        r2 = json.loads(f.readline())
    t.join(timeout=60)
    assert not t.is_alive()  # max_requests shut the server down
    assert r1["id"] == "t1" and len(r1["sequences"]) == 1
    assert open(r1["pdb_files"][0]).read().startswith("ATOM")
    assert "error" in r2  # unparseable line -> error result, id unknown


def test_serve_client_script(tiny_ckpt, tmp_path):  # noqa: F811
    """scripts/serve_client.py drives the TCP server: two id-less
    requests over one connection land in DISTINCT output dirs (the
    request-dir claim), ordered responses."""
    import queue
    import sys
    import threading
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.cli.serve import serve_tcp
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
    from protein_redesign_tpu.utils.esm import ESMEmbedder

    scripts_dir = str(Path(__file__).resolve().parents[1] / "scripts")
    if scripts_dir not in sys.path:
        sys.path.insert(0, scripts_dir)
    from serve_client import send_requests

    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = {
        k: jnp.asarray(v) for k, v in _make_batch(4, 8, 16, esm_dim=16).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    runner = SamplingRunner(model, params, buckets=(16,), mask_prob=0.5)
    embedder = ESMEmbedder(esm_dim=16)

    port_q = queue.Queue()
    t = threading.Thread(
        target=serve_tcp,
        args=(0, runner, embedder, tmp_path / "srv", 0.5),
        kwargs={"max_requests": 2, "ready_cb": port_q.put},
        daemon=True,
    )
    t.start()
    port = port_q.get(timeout=60)

    req = {"protein": "ACDEFGHI", "ligand": "CC", "num_samples": 1}
    r1, r2 = send_requests("127.0.0.1", port, [req, {**req, "seed": 1}])
    t.join(timeout=60)
    assert r1["pdb_files"][0] != r2["pdb_files"][0]  # distinct dirs
    for r in (r1, r2):
        assert open(r["pdb_files"][0]).read().startswith("ATOM")


def _tiny_runner(**kw):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = {
        k: jnp.asarray(v) for k, v in _make_batch(4, 8, 16, esm_dim=16).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return SamplingRunner(model, params, mask_prob=0.5, **kw)


def test_warmup_rejects_off_rung_bucket():
    """An off-rung --warmup_buckets value fails fast with a clear error
    instead of silently compiling a shape no request will ever use (or
    crashing inside pick_bucket for oversized values)."""
    import pytest

    from protein_redesign_tpu.cli.serve import warmup_runner

    runner = _tiny_runner(buckets=(16,))
    with pytest.raises(SystemExit, match="not ladder rungs"):
        warmup_runner(runner, [12], esm_dim=16)
    with pytest.raises(SystemExit, match="not ladder rungs"):
        warmup_runner(runner, [2048], esm_dim=16)


def test_default_ladder_matches_data_config():
    """SamplingRunner's default ladder is DataConfig.buckets — every rung
    the data pipeline supports (incl. 2048) is accepted by the CLIs."""
    from protein_redesign_tpu.config import DataConfig

    runner = _tiny_runner()
    assert runner.buckets == DataConfig().buckets
    assert 2048 in runner.buckets


def test_pad_to_batch_compiles_one_shape():
    """pad_to_batch (the serve runner mode): remainder groups are padded
    to batch_size, so an odd num_samples or a later smaller request never
    compiles a second program shape."""
    import jax
    import numpy as np

    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data

    runner = _tiny_runner(buckets=(16,), batch_size=2, pad_to_batch=True)
    mol = update_mol_positions(mol_from_smiles("CC"), np.zeros((2, 3)))
    prot = protein_from_sequence("ACDEFGHI")
    data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}

    out = runner.run([data] * 3, jax.random.PRNGKey(0))  # groups 2 + pad(1->2)
    assert len(out) == 3
    assert all(np.isfinite(p).all() for p, _ in out)
    traced = runner.trace_count
    out2 = runner.run([data], jax.random.PRNGKey(1))  # group 1 -> padded to 2
    assert np.isfinite(out2[0][0]).all()
    assert runner.trace_count == traced  # no second shape compiled


def test_oversized_request_rejected_without_compiling(tmp_path):
    """A request above --max_nodes returns an error line WITHOUT touching
    the runner or embedder (runner=None would crash if the guard fired
    late) — one client can't stall others behind a 150-300 s bucket
    compile under the device lock."""
    from protein_redesign_tpu.cli.serve import handle_line

    # 10 residues + 3 ligand atoms = 13 nodes > max_nodes=8.
    result = handle_line(
        json.dumps({"id": "big", "protein": "ACDEFGHIKL", "ligand": "CCO",
                    "num_samples": 1}),
        runner=None, embedder=None, output_dir=tmp_path,
        default_mask_prob=0.3, max_nodes=8,
    )
    assert result["id"] == "big" and "error" in result
    assert "max_nodes" in result["error"]
    # At/below the ceiling the guard passes (and the request then fails
    # on runner=None, proving the guard itself let it through).
    result2 = handle_line(
        json.dumps({"id": "fits", "protein": "ACDEF", "ligand": "CCO",
                    "num_samples": 1}),
        runner=None, embedder=None, output_dir=tmp_path,
        default_mask_prob=0.3, max_nodes=8,
    )
    assert "max_nodes" not in result2.get("error", "")


def test_volume_guard_rejects_oversized_num_samples(tmp_path):
    """--max_samples bounds request VOLUME the way --max_nodes bounds
    SIZE: one client asking for a huge num_samples would otherwise hold
    the device lock for every sampling group (and build a
    [data] * num_samples host list) while other connections starve. The
    guard fires before any runner/embedder work (runner=None)."""
    from protein_redesign_tpu.cli.serve import handle_line

    result = handle_line(
        json.dumps({"id": "flood", "protein": "ACDEF", "ligand": "CCO",
                    "num_samples": 1_000_000_000}),
        runner=None, embedder=None, output_dir=tmp_path,
        default_mask_prob=0.3, max_samples=64,
    )
    assert result["id"] == "flood" and "max_samples" in result["error"]
    result2 = handle_line(
        json.dumps({"id": "fits", "protein": "ACDEF", "ligand": "CCO",
                    "num_samples": 64}),
        runner=None, embedder=None, output_dir=tmp_path,
        default_mask_prob=0.3, max_samples=64,
    )
    assert "max_samples" not in result2.get("error", "")


def test_warm_buckets_restrict_runner_ladder(tiny_ckpt, tmp_path,
                                             monkeypatch):  # noqa: F811
    """--warmup_buckets must restrict the runner's bucket ladder to the
    warmed rungs: with the full DataConfig ladder, a request SMALLER
    than the lowest warmed rung picks an unwarmed lower bucket and
    compiles it under the device lock — the stall warming exists to
    prevent. Small requests pad up to a warmed rung instead."""
    import protein_redesign_tpu.cli.common as common
    from protein_redesign_tpu.cli.serve import main

    captured = {}
    orig = common.SamplingRunner

    def spy(*a, **kw):
        captured.update(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(common, "SamplingRunner", spy)
    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text(json.dumps({
        "id": "small", "protein": "ACDEFGHI", "ligand": "CCO",
        "num_samples": 1, "seed": 0,
    }) + "\n")
    out = tmp_path / "results.jsonl"
    main([
        "-c", str(tiny_ckpt), "-o", str(tmp_path / "srv"),
        "--num_steps", "2", "--warmup_buckets", "16",
        "--input", str(reqs), "--output", str(out),
    ])
    assert captured["buckets"] == [16]
    (line,) = [json.loads(l) for l in out.read_text().splitlines()]
    assert line["id"] == "small" and "error" not in line
