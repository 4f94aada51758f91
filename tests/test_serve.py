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
