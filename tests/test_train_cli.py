"""End-to-end train CLI smoke test on a synthetic mini-dataset (CPU mesh)."""

import json
import jax
import numpy as np
import pytest


@pytest.fixture()
def mini_data(tmp_path):
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.data import (
        ligand_to_data,
        protein_to_data,
        save_complex_cache,
    )

    data_dir = tmp_path / "data"
    cache = data_dir / "PDB_processed_cache"
    rng = np.random.RandomState(0)
    ids = {"train": ["t1", "t2", "t3", "t4"], "val": ["v1"], "test": ["x1"]}
    for split, names in ids.items():
        (data_dir).mkdir(parents=True, exist_ok=True)
        (data_dir / f"PRD_{split}_pdb_ids").write_text(
            "\n".join(names) + "\n"
        )
        for name in names:
            mol = update_mol_positions(
                mol_from_smiles("CCO"), rng.randn(3, 3).astype(np.float32)
            )
            n_res = int(rng.randint(5, 9))
            prot = protein_from_sequence("ACDEFGHIKLMN"[:n_res])
            prot.atom_pos[:, 1] = rng.randn(n_res, 3)
            d = {
                **ligand_to_data(mol),
                **protein_to_data(
                    prot,
                    residue_esm=rng.randn(n_res, 16).astype(np.float32),
                    esm_dim=16,
                ),
            }
            save_complex_cache(cache, name, d)
    return data_dir


def test_train_cli_runs_and_resumes(mini_data, tmp_path):
    from protein_redesign_tpu.cli.train import main

    save_dir = tmp_path / "run"
    argv = [
        "--save_dir", str(save_dir),
        "--data_dir", str(mini_data),
        "--batch_size", "2",
        "--buckets", "16,24",
        "--esm_dim", "16", "--time_dim", "8", "--dist_dim", "8",
        "--single_dim", "16", "--pair_dim", "8", "--head_dim", "4",
        "--num_heads", "2", "--num_blocks", "1", "--num_steps", "4",
        "--dtype", "float32",
        "--max_steps", "3", "--val_every_steps", "2",
        "--log_every_steps", "1", "--warmup_steps", "2",
    ]
    main(argv)
    ckpt_dir = save_dir / "checkpoints"
    assert ckpt_dir.exists()
    metrics = [
        json.loads(l)
        for l in (save_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("train_loss" in m for m in metrics)
    assert any("val_loss" in m for m in metrics)

    # Resume for a couple more steps from the written checkpoint.
    main(argv[:1] + [str(save_dir)] + argv[2:] + [
        "--trained_ckpt", str(ckpt_dir), "--max_steps", "5",
    ])
    from protein_redesign_tpu.utils.checkpoint import load_checkpoint

    state, cfg = load_checkpoint(ckpt_dir)
    assert int(state.step) >= 3
    assert cfg.single_dim == 16


def test_export_params_cli(mini_data, tmp_path):
    """Train a couple of steps, export the best checkpoint's EMA weights,
    and load the artifact the way the inference CLIs do."""
    from protein_redesign_tpu.cli.export_params import main as export_main
    from protein_redesign_tpu.cli.train import main as train_main
    from protein_redesign_tpu.utils.checkpoint import (
        load_checkpoint,
        load_params_only,
    )

    save_dir = tmp_path / "run_exp"
    train_main([
        "--save_dir", str(save_dir),
        "--data_dir", str(mini_data),
        "--batch_size", "2",
        "--buckets", "16,24",
        "--esm_dim", "16", "--time_dim", "8", "--dist_dim", "8",
        "--single_dim", "16", "--pair_dim", "8", "--head_dim", "4",
        "--num_heads", "2", "--num_blocks", "1", "--num_steps", "4",
        "--dtype", "float32",
        "--max_steps", "2", "--val_every_steps", "2",
        "--log_every_steps", "1", "--warmup_steps", "2",
    ])
    out = tmp_path / "export"
    export_main([str(save_dir / "checkpoints"), str(out)])
    params, cfg = load_params_only(out, num_steps=7)
    assert cfg.num_steps == 7  # per-load override works on the export
    assert cfg.single_dim == 16
    state, _ = load_checkpoint(save_dir / "checkpoints", prefer="best")
    ref_leaf = jax.tree_util.tree_leaves(state.ema_params)[0]
    exp_leaf = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(exp_leaf), np.asarray(ref_leaf))


def test_train_cli_device_batch_cache(mini_data, tmp_path, capsys):
    """--cache_device_batches: batches transferred once, reused across
    epochs (the axon host-leak workaround / zero-steady-state-transfer
    path) must train to finite losses like the streaming path."""
    import json

    from protein_redesign_tpu.cli.train import main

    save_dir = tmp_path / "run_cached"
    main([
        "--save_dir", str(save_dir),
        "--data_dir", str(mini_data),
        "--batch_size", "2",
        "--buckets", "16,24",
        "--esm_dim", "16", "--time_dim", "8", "--dist_dim", "8",
        "--single_dim", "16", "--pair_dim", "8", "--head_dim", "4",
        "--num_heads", "2", "--num_blocks", "1", "--num_steps", "4",
        "--dtype", "float32",
        "--max_steps", "5", "--val_every_steps", "4",
        "--log_every_steps", "1", "--warmup_steps", "2",
        "--cache_device_batches",
    ])
    out = capsys.readouterr().out
    assert "device batch cache:" in out
    metrics = [
        json.loads(l)
        for l in (save_dir / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [m["train_loss"] for m in metrics if "train_loss" in m]
    assert len(losses) >= 5 and all(np.isfinite(losses))


def test_field_absent_outer_factored_restores_false(tmp_path):
    """Pre-round-3 checkpoints (config JSON written before the
    outer_factored field existed) must restore the unfactored path —
    their original numerics — not pick up the new default True
    (ADVICE r3). Stored values and explicit overrides still win."""
    from protein_redesign_tpu.config import ModelConfig
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
    from protein_redesign_tpu.utils.checkpoint import (
        load_params_only,
        save_params_only,
    )
    from __graft_entry__ import _make_batch

    cfg = ModelConfig(
        esm_dim=8, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
        head_dim=4, num_heads=2, num_blocks=1, num_steps=4,
        dtype="float32", remat=False,
    )
    batch = _make_batch(n_atoms=3, n_res=5, bucket=16, esm_dim=8, batch=1)
    params = ProteinReDiffModel(cfg).init_params(jax.random.PRNGKey(0), batch)
    out = tmp_path / "export"
    save_params_only(out, params, cfg)

    # Simulate a pre-round-3 artifact: drop the field from config.json.
    cfg_path = out / "config.json"
    d = json.loads(cfg_path.read_text())
    assert d["outer_factored"] is True  # current default round-trips
    del d["outer_factored"]
    cfg_path.write_text(json.dumps(d))

    _, restored = load_params_only(out)
    assert restored.outer_factored is False
    _, forced = load_params_only(out, outer_factored=True)
    assert forced.outer_factored is True


def test_sigterm_checkpoints_and_resumes(mini_data, tmp_path):
    """Kill-and-resume END-TO-END (VERDICT r3 item 6): SIGTERM a live
    training subprocess mid-epoch, assert the signal handler
    (`cli/train.py` interrupted-path) wrote a checkpoint, then resume
    from it and assert exact step continuity."""
    import os
    import signal
    import subprocess
    import sys
    import time

    save_dir = tmp_path / "run_sig"
    argv = [
        sys.executable, "-u", "-m", "protein_redesign_tpu.cli.train",
        "--save_dir", str(save_dir),
        "--data_dir", str(mini_data),
        "--batch_size", "2",
        "--buckets", "16,24",
        "--esm_dim", "16", "--time_dim", "8", "--dist_dim", "8",
        "--single_dim", "16", "--pair_dim", "8", "--head_dim", "4",
        "--num_heads", "2", "--num_blocks", "1", "--num_steps", "4",
        "--dtype", "float32",
        # Only the signal can stop it inside the test window; no
        # validation saves, so any checkpoint provably came from the
        # SIGTERM handler.
        "--max_steps", "100000", "--val_every_steps", "0",
        "--log_every_steps", "1", "--warmup_steps", "2",
    ]
    env = dict(os.environ, PRD_PLATFORM="cpu")
    proc = subprocess.Popen(
        argv, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    try:
        # Wait until training demonstrably progresses (metrics lines).
        metrics_path = save_dir / "metrics.jsonl"
        deadline = time.time() + 300
        while time.time() < deadline:
            if metrics_path.exists() and len(
                metrics_path.read_text().splitlines()
            ) >= 3:
                break
            time.sleep(1.0)
            assert proc.poll() is None, proc.stdout.read()
        else:
            raise AssertionError("training never reached step 3")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, out
    assert "interrupted at step" in out, out

    from protein_redesign_tpu.utils.checkpoint import load_checkpoint

    ckpt_dir = save_dir / "checkpoints"
    state, cfg = load_checkpoint(ckpt_dir)
    k = int(state.step)
    assert k >= 3

    # Resume IN-PROCESS from the signal checkpoint for 2 more steps.
    from protein_redesign_tpu.cli.train import main

    main([
        "--save_dir", str(save_dir),
        "--data_dir", str(mini_data),
        "--batch_size", "2",
        "--buckets", "16,24",
        "--esm_dim", "16", "--time_dim", "8", "--dist_dim", "8",
        "--single_dim", "16", "--pair_dim", "8", "--head_dim", "4",
        "--num_heads", "2", "--num_blocks", "1", "--num_steps", "4",
        "--dtype", "float32",
        "--trained_ckpt", str(ckpt_dir),
        "--max_steps", str(k + 2), "--val_every_steps", str(k + 2),
        "--log_every_steps", "1", "--warmup_steps", "2",
    ])
    state2, _ = load_checkpoint(ckpt_dir)
    assert int(state2.step) == k + 2  # exact-step continuity
    steps_logged = [
        json.loads(l)["step"]
        for l in (save_dir / "metrics.jsonl").read_text().splitlines()
    ]
    # The resumed run logged the CONTINUATION steps, not a restart at 1.
    assert k + 1 in steps_logged and k + 2 in steps_logged


def test_train_cli_bounded_device_cache(mini_data, tmp_path, capsys):
    """--device_cache_gb: a tiny budget keeps only a prefix of the
    epoch-0 batches device-resident and streams the rest, with epoch
    composition identical to the unbounded cache (PDBbind-scale path)."""
    from protein_redesign_tpu.cli.train import main

    save_dir = tmp_path / "run_bounded"
    main([
        "--save_dir", str(save_dir),
        "--data_dir", str(mini_data),
        "--batch_size", "2",
        "--buckets", "16,24",
        "--esm_dim", "16", "--time_dim", "8", "--dist_dim", "8",
        "--single_dim", "16", "--pair_dim", "8", "--head_dim", "4",
        "--num_heads", "2", "--num_blocks", "1", "--num_steps", "4",
        "--dtype", "float32",
        "--max_steps", "6", "--val_every_steps", "6",
        "--log_every_steps", "1", "--warmup_steps", "2",
        "--cache_device_batches",
        "--device_cache_gb", "1e-6",  # ~1 KB: forces host-resident overflow
    ])
    out = capsys.readouterr().out
    assert "host-resident streamed/epoch" in out
    metrics = [
        json.loads(l)
        for l in (save_dir / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [m["train_loss"] for m in metrics if "train_loss" in m]
    assert len(losses) >= 6 and all(np.isfinite(losses))


def test_unknown_config_keys_restore_with_warning(mini_data, tmp_path):
    """Forward compatibility: a checkpoint whose config JSON carries keys
    this version does not know (written by a newer framework) restores
    with a warning instead of a TypeError (utils/checkpoint.py
    _build_model_config)."""
    import warnings

    from protein_redesign_tpu.cli.train import main
    from protein_redesign_tpu.utils.checkpoint import load_checkpoint

    save_dir = tmp_path / "run_fwd"
    main([
        "--save_dir", str(save_dir),
        "--data_dir", str(mini_data),
        "--batch_size", "2",
        "--buckets", "16,24",
        "--esm_dim", "16", "--time_dim", "8", "--dist_dim", "8",
        "--single_dim", "16", "--pair_dim", "8", "--head_dim", "4",
        "--num_heads", "2", "--num_blocks", "1", "--num_steps", "4",
        "--dtype", "float32",
        "--max_steps", "1", "--val_every_steps", "1",
        "--log_every_steps", "1", "--warmup_steps", "1",
    ])
    ckpt = save_dir / "checkpoints"
    # Inject a future-version key into the stored config JSON.
    import json as _json

    for meta in ckpt.glob("*/config/*"):
        if meta.name.endswith(".json") or meta.name == "metadata":
            pass
    # Orbax stores the config item as a JSON file under <step>/config.
    cfg_files = list(ckpt.glob("*/config*/**/*.json")) or list(
        ckpt.glob("*/config/*")
    )
    patched = 0
    for f in cfg_files:
        try:
            d = _json.loads(f.read_text())
        except Exception:
            continue
        if isinstance(d, dict) and "single_dim" in d:
            d["field_from_the_future"] = 123
            f.write_text(_json.dumps(d))
            patched += 1
    assert patched, f"no config JSON found under {ckpt}"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        state, cfg = load_checkpoint(ckpt)
    assert cfg.single_dim == 16
    assert any("field_from_the_future" in str(x.message) for x in w)
