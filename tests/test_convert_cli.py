"""End-to-end converter CLI: synthetic Lightning ckpt -> export -> generate."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_convert_structure import CFG, reference_named_state_dict


def make_lightning_ckpt(path, cfg=CFG):
    rng = np.random.RandomState(0)
    sd = {
        k: torch.from_numpy(v)
        for k, v in reference_named_state_dict(cfg, rng).items()
    }
    # Frozen projection constants registered by the reference modules
    # (requires_grad=False -> excluded from the EMA shadow).
    sd["embed_beta.0.weight"] = torch.from_numpy(
        np.logspace(-4, 0, cfg.time_dim // 2).astype(np.float32)
    )
    sd["embed_dist.0.center"] = torch.from_numpy(
        np.linspace(0, 2, cfg.dist_dim).astype(np.float32)
    )
    frozen = {"embed_beta.0.weight", "embed_dist.0.center"}
    shadow = [
        (sd[k] + 0.5) for k in sd.keys() if k not in frozen
    ]
    import dataclasses

    ckpt = {
        "state_dict": sd,
        "ema_state_dict": {"shadow_params": shadow},
        "hyper_parameters": dataclasses.asdict(cfg),
    }
    torch.save(ckpt, path)


def test_convert_cli_and_generate(tmp_path):
    from protein_redesign_tpu.cli.convert_checkpoint import main as convert
    from protein_redesign_tpu.cli.generate import main as generate

    ckpt = tmp_path / "ref.ckpt"
    make_lightning_ckpt(ckpt)
    out = tmp_path / "export"
    convert([str(ckpt), str(out)])
    assert (out / "config.json").exists()

    gen_out = tmp_path / "gen"
    generate([
        "-c", str(out), "-o", str(gen_out),
        "-p", "ACDEFGHIKL", "-l", "CCO", "-n", "1",
        "--num_steps", "2",
    ])
    assert (gen_out / "sample_protein.pdb").exists()


def test_ema_shadow_offset(tmp_path):
    """EMA conversion maps shadow tensors (sd + 0.5) to the same paths."""
    from protein_redesign_tpu.utils.convert import load_reference_checkpoint

    ckpt = tmp_path / "ref.ckpt"
    make_lightning_ckpt(ckpt)
    params, ema_params, cfg = load_reference_checkpoint(str(ckpt))
    assert ema_params is not None
    import jax

    p_leaves = jax.tree_util.tree_leaves(params)
    e_leaves = jax.tree_util.tree_leaves(ema_params)
    diffs = [
        float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
        for p, e in zip(p_leaves, e_leaves)
    ]
    # every trainable leaf differs by exactly the 0.5 shadow offset
    assert all(abs(d - 0.5) < 1e-6 for d in diffs), sorted(set(diffs))[:5]



@pytest.mark.slow
def test_convert_cli_paper_scale(tmp_path):
    """PAPER-SCALE convert smoke (VERDICT r2 #5): a synthetic Lightning
    checkpoint at PRD_ver1's exact dims (single 512 / pair 64 / h16x4 /
    4 blocks / esm 1280 / T=1000, reference README.md:147-160 and
    model.py:139-158) through cli/convert_checkpoint -> a 2-step sample
    at a small bucket. Closes the toy-dims-only converter risk for the
    real-PRD_ver1 day: any naming/shape/transpose drift at real dims
    fails here, not then."""
    from protein_redesign_tpu.cli.convert_checkpoint import main as convert
    from protein_redesign_tpu.cli.generate import main as generate
    from protein_redesign_tpu.config import ModelConfig

    paper = ModelConfig(
        single_dim=512, pair_dim=64, head_dim=16, num_heads=4,
        num_blocks=4, esm_dim=1280, time_dim=256, dist_dim=256,
        num_steps=1000, dtype="float32", remat=False,
    )
    ckpt = tmp_path / "prd_ver1_synth.ckpt"
    make_lightning_ckpt(ckpt, cfg=paper)
    out = tmp_path / "export"
    convert([str(ckpt), str(out)])
    assert (out / "config.json").exists()
    import json

    stored = json.loads((out / "config.json").read_text())
    assert stored["single_dim"] == 512 and stored["esm_dim"] == 1280
    gen_out = tmp_path / "gen"
    generate([
        "-c", str(out), "-o", str(gen_out),
        "-p", "ACDEFGHI", "-l", "CCO", "-n", "1",
        "--num_steps", "2", "--seed", "3",
    ])
    pdb = (gen_out / "sample_protein.pdb").read_text()
    assert "ATOM" in pdb
