"""Converter completeness: a reference-named state_dict converts into a
tree with EXACTLY the structure/shapes of a fresh flax init — catching any
naming or transpose drift between `utils/convert.py` and the model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import NUM_CLASSES, ProteinReDiffModel
from protein_redesign_tpu.utils.convert import convert_state_dict

CFG = ModelConfig(
    esm_dim=16, time_dim=8, dist_dim=8, single_dim=32, pair_dim=16,
    head_dim=8, num_heads=2, num_blocks=2, num_steps=4,
    dtype="float32", remat=False,
)


def reference_named_state_dict(cfg: ModelConfig, rng) -> dict:
    """Random tensors under the reference's torch state_dict names
    (`/root/reference/ProteinReDiff/model.py:84-122`, `modules.py`,
    `models/AF2_modules.py`)."""
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32)

    def ln(name, d):
        sd[f"{name}.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(d).astype(np.float32)

    def embed_stack(name, sizes, dim):
        for i, s in enumerate(sizes):
            sd[f"{name}.embeddings.{i}.weight"] = rng.randn(s, dim).astype(
                np.float32
            )

    from protein_redesign_tpu.chem.features import (
        ATOM_FEATURE_SIZES,
        BOND_FEATURE_SIZES,
    )

    D, P = cfg.single_dim, cfg.pair_dim
    embed_stack("embed_atom_feats", ATOM_FEATURE_SIZES, D)
    embed_stack("embed_bond_feats", BOND_FEATURE_SIZES, P)
    lin("embed_beta.1", cfg.time_dim, P, bias=False)
    lin("embed_dist.1", cfg.dist_dim, P, bias=False)
    lin("embed_residue_type.1", NUM_CLASSES, D, bias=False)
    lin("embed_residue_esm.1", cfg.esm_dim, D, bias=False)
    sd["embed_bond_distance.weight"] = rng.randn(
        cfg.max_bond_distance + 1, P
    ).astype(np.float32)
    sd["embed_relpos.weight"] = rng.randn(
        cfg.max_relpos * 2 + 1, P
    ).astype(np.float32)
    lin("weight_radial.1", P, P)
    lin("weight_radial.3", P, 1, bias=False)
    lin("seq_mlp.1", D, D)
    lin("seq_mlp.3", D, NUM_CLASSES, bias=False)

    H, C = cfg.num_heads, cfg.head_dim
    ln("Denoiser.SPAAttnBlock.layer_norm_m", D)
    ln("Denoiser.SPAAttnBlock.linear_z.0", P)
    lin("Denoiser.SPAAttnBlock.linear_z.1", P, H, bias=False)
    for n in ("q", "k", "v"):
        lin(f"Denoiser.SPAAttnBlock.mha.linear_{n}", D, H * D, bias=False)
    lin("Denoiser.SPAAttnBlock.mha.linear_o", H * D, D)
    lin("Denoiser.SPAAttnBlock.mha.linear_g", D, H * D)
    ln("Denoiser.opm.layer_norm", D)
    lin("Denoiser.opm.linear_1", D, D // 4)
    lin("Denoiser.opm.linear_2", D, D // 4)
    lin("Denoiser.opm.linear_out", D // 4, P)
    for i in range(cfg.num_blocks):
        b = f"Denoiser.folding_blocks.{i}"
        lin(f"{b}.attn_bias.1", P, H)
        for proj, bias in (("q_proj", False), ("k_proj", False),
                           ("v_proj", False), ("gate_proj", True),
                           ("out_proj", True)):
            din = D if not proj == "out_proj" else H * C
            dout = H * C if not proj == "out_proj" else D
            lin(f"{b}.single_attn.{proj}", din, dout, bias=bias)
        lin(f"{b}.single_fc.1", D, D * cfg.transition_factor)
        lin(f"{b}.single_fc.3", D * cfg.transition_factor, D)
        lin(f"{b}.outer_linear.linear", 2 * D, P)
        for mode in ("outgoing", "incoming"):
            lin(f"{b}.pair_mul_{mode}.ab_proj", P, 2 * P)
            lin(f"{b}.pair_mul_{mode}.ab_gate", P, 2 * P)
            lin(f"{b}.pair_mul_{mode}.out_proj", P, P)
            lin(f"{b}.pair_mul_{mode}.out_gate", P, P)
        for mode in ("starting", "ending"):
            a = f"{b}.pair_attn_{mode}.attn"
            for proj, bias in (("q_proj", False), ("k_proj", False),
                               ("v_proj", False), ("gate_proj", True),
                               ("out_proj", True)):
                din = P if proj != "out_proj" else H * C
                dout = H * C if proj != "out_proj" else P
                lin(f"{a}.{proj}", din, dout, bias=bias)
        lin(f"{b}.pair_fc.1", P, P * cfg.transition_factor)
        lin(f"{b}.pair_fc.3", P * cfg.transition_factor, P)
    return sd


def test_converted_tree_matches_init_structure():
    model = ProteinReDiffModel(CFG)
    batch = {
        k: jnp.asarray(v)
        for k, v in _make_batch(4, 8, 16, esm_dim=CFG.esm_dim).items()
    }
    init_params = model.init_params(jax.random.PRNGKey(0), batch)

    rng = np.random.RandomState(0)
    sd = reference_named_state_dict(CFG, rng)
    converted = convert_state_dict(sd, CFG)

    init_paths = {
        "/".join(str(k.key) for k in p): leaf.shape
        for p, leaf in jax.tree_util.tree_flatten_with_path(init_params)[0]
    }
    conv_paths = {
        "/".join(str(k.key) for k in p): leaf.shape
        for p, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    missing = set(init_paths) - set(conv_paths)
    extra = set(conv_paths) - set(init_paths)
    assert not missing, f"converter misses params: {sorted(missing)[:5]}"
    assert not extra, f"converter invents params: {sorted(extra)[:5]}"
    for path, shape in init_paths.items():
        assert conv_paths[path] == shape, (path, shape, conv_paths[path])

    # The converted params actually run.
    B, N = batch["residue_mask"].shape
    out = model.apply(
        converted, batch,
        jnp.zeros((B, N, 3)), jnp.zeros((B, N, NUM_CLASSES)),
        batch["atom_mask"] + batch["residue_mask"],
        jnp.zeros((B,), jnp.int32),
    )
    assert np.isfinite(np.asarray(out[0])).all()
