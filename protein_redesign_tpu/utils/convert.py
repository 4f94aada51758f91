"""PyTorch -> JAX checkpoint converter for reference checkpoints.

Maps the reference's state_dict naming (`/root/reference/ProteinReDiff/
model.py:55-126`, `modules.py`, `models/AF2_modules.py`) onto this
framework's flax parameter tree, enabling fp32-tolerance parity with
`PRD_ver1.ckpt`-style checkpoints (BASELINE.json requirement). Linear
weights transpose ([out,in] -> [in,out]); per-feature embedding stacks
concatenate into the fused offset tables; LayerNorm weight->scale.

Also converts torch_ema shadow parameters (checkpoint["ema_state_dict"],
reference `model.py:197-201`) by zipping them with the requires_grad
parameter order.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from ..config import ModelConfig

Array = np.ndarray


def _set(tree: Dict, path: str, value: Array) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value, dtype=np.float32)


def _linear(tree: Dict, dst: str, sd: Mapping[str, Array], src: str) -> None:
    _set(tree, f"{dst}/kernel", np.asarray(sd[f"{src}.weight"]).T)
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _layernorm(tree: Dict, dst: str, sd: Mapping[str, Array], src: str) -> None:
    _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _embed_stack(
    tree: Dict, dst: str, sd: Mapping[str, Array], src: str
) -> None:
    base = f"{src}.embeddings" if src else "embeddings"
    tables = []
    i = 0
    while f"{base}.{i}.weight" in sd:
        tables.append(np.asarray(sd[f"{base}.{i}.weight"]))
        i += 1
    _set(tree, dst, np.concatenate(tables, axis=0))


def convert_denoiser(
    sd: Mapping[str, Array], num_blocks: int, prefix: str = ""
) -> Dict[str, Any]:
    """Convert the Denoiser subtree (torch names under ``prefix``)."""
    t: Dict[str, Any] = {}
    p = prefix
    # SPAttention (`AF2_modules.py:369-473`)
    _layernorm(t, "spa_attn/layer_norm_m/LayerNorm_0", sd,
               f"{p}SPAAttnBlock.layer_norm_m")
    _layernorm(t, "spa_attn/z_norm/LayerNorm_0", sd,
               f"{p}SPAAttnBlock.linear_z.0")
    _linear(t, "spa_attn/linear_z/Dense_0", sd, f"{p}SPAAttnBlock.linear_z.1")
    for name in ("q", "k", "v", "o", "g"):
        _linear(t, f"spa_attn/linear_{name}/Dense_0", sd,
                f"{p}SPAAttnBlock.mha.linear_{name}")
    # OuterProductUpdate (`AF2_modules.py:476-545`)
    _layernorm(t, "opm/layer_norm/LayerNorm_0", sd, f"{p}opm.layer_norm")
    for name in ("1", "2", "out"):
        _linear(t, f"opm/linear_{name}/Dense_0", sd, f"{p}opm.linear_{name}")
    # FoldingBlocks (`modules.py:290-343`)
    for i in range(num_blocks):
        b = f"{p}folding_blocks.{i}"
        d = f"folding_blocks_{i}"
        _linear(t, f"{d}/attn_bias_proj/Dense_0", sd, f"{b}.attn_bias.1")
        for proj in ("q_proj", "k_proj", "v_proj", "gate_proj", "out_proj"):
            _linear(t, f"{d}/single_attn/{proj}/Dense_0", sd,
                    f"{b}.single_attn.{proj}")
        _linear(t, f"{d}/single_fc/PRLinear_0/Dense_0", sd, f"{b}.single_fc.1")
        _linear(t, f"{d}/single_fc/PRLinear_1/Dense_0", sd, f"{b}.single_fc.3")
        _linear(t, f"{d}/outer_linear/linear/Dense_0", sd,
                f"{b}.outer_linear.linear")
        for mode in ("outgoing", "incoming"):
            for proj in ("ab_proj", "ab_gate", "out_proj", "out_gate"):
                _linear(t, f"{d}/pair_mul_{mode}/{proj}/Dense_0", sd,
                        f"{b}.pair_mul_{mode}.{proj}")
        for mode in ("starting", "ending"):
            for proj in ("q_proj", "k_proj", "v_proj", "gate_proj",
                         "out_proj"):
                _linear(t, f"{d}/pair_attn_{mode}/attn/{proj}/Dense_0", sd,
                        f"{b}.pair_attn_{mode}.attn.{proj}")
        _linear(t, f"{d}/pair_fc/PRLinear_0/Dense_0", sd, f"{b}.pair_fc.1")
        _linear(t, f"{d}/pair_fc/PRLinear_1/Dense_0", sd, f"{b}.pair_fc.3")
    return t


def convert_state_dict(
    sd: Mapping[str, Array], cfg: ModelConfig
) -> Dict[str, Any]:
    """Full reference state_dict -> flax params tree (`model.py:84-122`)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    t: Dict[str, Any] = {}
    _embed_stack(t, "embed_atom_feats/FusedCategoricalEmbedding_0/table", sd,
                 "embed_atom_feats")
    _embed_stack(t, "embed_bond_feats/FusedCategoricalEmbedding_0/table", sd,
                 "embed_bond_feats")
    _linear(t, "embed_beta/dense/Dense_0", sd, "embed_beta.1")
    _linear(t, "embed_dist/dense/Dense_0", sd, "embed_dist.1")
    _linear(t, "embed_residue_type/dense/Dense_0", sd, "embed_residue_type.1")
    _linear(t, "embed_residue_esm/dense/Dense_0", sd, "embed_residue_esm.1")
    _set(t, "embed_bond_distance/table", sd["embed_bond_distance.weight"])
    _set(t, "embed_relpos/table", sd["embed_relpos.weight"])
    _linear(t, "weight_radial/PRLinear_0/Dense_0", sd, "weight_radial.1")
    _linear(t, "weight_radial/PRLinear_1/Dense_0", sd, "weight_radial.3")
    _linear(t, "seq_mlp/PRLinear_0/Dense_0", sd, "seq_mlp.1")
    _linear(t, "seq_mlp/PRLinear_1/Dense_0", sd, "seq_mlp.3")
    t["denoiser"] = convert_denoiser(sd, cfg.num_blocks, prefix="Denoiser.")
    return t


def convert_ema_shadow(
    sd: Mapping[str, Array],
    shadow_params: list,
    cfg: ModelConfig,
) -> Dict[str, Any]:
    """torch_ema shadow list -> flax params: zip with the requires_grad
    parameter order (all registered params except the two frozen projection
    constants, which requires_grad=False excludes)."""
    frozen = {"embed_beta.0.weight", "embed_dist.0.center"}
    names = [k for k in sd.keys() if k not in frozen]
    assert len(names) == len(shadow_params), (
        f"EMA shadow length {len(shadow_params)} != trainable {len(names)}"
    )
    ema_sd = {k: np.asarray(v) for k, v in zip(names, shadow_params)}
    # Frozen constants are not in the shadow; copy from the live weights.
    for k in frozen:
        if k in sd:
            ema_sd[k] = np.asarray(sd[k])
    return convert_state_dict(ema_sd, cfg)


def load_reference_checkpoint(
    path: str, **overrides: Any
) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]], ModelConfig]:
    """Load a Lightning .ckpt from the reference training pipeline.

    Returns (params, ema_params-or-None, config). Requires torch (cpu).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hparams = ckpt.get("hyper_parameters", {})
    cfg_fields = {f.name for f in ModelConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    cfg_kwargs = {k: v for k, v in dict(hparams).items() if k in cfg_fields}
    cfg_kwargs.update(overrides)
    cfg = ModelConfig(**cfg_kwargs)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    params = convert_state_dict(sd, cfg)
    ema_params = None
    ema_state = ckpt.get("ema_state_dict")
    if ema_state and "shadow_params" in ema_state:
        shadow = [p.numpy() for p in ema_state["shadow_params"]]
        ema_params = convert_ema_shadow(sd, shadow, cfg)
    return params, ema_params, cfg
