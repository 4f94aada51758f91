"""ESM-2 protein language model, JAX/TPU-native.

The reference conditions generation on frozen ESM-2 650M residue
embeddings computed host-side with torch (`/root/reference/generate.py:40-62`,
`preprocess_pdbbind.py:34-36`, `scripts/predict_batch_strc_msk_inp.py:40-52`).
This module reimplements the ESM-2 encoder in pure JAX so the embedder can
run ON the TPU (bf16-capable, jit-compiled, mesh-shardable over the batch)
instead of requiring a CUDA host — and so its numerics can be pinned
against the HuggingFace torch port (`transformers.EsmModel`), which is
itself numerically equivalent to fair-esm for ESM-2 checkpoints.

Architecture (ESM-2 = ESM-1b-style pre-LN transformer + rotary attention):

- token embedding with ESM's "token dropout": mask-token rows are zeroed
  and the rest rescaled by (1 - 0.12) / (1 - observed mask ratio)
- per layer: LN -> MHA (query pre-scaled by head_dim**-0.5 BEFORE rotary,
  matching fair-esm) -> residual; LN -> GELU(erf) MLP -> residual
- rotary position embeddings of the half-split (non-interleaved) form
- final LayerNorm

Parameters live in a plain pytree with the transformer stack STACKED along
a leading layer axis and scanned with `lax.scan` — compile time is
independent of depth (33 layers at 650M), the TPU-idiomatic layout.

Weight source: `esm2_params_from_hf` converts a `transformers.EsmModel`
state dict (used for both the real 650M checkpoint and tiny random models
in the parity tests)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ESM-2 token-dropout constant: the mask ratio used in all ESM training
# runs (0.15 masked * 0.8 replaced-by-<mask>).
MASK_RATIO_TRAIN = 0.15 * 0.8


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    vocab_size: int = 33
    hidden_size: int = 1280
    num_layers: int = 33
    num_heads: int = 20
    intermediate_size: int = 5120
    pad_token_id: int = 1
    mask_token_id: int = 32
    layer_norm_eps: float = 1e-5
    token_dropout: bool = True
    # Compute dtype for the matmul-heavy path; params stay f32 and
    # LayerNorm/softmax always run in f32.
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _rotary_tables(length: int, dim: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [length, dim] of the duplicated-frequency form."""
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    t = np.arange(length, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(
        np.sin(emb), jnp.float32
    )


def _layer_norm(x: jnp.ndarray, scale, bias, eps: float) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """fair-esm's exact-erf gelu (NOT the tanh approximation)."""
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + jax.lax.erf(xf / np.sqrt(2.0)))).astype(x.dtype)


def esm2_forward(
    params: Dict[str, Any],
    cfg: ESM2Config,
    input_ids: jnp.ndarray,       # [B, L] int32
    attention_mask: jnp.ndarray,  # [B, L] 1=real token, 0=pad
) -> jnp.ndarray:
    """Final-layer representations [B, L, hidden] (f32)."""
    dtype = jnp.dtype(cfg.dtype)
    B, L = input_ids.shape
    H, Ch = cfg.num_heads, cfg.head_dim
    amask = attention_mask.astype(jnp.float32)

    # --- embeddings + ESM token dropout
    x = params["embed"]["weight"][input_ids].astype(jnp.float32)
    if cfg.token_dropout:
        is_mask = (input_ids == cfg.mask_token_id).astype(jnp.float32)
        x = x * (1.0 - is_mask)[..., None]
        src_len = jnp.sum(amask, axis=-1)
        observed = jnp.sum(is_mask * amask, axis=-1) / jnp.maximum(src_len, 1.0)
        x = x * ((1.0 - MASK_RATIO_TRAIN) / (1.0 - observed))[:, None, None]
    x = x * amask[..., None]

    cos, sin = _rotary_tables(L, Ch)          # [L, Ch]
    cos = cos[None, :, None, :]                # [1, L, 1, Ch]
    sin = sin[None, :, None, :]
    neg_inf = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    mask_bias = (1.0 - amask)[:, None, None, :] * neg_inf  # [B,1,1,L]

    def block(x, lp):
        # --- attention sublayer
        h = _layer_norm(
            x, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps
        ).astype(dtype)
        q = (h @ lp["q"]["kernel"].astype(dtype)) + lp["q"]["bias"].astype(dtype)
        k = (h @ lp["k"]["kernel"].astype(dtype)) + lp["k"]["bias"].astype(dtype)
        v = (h @ lp["v"]["kernel"].astype(dtype)) + lp["v"]["bias"].astype(dtype)
        q = q.reshape(B, L, H, Ch)
        k = k.reshape(B, L, H, Ch)
        v = v.reshape(B, L, H, Ch)
        # fair-esm scales q BEFORE rotary (rotation is orthogonal, but we
        # match the reference order bit-for-bit where possible).
        q = q * (Ch ** -0.5)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        qf = qf * cos + _rotate_half(qf) * sin
        kf = kf * cos + _rotate_half(kf) * sin
        logits = jnp.einsum(
            "bihc,bjhc->bhij", qf.astype(dtype), kf.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32) + mask_bias, axis=-1)
        ctx = jnp.einsum(
            "bhij,bjhc->bihc", probs.astype(dtype), v,
            preferred_element_type=jnp.float32,
        ).reshape(B, L, H * Ch)
        attn_out = (
            ctx.astype(dtype) @ lp["o"]["kernel"].astype(dtype)
        ) + lp["o"]["bias"].astype(dtype)
        x = x + attn_out.astype(jnp.float32)

        # --- feed-forward sublayer
        h = _layer_norm(
            x, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps
        ).astype(dtype)
        h = _gelu_erf(
            (h @ lp["fc1"]["kernel"].astype(dtype))
            + lp["fc1"]["bias"].astype(dtype)
        )
        h = (h @ lp["fc2"]["kernel"].astype(dtype)) + lp["fc2"]["bias"].astype(
            dtype
        )
        return x + h.astype(jnp.float32), None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return _layer_norm(
        x,
        params["final_ln"]["scale"],
        params["final_ln"]["bias"],
        cfg.layer_norm_eps,
    )


# --------------------------------------------------------------- converters


def esm2_params_from_hf(state_dict: Dict[str, "Any"]) -> Dict[str, Any]:
    """Convert a `transformers.EsmModel` state dict (torch tensors or numpy
    arrays) into the stacked-pytree layout of `esm2_forward`.

    HF name map (modeling_esm.py):
      embeddings.word_embeddings.weight              -> embed.weight
      encoder.layer.{i}.attention.LayerNorm.{w,b}    -> layers.ln1
      encoder.layer.{i}.attention.self.{query,key,value}.{w,b} -> q/k/v
      encoder.layer.{i}.attention.output.dense.{w,b} -> o
      encoder.layer.{i}.LayerNorm.{w,b}              -> layers.ln2
      encoder.layer.{i}.intermediate.dense.{w,b}     -> fc1
      encoder.layer.{i}.output.dense.{w,b}           -> fc2
      encoder.emb_layer_norm_after.{w,b}             -> final_ln
    torch Linear kernels are [out, in] and are transposed here."""

    def arr(name: str) -> np.ndarray:
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, dtype=np.float32)

    num_layers = 0
    while f"encoder.layer.{num_layers}.attention.self.query.weight" in state_dict:
        num_layers += 1
    if num_layers == 0:
        raise ValueError("state dict contains no ESM encoder layers")

    def linear(prefix: str) -> Dict[str, np.ndarray]:
        return {"kernel": arr(prefix + ".weight").T, "bias": arr(prefix + ".bias")}

    def ln(prefix: str) -> Dict[str, np.ndarray]:
        return {"scale": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    layers: Dict[str, list] = {}

    def push(key: str, sub: Dict[str, np.ndarray]) -> None:
        layers.setdefault(key, []).append(sub)

    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        push("ln1", ln(f"{p}.attention.LayerNorm"))
        push("q", linear(f"{p}.attention.self.query"))
        push("k", linear(f"{p}.attention.self.key"))
        push("v", linear(f"{p}.attention.self.value"))
        push("o", linear(f"{p}.attention.output.dense"))
        push("ln2", ln(f"{p}.LayerNorm"))
        push("fc1", linear(f"{p}.intermediate.dense"))
        push("fc2", linear(f"{p}.output.dense"))

    stacked = {
        key: jax.tree_util.tree_map(lambda *xs: np.stack(xs), *subs)
        for key, subs in layers.items()
    }
    return {
        "embed": {"weight": arr("embeddings.word_embeddings.weight")},
        "layers": stacked,
        "final_ln": ln("encoder.emb_layer_norm_after"),
    }


def esm2_config_from_hf(hf_config: Any, dtype: str = "float32") -> ESM2Config:
    # esm2_forward hardcodes the ESM-2 architecture: rotary positions, no
    # embedding LayerNorm. Reject ESM-1b/-1v style configs loudly instead
    # of computing silently wrong embeddings.
    pe = getattr(hf_config, "position_embedding_type", "absolute")
    if pe != "rotary" or getattr(hf_config, "emb_layer_norm_before", False):
        raise ValueError(
            f"JAX backend supports ESM-2 checkpoints only (rotary "
            f"positions, no pre-embedding LayerNorm); got "
            f"position_embedding_type={pe!r}, emb_layer_norm_before="
            f"{getattr(hf_config, 'emb_layer_norm_before', False)!r}. "
            "Use --esm_backend torch for other ESM variants."
        )
    return ESM2Config(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        pad_token_id=hf_config.pad_token_id,
        mask_token_id=hf_config.mask_token_id,
        layer_norm_eps=hf_config.layer_norm_eps,
        token_dropout=hf_config.token_dropout,
        dtype=dtype,
    )


def esm2_random_params(
    key: jax.Array, cfg: ESM2Config, scale: float = 0.02
) -> Dict[str, Any]:
    """Random parameters in the stacked layout (for tests without torch)."""
    ks = jax.random.split(key, 9)
    D, F, Lyr = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def lin(k, din, dout):
        return {
            "kernel": jax.random.normal(k, (Lyr, din, dout), jnp.float32) * scale,
            "bias": jnp.zeros((Lyr, dout), jnp.float32),
        }

    def lnp():
        return {
            "scale": jnp.ones((Lyr, D), jnp.float32),
            "bias": jnp.zeros((Lyr, D), jnp.float32),
        }

    return {
        "embed": {
            "weight": jax.random.normal(
                ks[0], (cfg.vocab_size, D), jnp.float32
            )
            * scale
        },
        "layers": {
            "ln1": lnp(),
            "q": lin(ks[1], D, D),
            "k": lin(ks[2], D, D),
            "v": lin(ks[3], D, D),
            "o": lin(ks[4], D, D),
            "ln2": lnp(),
            "fc1": lin(ks[5], D, F),
            "fc2": lin(ks[6], F, D),
        },
        "final_ln": {
            "scale": jnp.ones((D,), jnp.float32),
            "bias": jnp.zeros((D,), jnp.float32),
        },
    }


class JaxESM2:
    """Jit-compiled ESM-2 encoder with length bucketing.

    Pads every request up to the next multiple of ``bucket`` so repeated
    calls at varying sequence lengths reuse a handful of compiled programs
    (remote TPU compiles cost 150-300 s — CLAUDE.md)."""

    def __init__(self, params: Dict[str, Any], cfg: ESM2Config,
                 bucket: int = 64):
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.bucket = bucket
        self._fwd = jax.jit(
            lambda p, ids, mask: esm2_forward(p, cfg, ids, mask)
        )

    def __call__(self, token_ids: np.ndarray) -> np.ndarray:
        """token_ids [L] (one sequence incl. cls/eos) -> [L, hidden] f32."""
        L = int(token_ids.shape[0])
        Lp = -(-L // self.bucket) * self.bucket
        ids = np.full((1, Lp), self.cfg.pad_token_id, np.int32)
        ids[0, :L] = token_ids
        mask = np.zeros((1, Lp), np.int32)
        mask[0, :L] = 1
        out = self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out[0, :L], dtype=np.float32)


def load_jax_esm2(
    model_name: str = "facebook/esm2_t33_650M_UR50D",
    dtype: str = "float32",
    local_files_only: bool = True,
) -> Optional[JaxESM2]:
    """Load HF ESM-2 weights (local cache only by default) into JaxESM2.
    Returns None when the weights are unavailable offline; any OTHER
    failure (unsupported architecture, converter mismatch, corrupt shard)
    propagates so it cannot masquerade as a missing-weights zero-fallback."""
    try:
        from transformers import AutoConfig, EsmModel

        hf = EsmModel.from_pretrained(
            model_name, local_files_only=local_files_only,
            add_pooling_layer=False,
        ).eval()
    except (OSError, ImportError):  # offline / not downloaded
        return None
    cfg = esm2_config_from_hf(
        AutoConfig.from_pretrained(
            model_name, local_files_only=local_files_only
        ),
        dtype=dtype,
    )
    params = esm2_params_from_hf(hf.state_dict())
    del hf
    return JaxESM2(params, cfg)
