"""ProteinReDiff model: embeddings, equivariant readout, diffusion process.

TPU-native re-design of the reference LightningModule
(`/root/reference/ProteinReDiff/model.py:55-549`). The network is one flax
module (``ProteinReDiffNet``); the diffusion process lives in pure jitted
functions on a frozen ``ProteinReDiffModel`` facade:

- ``prepare_batch``     <- `model.py:424-468` (masking policy inside jit)
- ``q``                 <- `model.py:471-488`
- ``diffusion_loss``    <- `model.py:490-526` (exact quirky reductions)
- ``sample``            <- `model.py:377-422`, as ONE `lax.scan` over
                           timesteps inside a single jit (the reference
                           re-launches a full Python-loop forward per step)

Reference numerics reproduced exactly (SURVEY.md §7.3): the ±1 one-hot
convention, scalar-broadcast KL/CE loss terms, ``(seq_pred+1)/2`` fed to CE
as logits, the softmax sequence "reverse step", and known residues anchored
only at init.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.geometry import (
    angstrom_to_nanometre,
    nanometre_to_angstrom,
    remove_mean,
)
from .denoiser import Denoiser
from .diffusion import DiffusionSchedule
from .layers import (
    AtomEmbedding,
    BondEmbedding,
    Embed,
    LayerNorm,
    PRLinear,
    RadialBasisProjection,
    SinusoidalProjection,
    TransitionMLP,
)
from .masking import _rank, random_mask, spatial_mask

Batch = Dict[str, jnp.ndarray]
NUM_CLASSES = 21  # 20 residue types + pad/mask class 0


class NormLinear(nn.Module):
    """Non-affine LN -> bias-free 'normal'-init Linear [-> ReLU] — the
    embedding-head pattern of reference `model.py:85-107`."""

    features: int
    relu: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = LayerNorm(affine=False, dtype=self.dtype)(x)
        x = PRLinear(
            self.features, use_bias=False, init="normal",
            dtype=self.dtype, param_dtype=self.param_dtype, name="dense",
        )(x)
        return jax.nn.relu(x) if self.relu else x


class ProjLinear(nn.Module):
    """Fixed projection (RBF or sinusoidal) -> bias-free 'normal' Linear —
    the embed_dist / embed_beta pattern of reference `model.py:85-88,104-107`."""

    features: int
    proj: str  # "rbf" | "sinusoidal"
    proj_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.proj == "rbf":
            x = RadialBasisProjection(self.proj_dim, dtype=self.dtype)(x)
        else:
            x = SinusoidalProjection(self.proj_dim, dtype=self.dtype)(x)
        return PRLinear(
            self.features, use_bias=False, init="normal",
            dtype=self.dtype, param_dtype=self.param_dtype, name="dense",
        )(x)


class ProteinReDiffNet(nn.Module):
    """Embeddings + Denoiser + equivariant readout + sequence head
    (the reference ``forward``/``sample_step``, `model.py:254-375` —
    which are line-for-line duplicates; here there is one function)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        batch: Mapping[str, jnp.ndarray],
        z: jnp.ndarray,       # [B, N, 3] noisy coords (nm), f32
        seq_t: jnp.ndarray,   # [B, N, 21] noisy one-hot
        mask: jnp.ndarray,    # [B, N] residue+atom mask
        t: jnp.ndarray,       # [B] int timestep
        z_sc: Optional[jnp.ndarray] = None,   # [B, N, 3] prev x0-hat (nm)
        sc_flag: Optional[jnp.ndarray] = None,  # [B] 1.0 = z_sc is live
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        param_dtype = jnp.dtype(cfg.param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)

        atom_feats = batch["atom_feats"]
        atom_mask = batch["atom_mask"]
        bond_feats = batch["bond_feats"]
        bond_mask = batch["bond_mask"]
        bond_distance = batch["bond_distance"]
        residue_mask = batch["residue_mask"]
        residue_esm = batch["residue_esm"]
        residue_chain_index = batch["residue_chain_index"]
        residue_index = batch["residue_index"]

        atom_mask_2d = atom_mask[..., :, None] * atom_mask[..., None, :]
        residue_mask_2d = residue_mask[..., :, None] * residue_mask[..., None, :]
        relpos = residue_index[..., :, None] - residue_index[..., None, :]
        chain_mask = (
            residue_chain_index[..., :, None]
            == residue_chain_index[..., None, :]
        ).astype(dtype)
        mask_2d = mask[..., :, None] * mask[..., None, :]

        # Geometry in f32 regardless of compute dtype.
        zf = z.astype(jnp.float32)
        zi_zj = zf[..., :, None, :] - zf[..., None, :, :]
        noise_dist = jnp.linalg.norm(zi_zj + 1e-20, axis=-1)
        scaled_t = (t / cfg.num_steps).astype(jnp.float32)

        # --- single representation (`model.py:283-287`)
        single = atom_mask[..., None].astype(dtype) * AtomEmbedding(
            cfg.single_dim, name="embed_atom_feats", **kw
        )(atom_feats)
        single += residue_mask[..., None].astype(dtype) * (
            NormLinear(cfg.single_dim, relu=True,
                       name="embed_residue_type", **kw)(seq_t.astype(dtype))
            + NormLinear(cfg.single_dim,
                         name="embed_residue_esm", **kw)(
                residue_esm.astype(dtype)
            )
        )

        # --- pair representation (`model.py:288-301`)
        pair = atom_mask_2d[..., None].astype(dtype) * (
            bond_mask[..., None].astype(dtype)
            * BondEmbedding(cfg.pair_dim, name="embed_bond_feats", **kw)(
                bond_feats
            )
            + Embed(
                cfg.max_bond_distance + 1, cfg.pair_dim,
                name="embed_bond_distance", **kw,
            )(jnp.clip(bond_distance, max=cfg.max_bond_distance))
        )
        pair += residue_mask_2d[..., None].astype(dtype) * (
            chain_mask[..., None]
            * Embed(
                cfg.max_relpos * 2 + 1, cfg.pair_dim, name="embed_relpos", **kw
            )(cfg.max_relpos + jnp.clip(relpos, -cfg.max_relpos, cfg.max_relpos))
        )
        pair += mask_2d[..., None].astype(dtype) * (
            ProjLinear(cfg.pair_dim, "rbf", cfg.dist_dim,
                       name="embed_dist", **kw)(noise_dist.astype(dtype))
            + ProjLinear(cfg.pair_dim, "sinusoidal", cfg.time_dim,
                         name="embed_beta", **kw)(scaled_t[:, None, None])
        )

        # --- coordinate self-conditioning (ModelConfig.self_cond, beyond
        # reference): the previous x0-hat enters as one more RBF distance
        # embedding, zero-gated per sample by sc_flag so the no-estimate
        # case (first sampler step, the training coin's no-sc branch,
        # init) is an EXACT no-op on the pair track.
        if cfg.self_cond:
            if z_sc is None:
                z_sc = jnp.zeros_like(z)
            if sc_flag is None:
                sc_flag = jnp.zeros((z.shape[0],), jnp.float32)
            zs = z_sc.astype(jnp.float32)
            sc_dist = jnp.linalg.norm(
                zs[..., :, None, :] - zs[..., None, :, :] + 1e-20, axis=-1
            )
            gate = (sc_flag[:, None, None, None]
                    * mask_2d[..., None]).astype(dtype)
            pair += gate * ProjLinear(
                cfg.pair_dim, "rbf", cfg.dist_dim, name="embed_sc_dist", **kw
            )(sc_dist.astype(dtype))

        # --- trunk
        single, pair = Denoiser(cfg, name="denoiser")(single, pair, mask)

        # --- equivariant vector readout (`model.py:304-313`)
        w = TransitionMLP(
            cfg.pair_dim, 1, name="weight_radial", out_bias=False, **kw
        )(pair).astype(jnp.float32)
        r = zi_zj * jax.lax.rsqrt(
            jnp.sum(jnp.square(zi_zj), axis=-1, keepdims=True) + 1e-4
        )
        noise_pred = jnp.sum(
            mask_2d[..., None].astype(jnp.float32) * w * r, axis=-2
        )
        noise_pred = remove_mean(noise_pred, mask)

        # --- sequence head (`model.py:314`)
        seq_pred = TransitionMLP(
            cfg.single_dim, NUM_CLASSES, name="seq_mlp", out_bias=False, **kw
        )(single).astype(jnp.float32)
        return noise_pred, seq_pred


def ddim_taus_np(num_steps: int, ddim_steps: int):
    """Descending DDIM timestep subsequence tau_0 > ... > tau_{S-1}=0 as a
    host-side numpy int32 array. Computed in f64 so every DDIM-family
    sampler (sample_ddim, the segmented runner path, and the
    parallel-in-time sampler in models/paratime.py) walks EXACTLY the
    same grid — an f32 jnp.linspace rounds differently at some (T, S)."""
    import numpy as _np

    return _np.round(
        _np.linspace(num_steps - 1, 0, ddim_steps)
    ).astype(_np.int32)


def ddim_tau_grid(
    num_steps: int, ddim_steps: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The tau grid plus its shifted-prev companion (-1 sentinel at the
    end = x0 endpoint, alpha_bar_prev 1). Shared by sample_ddim and
    SamplingRunner's segmented DDIM path."""
    taus = jnp.asarray(ddim_taus_np(num_steps, ddim_steps))
    taus_prev = jnp.concatenate([taus[1:], jnp.array([-1])])
    return taus, taus_prev


@dataclasses.dataclass(frozen=True)
class ProteinReDiffModel:
    """Facade bundling config, net, and schedule into pure functions."""

    cfg: ModelConfig

    @property
    def net(self) -> ProteinReDiffNet:
        return ProteinReDiffNet(self.cfg)

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(
            self.cfg.num_steps, self.cfg.diffusion_schedule
        )

    # ------------------------------------------------------------------ init
    def init_params(self, key: jax.Array, batch: Batch) -> Any:
        B, N = batch["residue_mask"].shape
        z = jnp.zeros((B, N, 3), jnp.float32)
        seq = jnp.zeros((B, N, NUM_CLASSES), jnp.float32)
        mask = batch["atom_mask"] + batch["residue_mask"]
        t = jnp.zeros((B,), jnp.int32)
        return self.net.init(key, batch, z, seq, mask, t)["params"]

    def apply(
        self, params: Any, batch: Batch, z, seq_t, mask, t,
        z_sc=None, sc_flag=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if z_sc is None and sc_flag is None:
            return self.net.apply(
                {"params": params}, batch, z, seq_t, mask, t
            )
        return self.net.apply(
            {"params": params}, batch, z, seq_t, mask, t, z_sc, sc_flag
        )

    # x0-hat clip bound, nm. Real complexes span a few nm; at t near T
    # the 1/sqrt(alphas_cumprod) amplification turns O(1) prediction
    # error into O(100) estimates, and an unbounded self-conditioning
    # input would feed garbage distances to embed_sc_dist.
    _SC_CLIP_NM = 20.0

    def _x0_hat(
        self, z_t: jnp.ndarray, noise_pred: jnp.ndarray,
        a_t: jnp.ndarray, mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """Clean-structure estimate from the noise prediction at
        cumulative alpha ``a_t`` (broadcastable to [B,1,1]), clipped and
        re-centred — the self-conditioning signal (ModelConfig.self_cond).
        Always stop-gradiented: self-conditioning trains the CONSUMER of
        the estimate, not the producer (Chen et al. 2022)."""
        x0 = (z_t - jnp.sqrt(1.0 - a_t) * noise_pred) * jax.lax.rsqrt(
            jnp.maximum(a_t, 1e-12)
        )
        x0 = jnp.clip(x0, -self._SC_CLIP_NM, self._SC_CLIP_NM)
        return jax.lax.stop_gradient(remove_mean(x0, mask))

    def _apply_with_self_cond(
        self, params: Any, batch: Batch, z_t, seq_t, mask, t, key
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Training-side self-conditioning (ModelConfig.self_cond): on a
        per-batch 50% coin, run a stop-gradient first pass to produce
        x0-hat and condition the gradient pass on it; the other half
        trains the flag-0 (no estimate) input the samplers' first step
        uses. lax.cond executes ONE branch per step on TPU, so the
        average cost is ~half an extra forward. No-op (and key unused)
        when self_cond is off — existing RNG streams are undisturbed."""
        if not self.cfg.self_cond:
            return self.apply(params, batch, z_t, seq_t, mask, t)
        a_t = self.schedule.alphas_cumprod[t][:, None, None]
        B = z_t.shape[0]

        def with_sc(_):
            ep0, _sp0 = self.apply(params, batch, z_t, seq_t, mask, t)
            return (
                self._x0_hat(z_t, ep0, a_t, mask),
                jnp.ones((B,), jnp.float32),
            )

        def no_sc(_):
            return jnp.zeros_like(z_t), jnp.zeros((B,), jnp.float32)

        coin = jax.random.uniform(key, ())
        z_sc, flag = jax.lax.cond(coin < 0.5, with_sc, no_sc, None)
        return self.apply(params, batch, z_t, seq_t, mask, t, z_sc, flag)

    # -------------------------------------------------------- batch plumbing
    def prepare_batch(
        self,
        batch: Batch,
        key: Optional[jax.Array] = None,
        training: Optional[bool] = None,
        mask_prob: Optional[float] = None,
    ) -> Batch:
        """Reference `model.py:424-468`: ±1 one-hot, merged nm coords, and
        the stochastic masking-policy draw (training) or deterministic
        fraction (inference)."""
        cfg = self.cfg
        training = cfg.training_mode if training is None else training
        mask_prob = cfg.mask_prob if mask_prob is None else mask_prob
        # Accept the compact wire format (data/wire.py) transparently: every
        # compute path funnels through here, so decompressing once restores
        # canonical dtypes for the whole jitted program.
        from ..data.wire import decompress_batch

        batch = decompress_batch(batch)

        atom_pos = batch["atom_pos"]
        atom_mask = batch["atom_mask"]
        residue_ca_pos = batch["residue_atom_pos"][:, :, 1]
        residue_mask = batch["residue_mask"]
        residue_type = batch["residue_type"]

        one_hot = (
            jax.nn.one_hot(residue_type, NUM_CLASSES, dtype=jnp.float32) * 2.0
            - 1.0
        )
        pos = (
            atom_mask[..., None] * atom_pos
            + residue_mask[..., None] * residue_ca_pos
        )
        x = angstrom_to_nanometre(pos)
        mask = atom_mask + residue_mask

        if training:
            assert key is not None
            k_rt, k_p, k_rand, k_spatial = jax.random.split(key, 4)
            rt = jax.random.uniform(k_rt, ())
            p = jax.random.uniform(k_p, (), minval=0.1, maxval=mask_prob)
            # The reference's RandomMaskingModule further multiplies by
            # U(0,1) when stochastic=True (`mask_utils.py:79-80`).
            p_rand = jax.random.uniform(k_rand, ()) * p
            rand_extra, rand_inv = random_mask(
                jax.random.fold_in(k_rand, 1), residue_mask, p_rand
            )
            spat_extra, spat_inv = spatial_mask(
                k_spatial, residue_ca_pos, residue_mask, atom_pos, atom_mask, p
            )
            no_extra, no_inv = residue_mask, jnp.zeros_like(residue_mask)
            # rt < 0.3: random; 0.3 <= rt < 0.5: spatial; else: none
            use_rand = rt < 0.3
            use_spatial = (rt >= 0.3) & (rt < 0.5)
            extra_mask = jnp.where(
                use_rand, rand_extra, jnp.where(use_spatial, spat_extra, no_extra)
            )
            inv_mask = jnp.where(
                use_rand, rand_inv, jnp.where(use_spatial, spat_inv, no_inv)
            )
        else:
            if key is None:
                key = jax.random.PRNGKey(0)
            extra_mask, inv_mask = random_mask(
                key, residue_mask, jnp.asarray(mask_prob, jnp.float32)
            )

        batch["residue_esm"] = batch["residue_esm"] * extra_mask[..., None]
        batch["residue_type_masked"] = (
            residue_type * extra_mask.astype(residue_type.dtype)
        )
        batch["residue_one_hot"] = one_hot * extra_mask[..., None]
        batch["residue_extra_mask"] = extra_mask
        batch["residue_inv_extra_mask"] = inv_mask
        batch["x"] = x
        batch["residue_and_atom_mask"] = mask
        return batch

    # --------------------------------------------------------------- forward
    def q(
        self,
        sched: DiffusionSchedule,
        x: jnp.ndarray,
        seq: jnp.ndarray,
        t: jnp.ndarray,
        noise_z: jnp.ndarray,
        noise_seq: jnp.ndarray,
        batch: Batch,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Forward noising with known-residue clamping (`model.py:471-488`)."""
        extra = batch["residue_extra_mask"][..., None]
        inv = batch["residue_inv_extra_mask"][..., None]
        sac = sched.sqrt_alphas_cumprod[t][:, None, None]
        s1mac = sched.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        z_t = sac * x + s1mac * noise_z
        seq_t = sac * seq + s1mac * noise_seq
        seq_t = extra * seq + inv * seq_t
        t1 = jnp.clip(t - 1, min=0)
        sac1 = sched.sqrt_alphas_cumprod[t1][:, None, None]
        s1mac1 = sched.sqrt_one_minus_alphas_cumprod[t1][:, None, None]
        seq_t1 = sac1 * seq + s1mac1 * noise_seq
        return z_t, seq_t, seq_t1, t1

    def diffusion_loss(
        self,
        params: Any,
        batch: Batch,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        t: jnp.ndarray,
        key: jax.Array,
    ) -> jnp.ndarray:
        """Per-sample loss vector [B] with the reference's exact reductions
        (`model.py:490-526`): masked coordinate MSE per sample, plus
        KL and CE terms summed to scalars and broadcast onto every sample."""
        sched = self.schedule
        seq = batch["residue_one_hot"]
        residue_mask = batch["residue_mask"]
        kz, ks = jax.random.split(key)
        noise_z = remove_mean(
            jax.random.normal(kz, x.shape, x.dtype), mask
        )

        if self.cfg.seq_process == "absorbing":
            return self._absorbing_loss(
                params, batch, x, mask, t, noise_z, ks
            )

        noise_seq = remove_mean(
            jax.random.normal(ks, seq.shape, seq.dtype), residue_mask
        )
        z_t, seq_t, seq_t1, t1 = self.q(sched, x, seq, t, noise_z, noise_seq, batch)
        noise_pred, seq_pred = self._apply_with_self_cond(
            params, batch, z_t, seq_t, mask, t, jax.random.fold_in(ks, 17)
        )
        sac1 = sched.sqrt_alphas_cumprod[t1][:, None, None]
        s1mac1 = sched.sqrt_one_minus_alphas_cumprod[t1][:, None, None]
        seq_pred_t1 = sac1 * seq_pred + s1mac1 * noise_seq

        # (a) coordinate MSE, per sample
        mse = jnp.sum(
            mask[..., None] * jnp.square(noise_pred - noise_z), axis=(-1, -2)
        )
        # (b) KL(log_softmax(pred_t1)*m || softmax(seq_t1)*m)
        rm = residue_mask[..., None]
        log_p = jax.nn.log_softmax(seq_pred_t1, axis=-1) * rm
        q_tgt = jax.nn.softmax(seq_t1, axis=-1) * rm
        # torch F.kl_div(input, target) = target*(log(target) - input),
        # with 0*log(0) := 0.
        kl = jnp.where(
            q_tgt > 0, q_tgt * (jnp.log(jnp.where(q_tgt > 0, q_tgt, 1.0)) - log_p),
            -q_tgt * log_p,
        )
        labels = batch["residue_type"]

        if self.cfg.loss_mode == "per_position":
            # Principled variant (beyond reference): per-sample reductions,
            # TRUE logits for the CE, and CE restricted to the residues
            # that were actually masked — the design targets. Under the
            # reference reductions their recovery stays at chance
            # (BASELINE.md quality tables). Each term is self-normalized
            # so loss() skips the 1/num_nodes division.
            num_nodes = jnp.maximum(jnp.sum(mask > 0.5, axis=-1), 1)
            num_res = jnp.maximum(jnp.sum(residue_mask, axis=-1), 1.0)
            log_probs = jax.nn.log_softmax(seq_pred, axis=-1)
            nll = -jnp.take_along_axis(
                log_probs, labels[..., None], axis=-1
            )[..., 0]
            sel = batch["residue_inv_extra_mask"] * (labels != 0)
            ce = jnp.sum(nll * sel, axis=-1) / jnp.maximum(
                jnp.sum(sel, axis=-1), 1.0
            )
            return (
                mse / num_nodes
                + jnp.sum(kl, axis=(-1, -2)) / num_res
                + ce
            )

        # Reference mode: KL and CE are .sum() SCALARS broadcast onto the
        # per-sample vector (`model.py:518,525`), CE logits are
        # (seq_pred+1)/2, labels at every non-pad position.
        diff_loss = mse + jnp.sum(kl)
        logits = (seq_pred + 1.0) / 2.0
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            log_probs, labels[..., None], axis=-1
        )[..., 0]
        nll = jnp.where(labels == 0, 0.0, nll) * mask
        diff_loss = diff_loss + jnp.sum(nll)
        return diff_loss

    def _absorbing_loss(
        self,
        params: Any,
        batch: Batch,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        t: jnp.ndarray,
        noise_z: jnp.ndarray,
        key: jax.Array,
    ) -> jnp.ndarray:
        """Masked discrete diffusion on the sequence channel
        (seq_process='absorbing', beyond reference; BASELINE.md ablation
        motivates it): unknown (inv-masked) residues are corrupted to the
        zero row with prob (t+1)/T, the net is trained with CE to recover
        them, and there is deliberately NO KL term — the KL is what
        teaches seq_t-copying. Coordinates keep the Gaussian process.
        Per-sample self-normalized terms (loss() skips 1/num_nodes)."""
        cfg = self.cfg
        sched = self.schedule
        labels = batch["residue_type"]
        residue_mask = batch["residue_mask"]

        sac = sched.sqrt_alphas_cumprod[t][:, None, None]
        s1mac = sched.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        z_t = sac * x + s1mac * noise_z

        # Corrupt ANY real residue iid with prob (t+1)/T — denser signal
        # than corrupting only the conditioning-unknown positions (the
        # policy draw leaves those empty half the time), and it covers the
        # sampling distribution, where user-known positions are always
        # visible and unknown ones are progressively revealed.
        p_t = ((t.astype(jnp.float32) + 1.0) / cfg.num_steps)[:, None]
        corrupt = (
            (jax.random.uniform(key, residue_mask.shape) < p_t)
            & (residue_mask > 0.5)
        ).astype(jnp.float32)
        # Class-0 rows (user-X / unknown identity) are never visible: the
        # CE can't train them (sel excludes labels==0) and the samplers
        # always present them absorbed (_absorbing_known_and_designable).
        visible = (
            residue_mask * (1.0 - corrupt) * (labels != 0)
        )
        full_pm1 = (
            jax.nn.one_hot(labels, NUM_CLASSES, dtype=jnp.float32) * 2.0 - 1.0
        )
        seq_t = full_pm1 * visible[..., None]

        noise_pred, seq_pred = self._apply_with_self_cond(
            params, batch, z_t, seq_t, mask, t, jax.random.fold_in(key, 17)
        )

        num_nodes = jnp.maximum(jnp.sum(mask > 0.5, axis=-1), 1)
        mse = jnp.sum(
            mask[..., None] * jnp.square(noise_pred - noise_z), axis=(-1, -2)
        )
        log_probs = jax.nn.log_softmax(seq_pred, axis=-1)
        nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
        sel = corrupt * residue_mask * (labels != 0)
        ce = jnp.sum(nll * sel, axis=-1) / jnp.maximum(
            jnp.sum(sel, axis=-1), 1.0
        )
        return mse / num_nodes + ce

    def loss(
        self, params: Any, batch: Batch, key: jax.Array,
        training: bool = True,
        reduction: str = "mean",
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Scalar training/validation loss (`model.py:528-549`).

        ``reduction="none"`` returns the per-sample [B] vector instead
        of its mean — validation over padded (sample-repeating) final
        batches needs it to weight only the real rows."""
        if self.cfg.loss_mode not in ("reference", "per_position"):
            raise ValueError(
                f"loss_mode must be 'reference' or 'per_position', "
                f"got {self.cfg.loss_mode!r}"
            )
        if self.cfg.seq_process not in ("gaussian", "absorbing"):
            raise ValueError(
                f"seq_process must be 'gaussian' or 'absorbing', "
                f"got {self.cfg.seq_process!r}"
            )
        if (
            self.cfg.seq_process == "absorbing"
            and self.cfg.loss_mode == "per_position"
        ):
            # The absorbing objective is complete on its own (per-sample
            # MSE + per-position CE, no KL) and never consults loss_mode;
            # training with/without per_position is bit-identical
            # (BASELINE.md round-3 quality cells). Warn so a sweep does
            # not mistake the two flag sets for distinct cells.
            import warnings

            warnings.warn(
                "loss_mode='per_position' has no effect under "
                "seq_process='absorbing' (the absorbing loss is already "
                "per-position and ignores loss_mode)",
                stacklevel=2,
            )
        k_prep, k_t, k_loss = jax.random.split(key, 3)
        batch = self.prepare_batch(batch, k_prep, training=training)
        x = batch["x"]
        mask = batch["residue_and_atom_mask"]
        B = x.shape[0]
        num_nodes = jnp.sum(mask > 0.5, axis=-1)
        t = jax.random.randint(k_t, (B,), 0, self.cfg.num_steps)
        diff_loss = self.diffusion_loss(params, batch, x, mask, t, k_loss)
        if (
            self.cfg.loss_mode == "per_position"
            or self.cfg.seq_process == "absorbing"
        ):
            # diffusion_loss already self-normalized each term per sample.
            per_sample = diff_loss
        else:
            per_sample = diff_loss / num_nodes
        loss = jnp.mean(per_sample)
        if reduction == "none":
            return per_sample, {"loss": loss}
        return loss, {"loss": loss}

    def inference_extra_mask(
        self,
        key: jax.Array,
        residue_mask: jnp.ndarray,
        mask_prob: Optional[float] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The exact (extra_mask, inv_mask) pair the samplers draw for this
        sampling key: every sampler (``sample``, ``sample_ddim``,
        ``paratime.sample_ddim_parallel``) splits its key 4 ways and hands
        the FIRST subkey to ``prepare_batch``, whose inference branch calls
        ``random_mask`` with it. Lets evaluation code recover which residue
        positions were actually redesigned (inv_mask == 1) without changing
        the reference ``predict_step`` return contract
        (`/root/reference/ProteinReDiff/model.py:249-252`). Must stay in
        lockstep with the key splits in the samplers below."""
        mask_prob = self.cfg.mask_prob if mask_prob is None else mask_prob
        k_prep = jax.random.split(key, 4)[0]
        return random_mask(
            k_prep, residue_mask, jnp.asarray(mask_prob, jnp.float32)
        )

    # -------------------------------------------------------------- sampling
    def sample(
        self,
        params: Any,
        batch: Batch,
        key: jax.Array,
        mask_prob: Optional[float] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Ancestral sampler (`model.py:377-422`) as one lax.scan.

        Returns (positions [B,N,3] in Å, residue-masked seq logits
        [B,N,21]) — the reference ``predict_step`` contract.
        """
        cfg = self.cfg
        batch, carry = self.sample_init(params, batch, key, mask_prob)
        k_scan = jax.random.split(key, 4)[3]
        time_steps = jnp.arange(cfg.num_steps - 1, -1, -1)
        keys = jax.random.split(k_scan, cfg.num_steps)
        carry = self.sample_segment(params, batch, carry, time_steps, keys)
        return self.sample_finish(batch, carry)

    # ---------------------------------------------- segmented sampling API
    # sample() = sample_init + ONE sample_segment over all T steps +
    # sample_finish. SamplingRunner(segments=S) instead jits the three
    # parts separately and host-chains S equal slices of the (ts, keys)
    # streams — bit-identical results (a scan over concatenated slices IS
    # one scan), but each device dispatch runs T/S steps. Needed on
    # tunneled-TPU platforms whose worker crashes on single executions
    # past ~1 min (BASELINE.md long-context caveat), and generally useful
    # for bounded-latency cooperative serving.

    def sample_init(
        self,
        params: Any,
        batch: Batch,
        key: jax.Array,
        mask_prob: Optional[float] = None,
    ) -> Tuple[Batch, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """Jittable part 1/3: prepare_batch + the sampler's initial carry.
        Key discipline identical to the reference-shaped sample()
        (k_prep/k_z/k_seq/k_scan splits), so one-segment use reproduces
        it exactly."""
        cfg = self.cfg
        if cfg.seq_reverse not in ("reference", "ancestral"):
            raise ValueError(
                f"seq_reverse must be 'reference' or 'ancestral', "
                f"got {cfg.seq_reverse!r}"
            )
        if cfg.reveal_schedule not in ("linear", "cosine"):
            raise ValueError(
                f"reveal_schedule must be 'linear' or 'cosine', "
                f"got {cfg.reveal_schedule!r}"
            )
        k_prep, k_z, k_seq, _k_scan = jax.random.split(key, 4)
        batch = self.prepare_batch(
            batch, k_prep, training=False, mask_prob=mask_prob
        )
        x = batch["x"]
        mask = batch["residue_and_atom_mask"]
        residue_mask = batch["residue_mask"]
        seq = batch["residue_one_hot"]
        z0 = remove_mean(jax.random.normal(k_z, x.shape, x.dtype), mask)
        if cfg.seq_process == "absorbing":
            seq_known, inv2 = self._absorbing_known_and_designable(batch)
            carry = (z0, jnp.zeros_like(inv2), jnp.zeros_like(seq_known))
        else:
            extra = batch["residue_extra_mask"][..., None]
            inv = batch["residue_inv_extra_mask"][..., None]
            s0 = remove_mean(
                jax.random.normal(k_seq, seq.shape, seq.dtype), residue_mask
            )
            s0 = extra * seq + inv * s0
            carry = (z0, s0, jnp.zeros_like(s0))
        if cfg.self_cond:
            # Two extra carry legs: the previous x0-hat and its live
            # flag (0.0 on the first step — the exact-no-op input the
            # training coin's no-sc branch covered).
            carry = carry + (
                jnp.zeros_like(z0), jnp.zeros((z0.shape[0],), jnp.float32)
            )
        return batch, carry

    def sample_segment(
        self,
        params: Any,
        batch: Batch,
        carry: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        time_steps: jnp.ndarray,
        keys: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Jittable part 2/3: scan the sampler step over a contiguous
        descending slice of the timestep/key streams."""
        if self.cfg.seq_process == "absorbing":
            step = self._absorbing_step_fn(params, batch)
        else:
            step = self._gaussian_step_fn(params, batch)
        carry, _ = jax.lax.scan(step, carry, (time_steps, keys))
        return carry

    def sample_finish(
        self,
        batch: Batch,
        carry: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Jittable part 3/3: carry -> the reference predict_step contract
        (positions in Angstrom, residue-masked sequence logits)."""
        residue_mask = batch["residue_mask"]
        carry = carry[:3]  # self_cond appends (z_sc, flag) legs
        if self.cfg.seq_process == "absorbing":
            z_final, _comm_mask, comm_oh = carry
            seq_known, _ = self._absorbing_known_and_designable(batch)
            logits = residue_mask[..., None] * (seq_known + comm_oh)
            return nanometre_to_angstrom(z_final), logits
        z_final, _seq_t, seq_pred_last = carry
        pos = nanometre_to_angstrom(z_final)
        return pos, residue_mask[..., None] * seq_pred_last

    def _guard(self, *arrays: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Sanitize sampler scan-carry state (ModelConfig.sample_guard).

        Non-finite entries become 0/±bound and magnitudes are clamped to
        1e4 (positions are in nm inside the samplers, sequence state is
        ±1-one-hot scale — healthy trajectories are O(1), so this is the
        IDENTITY for any trained checkpoint and the guarded samplers stay
        bit-exact). Diverged or random-init weights (the round-3 pp
        control, BASELINE.md footnote) otherwise explode exponentially
        through the reverse recurrence into all-NaN positions and all-X
        decoded sequences; bounded-garbage state keeps every downstream
        metric (TM-align, recovery) well-defined for control rows.

        Applies to the sequential samplers (DDPM/DDIM, both sequence
        processes). ``paratime.sample_ddim_parallel`` stays unguarded: its
        cumulative-drift trajectory rebuild has no per-step state to
        sanitize, so its tol=0 sequential-match invariant holds verbatim
        for finite trajectories and is void for diverged weights."""
        if not self.cfg.sample_guard:
            return arrays if len(arrays) > 1 else arrays[0]
        bound = 1e4
        out = tuple(
            jnp.clip(
                jnp.nan_to_num(a, nan=0.0, posinf=bound, neginf=-bound),
                -bound,
                bound,
            )
            for a in arrays
        )
        return out if len(out) > 1 else out[0]

    def _gaussian_step_fn(self, params: Any, batch: Batch):
        """Reference DDPM step closure (`model.py:403-420`), shared by
        sample() and the segmented API."""
        cfg = self.cfg
        sched = self.schedule
        x = batch["x"]
        mask = batch["residue_and_atom_mask"]
        residue_mask = batch["residue_mask"]
        seq = batch["residue_one_hot"]
        extra = batch["residue_extra_mask"][..., None]
        inv = batch["residue_inv_extra_mask"][..., None]
        B = x.shape[0]

        def step(carry, inp):
            if cfg.self_cond:
                z_t, seq_t, _, z_sc, sc_flag = carry
            else:
                z_t, seq_t, _ = carry
                z_sc = sc_flag = None
            t_scalar, k = inp
            if cfg.seq_reverse == "ancestral":
                kz, ks = jax.random.split(k)
            else:
                kz, ks = k, None  # keep the reference-mode noise stream
            t = jnp.broadcast_to(t_scalar, (B,))
            w_noise = (1.0 - sched.alphas[t]) / sched.sqrt_one_minus_alphas_cumprod[t]
            noise_pred, seq_pred = self.apply(
                params, batch, z_t, seq_t, mask, t, z_sc, sc_flag
            )
            mean = (1.0 / sched.sqrt_alphas[t])[:, None, None] * (
                z_t - w_noise[:, None, None] * noise_pred
            )
            if cfg.seq_reverse == "ancestral":
                # DDPM posterior on the sequence channel with seq_pred as
                # the x0 prediction; known residues clamped per step to
                # the conditioning one-hot (matching the training forward
                # process q(), which clamps them at every t). Fixes the
                # reference recurrence's weight-independence (BASELINE.md).
                pm1 = sched.posterior_mean_coef1[t][:, None, None]
                pm2 = sched.posterior_mean_coef2[t][:, None, None]
                pstd = jnp.sqrt(sched.posterior_variance[t])[:, None, None]
                mean_seq = pm1 * seq_pred + pm2 * seq_t
                noise_s = remove_mean(
                    jax.random.normal(ks, seq.shape, seq.dtype), residue_mask
                )
                seq_cand = jnp.where(
                    t_scalar == 0, seq_pred, mean_seq + pstd * noise_s
                )
                seq_next = extra * seq + inv * seq_cand
            else:
                seq_next = jax.nn.softmax(seq_pred, axis=-1) * 2.0 - 1.0
            noise = remove_mean(jax.random.normal(kz, x.shape, x.dtype), mask)
            std = sched.sqrt_betas[t][:, None, None]
            z_next = jnp.where(t_scalar == 0, mean, mean + std * noise)
            z_next, seq_next = self._guard(z_next, seq_next)
            if cfg.self_cond:
                a_t = sched.alphas_cumprod[t][:, None, None]
                z_sc_next = self._x0_hat(z_t, noise_pred, a_t, mask)
                return (z_next, seq_next, seq_pred, z_sc_next,
                        jnp.ones_like(sc_flag)), None
            return (z_next, seq_next, seq_pred), None

        return step

    def _absorbing_known_and_designable(
        self, batch: Batch
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(known ±1 one-hots with EXACT zero rows at every designable
        position, designable mask) for the absorbing samplers. Designable
        = the random inference mask's inv positions PLUS every residue
        whose identity is class 0 — a user-supplied ``X`` (aatype -1 →
        +1-shift → 0, `protein.py` sequence parse). The Gaussian path
        papers over user-X rows with softmax logits, but the absorbing
        CE never trains class 0, so without this the sampler would echo
        ``X`` for user-masked positions that the random draw skipped, and
        would feed the net a (+1,-1,...) class-0 row it never saw in
        training (the forward corruption uses exact zero rows)."""
        residue_mask = batch["residue_mask"]
        known_real = (batch["residue_type"] != 0).astype(jnp.float32)
        seq = batch["residue_one_hot"] * known_real[..., None]
        inv2 = jnp.maximum(
            batch["residue_inv_extra_mask"],
            residue_mask * (1.0 - known_real),
        )
        return seq, inv2

    def _reveal_update(
        self,
        seq_pred: jnp.ndarray,
        comm_mask: jnp.ndarray,
        comm_oh: jnp.ndarray,
        inv2: jnp.ndarray,
        n_inv: jnp.ndarray,
        t_scalar: jnp.ndarray,
        kc: jax.Array,
        kg: jax.Array,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One sticky-reveal commitment step, shared by the DDPM and DDIM
        absorbing samplers: cumulative target floor(n_inv * g(r)) at
        progress r = 1 - t/T (t the CURRENT schedule timestep, so the
        DDIM tau grid lands on the same commitment curve the DDPM path
        walks); newly committed = top-ranked STILL-ABSORBED candidates
        (most confident, optionally temperature-sampled / gumbel-noised
        per ModelConfig.reveal_*). t=0 implies full commitment."""
        cfg = self.cfg
        probs = jax.nn.softmax(seq_pred, axis=-1)
        if cfg.reveal_temperature > 0.0:
            # Gumbel-max sampling over the 20 real classes at
            # temperature tau; rank by the sampled class's probability.
            g = jax.random.gumbel(kc, probs[..., 1:].shape)
            cls = jnp.argmax(
                seq_pred[..., 1:] / cfg.reveal_temperature + g, axis=-1
            ) + 1
            conf = jnp.take_along_axis(
                probs, cls[..., None], axis=-1
            )[..., 0]
        else:
            conf = jnp.max(probs[..., 1:], axis=-1)
            cls = jnp.argmax(probs[..., 1:], axis=-1) + 1
        cand = (inv2 > 0.5) & (comm_mask < 0.5)
        frac = 1.0 - t_scalar.astype(jnp.float32) / cfg.num_steps
        if cfg.reveal_schedule == "cosine":
            frac = 1.0 - jnp.cos(0.5 * jnp.pi * frac)
        k_t = jnp.floor(n_inv * frac)
        n_new = jnp.maximum(
            k_t - jnp.sum(comm_mask, axis=-1, keepdims=True), 0.0
        )
        score = -jnp.log(conf + 1e-9)
        if cfg.reveal_conf_noise > 0.0:
            anneal = t_scalar.astype(jnp.float32) / cfg.num_steps
            score = score - cfg.reveal_conf_noise * anneal * (
                jax.random.gumbel(kg, score.shape)
            )
        score = jnp.where(cand, score, 1e10)
        new = (
            (_rank(score, axis=-1) < n_new) & cand
        ).astype(jnp.float32)
        comm_mask = comm_mask + new
        comm_oh = comm_oh + new[..., None] * (
            jax.nn.one_hot(cls, NUM_CLASSES, dtype=jnp.float32) * 2.0
            - 1.0
        )
        return comm_mask, comm_oh

    def _absorbing_step_fn(self, params: Any, batch: Batch):
        """Absorbing-mode sampler step closure (seq_process='absorbing'),
        shared by sample() and the segmented API: the coordinate channel
        runs the reference DDPM update; unknown residues are revealed by
        STICKY confidence-ranked commitment — a position's identity is
        fixed using the prediction made while it was still absorbed in
        the input (the case the CE trained), never recomputed from
        visible-position outputs (which the absorbing CE deliberately
        does not train). The carry's comm_oh accumulates committed ±1
        one-hots; sample_finish() turns known + committed into the output
        logits so the downstream argmax decode yields the designed
        sequence.

        Inference-time controls (ModelConfig, overridable per CLI run):
        ``reveal_schedule`` shapes the cumulative commitment target
        (linear, or MaskGIT cosine: most commitments land in the late
        low-noise steps); ``reveal_temperature`` samples identities from
        softmax(logits/tau) instead of argmax; ``reveal_conf_noise`` adds
        t/T-annealed gumbel noise to the ranking scores."""
        cfg = self.cfg
        sched = self.schedule
        x = batch["x"]
        mask = batch["residue_and_atom_mask"]
        seq, inv2 = self._absorbing_known_and_designable(batch)
        B = x.shape[0]
        n_inv = jnp.sum(inv2, axis=-1, keepdims=True)

        def step(carry, inp):
            if cfg.self_cond:
                z_t, comm_mask, comm_oh, z_sc, sc_flag = carry
            else:
                z_t, comm_mask, comm_oh = carry
                z_sc = sc_flag = None
            t_scalar, k = inp
            kz, kc, kg = jax.random.split(k, 3)
            t = jnp.broadcast_to(t_scalar, (B,))
            seq_t = seq + comm_oh  # absorbed positions stay zero rows
            noise_pred, seq_pred = self.apply(
                params, batch, z_t, seq_t, mask, t, z_sc, sc_flag
            )
            # Coordinate DDPM update (reference math).
            w_noise = (
                (1.0 - sched.alphas[t])
                / sched.sqrt_one_minus_alphas_cumprod[t]
            )
            mean = (1.0 / sched.sqrt_alphas[t])[:, None, None] * (
                z_t - w_noise[:, None, None] * noise_pred
            )
            noise = remove_mean(jax.random.normal(kz, x.shape, x.dtype), mask)
            std = sched.sqrt_betas[t][:, None, None]
            z_next = jnp.where(t_scalar == 0, mean, mean + std * noise)
            z_next = self._guard(z_next)
            comm_mask, comm_oh = self._reveal_update(
                seq_pred, comm_mask, comm_oh, inv2, n_inv, t_scalar, kc, kg
            )
            if cfg.self_cond:
                a_t = sched.alphas_cumprod[t][:, None, None]
                z_sc_next = self._x0_hat(z_t, noise_pred, a_t, mask)
                return (z_next, comm_mask, comm_oh, z_sc_next,
                        jnp.ones_like(sc_flag)), None
            return (z_next, comm_mask, comm_oh), None

        return step

    def sample_ddim(
        self,
        params: Any,
        batch: Batch,
        key: jax.Array,
        ddim_steps: int = 50,
        eta: float = 0.0,
        mask_prob: Optional[float] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """DDIM sampler (Song et al. 2021) over a ``ddim_steps``-long
        subsequence of the trained schedule — an acceleration capability
        beyond the reference, which can only re-granularize the beta
        schedule via its num_steps override (`generate.py:103-105`).
        eta=0 is deterministic given the key-driven initialization."""
        cfg = self.cfg
        if cfg.seq_reverse not in ("reference", "ancestral"):
            raise ValueError(
                f"seq_reverse must be 'reference' or 'ancestral', "
                f"got {cfg.seq_reverse!r}"
            )
        # Composed from the segmented API parts (sample_ddim_init /
        # sample_ddim_segment / sample_finish) so the one-shot and
        # host-segmented paths are bit-identical BY CONSTRUCTION, exactly
        # like the DDPM sample() above.
        batch, carry = self.sample_init(params, batch, key, mask_prob)
        k_scan = jax.random.split(key, 4)[3]
        taus, taus_prev = ddim_tau_grid(cfg.num_steps, ddim_steps)
        keys = jax.random.split(k_scan, ddim_steps)
        carry = self.sample_ddim_segment(
            params, batch, carry, taus, taus_prev, keys, eta=eta
        )
        return self.sample_finish(batch, carry)

    def sample_ddim_segment(
        self,
        params: Any,
        batch: Batch,
        carry: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        taus: jnp.ndarray,
        taus_prev: jnp.ndarray,
        keys: jnp.ndarray,
        eta: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Segmented-sampling part 2/3 for the DDIM sampler: scan the DDIM
        step over a contiguous descending slice of the (tau, tau_prev, key)
        streams. Shares sample_init/sample_finish with the DDPM path (the
        carry layouts are identical), so SamplingRunner(segments=S,
        sampler='ddim') host-chains S slices of the tau grid through one
        compiled program — bounding each device dispatch, which is what
        makes DDIM at the 2048 rung servable on tunneled-TPU setups whose
        worker crashes on single executions past ~1 min (BASELINE.md)."""
        if self.cfg.seq_process == "absorbing":
            step = self._ddim_absorbing_step_fn(params, batch, eta)
        else:
            step = self._ddim_gaussian_step_fn(params, batch, eta)
        carry, _ = jax.lax.scan(step, carry, (taus, taus_prev, keys))
        return carry

    def _ddim_gaussian_step_fn(self, params: Any, batch: Batch, eta: float):
        """DDIM step closure for the Gaussian sequence channel, shared by
        sample_ddim() and the segmented API."""
        cfg = self.cfg
        sched = self.schedule
        x = batch["x"]
        mask = batch["residue_and_atom_mask"]
        seq = batch["residue_one_hot"]
        extra = batch["residue_extra_mask"][..., None]
        inv = batch["residue_inv_extra_mask"][..., None]
        B = x.shape[0]

        def step(carry, inp):
            if cfg.self_cond:
                z_t, seq_t, _, z_sc, sc_flag = carry
            else:
                z_t, seq_t, _ = carry
                z_sc = sc_flag = None
            tau, tau_prev, k = inp
            t = jnp.broadcast_to(tau, (B,))
            noise_pred, seq_pred = self.apply(
                params, batch, z_t, seq_t, mask, t, z_sc, sc_flag
            )
            a_t = sched.alphas_cumprod[tau]
            a_prev = jnp.where(
                tau_prev < 0, 1.0, sched.alphas_cumprod[jnp.maximum(tau_prev, 0)]
            )
            z_next = self._ddim_coord_update(
                z_t, noise_pred, mask, a_t, a_prev, eta, k
            )
            if cfg.seq_reverse == "ancestral":
                # Deterministic DDIM step on the seq channel, seq_pred as
                # x0-hat; known residues clamped (see sample()).
                eps_seq = (seq_t - jnp.sqrt(a_t) * seq_pred) * jax.lax.rsqrt(
                    jnp.maximum(1.0 - a_t, 1e-12)
                )
                seq_cand = jnp.where(
                    tau_prev < 0,
                    seq_pred,
                    jnp.sqrt(a_prev) * seq_pred
                    + jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * eps_seq,
                )
                seq_next = extra * seq + inv * seq_cand
            else:
                seq_next = jax.nn.softmax(seq_pred, axis=-1) * 2.0 - 1.0
            z_next, seq_next = self._guard(z_next, seq_next)
            if cfg.self_cond:
                z_sc_next = self._x0_hat(z_t, noise_pred, a_t, mask)
                return (z_next, seq_next, seq_pred, z_sc_next,
                        jnp.ones_like(sc_flag)), None
            return (z_next, seq_next, seq_pred), None

        return step

    def _ddim_coord_update(
        self,
        z_t: jnp.ndarray,
        noise_pred: jnp.ndarray,
        mask: jnp.ndarray,
        a_t: jnp.ndarray,
        a_prev: jnp.ndarray,
        eta: float,
        kz: jax.Array,
    ) -> jnp.ndarray:
        """One DDIM coordinate update (Song et al. 2021 eq. 12), shared by
        the Gaussian and absorbing DDIM samplers."""
        x0_pred = (
            z_t - jnp.sqrt(1.0 - a_t) * noise_pred
        ) / jnp.sqrt(a_t)
        x0_pred = remove_mean(x0_pred, mask)
        sigma = (
            eta
            * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
            * jnp.sqrt(jnp.maximum(1.0 - a_t / a_prev, 0.0))
            # max(.,0): with a repeated tau (ddim_steps > T) a_t/a_prev
            # can round to just above 1 on TPU and the bare sqrt yields
            # NaN even at eta=0
        )
        dir_coeff = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0))
        noise = remove_mean(
            jax.random.normal(kz, z_t.shape, z_t.dtype), mask
        )
        return (
            jnp.sqrt(a_prev) * x0_pred
            + dir_coeff * noise_pred
            + sigma * noise
        )

    def _ddim_absorbing_step_fn(self, params: Any, batch: Batch, eta: float):
        """Absorbing-mode DDIM step closure: the coordinate channel runs
        the DDIM update over the ``taus`` subsequence while unknown
        residues are revealed by the same sticky confidence-ranked
        commitment as the DDPM path (``_reveal_update``) — the commitment
        target is evaluated at the CURRENT tau (the final step at t=0
        whatever the grid), so a ddim_steps-long run walks the same
        reveal curve at coarser granularity and the last step always
        commits every remaining position. This is the serving
        configuration for sequence design: 10-40x fewer denoiser evals
        (BASELINE.md sampler sweep) with the only weight-dependent
        sequence channel (BASELINE.md absorbing tables). Shared by
        sample_ddim() and the segmented API."""
        cfg = self.cfg
        sched = self.schedule
        x = batch["x"]
        mask = batch["residue_and_atom_mask"]
        seq, inv2 = self._absorbing_known_and_designable(batch)
        B = x.shape[0]
        n_inv = jnp.sum(inv2, axis=-1, keepdims=True)

        def step(carry, inp):
            if cfg.self_cond:
                z_t, comm_mask, comm_oh, z_sc, sc_flag = carry
            else:
                z_t, comm_mask, comm_oh = carry
                z_sc = sc_flag = None
            tau, tau_prev, k = inp
            kz, kc, kg = jax.random.split(k, 3)
            t = jnp.broadcast_to(tau, (B,))
            seq_t = seq + comm_oh  # absorbed positions stay zero rows
            noise_pred, seq_pred = self.apply(
                params, batch, z_t, seq_t, mask, t, z_sc, sc_flag
            )
            a_t = sched.alphas_cumprod[tau]
            a_prev = jnp.where(
                tau_prev < 0, 1.0,
                sched.alphas_cumprod[jnp.maximum(tau_prev, 0)],
            )
            z_next = self._guard(self._ddim_coord_update(
                z_t, noise_pred, mask, a_t, a_prev, eta, kz
            ))
            # The LAST step (tau_prev < 0) evaluates the reveal target at
            # t=0 whatever the grid: a ddim_steps=1 run has no tau=0 entry
            # (linspace(T-1, 0, 1) == [T-1]) yet must still commit every
            # remaining position.
            t_reveal = jnp.where(tau_prev < 0, jnp.zeros_like(tau), tau)
            comm_mask, comm_oh = self._reveal_update(
                seq_pred, comm_mask, comm_oh, inv2, n_inv, t_reveal, kc, kg
            )
            if cfg.self_cond:
                z_sc_next = self._x0_hat(z_t, noise_pred, a_t, mask)
                return (z_next, comm_mask, comm_oh, z_sc_next,
                        jnp.ones_like(sc_flag)), None
            return (z_next, comm_mask, comm_oh), None

        return step
