"""Numerical parity vs the reference's own torch modules (fp32).

Instantiates the reference Denoiser / embedding layers (torch-cpu, with
rdkit/Bio stubbed out — they are only imported for type annotations),
converts the weights through `utils/convert.py`, and compares outputs on
identical inputs. This validates both the converter's name/layout mapping
and the reimplementation's numerics (BASELINE.json fp32-parity target).

Skipped when /root/reference or torch is unavailable.
"""

import sys
import types
from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference repo not mounted"
)


def _import_reference():
    """Import reference modules with rdkit/Bio stubs (annotation-only deps)."""
    if "ProteinReDiff.modules" in sys.modules:
        import ProteinReDiff.modules as m

        return m
    for name, attrs in (
        ("rdkit", {}),
        ("rdkit.Chem", {"Mol": object, "Atom": object, "Bond": object}),
        ("Bio", {}),
        ("Bio.PDB", {}),
        ("Bio.PDB.PDBParser", {"PDBParser": object}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.modules["rdkit"].Chem = sys.modules["rdkit.Chem"]
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import ProteinReDiff.modules as m

    return m


def _import_reference_model():
    """Import the reference LightningModule with pytorch_lightning and
    torch_ema stubbed (neither is installed here; the parity test only
    needs the plain nn.Module forward pass, `model.py:254-316`)."""
    _import_reference()
    if "ProteinReDiff.model" in sys.modules:
        import ProteinReDiff.model as m

        return m
    if "pytorch_lightning" not in sys.modules:
        pl_stub = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *args, **kwargs):
                pass

        pl_stub.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl_stub
    if "torch_ema" not in sys.modules:
        ema_stub = types.ModuleType("torch_ema")

        class ExponentialMovingAverage:
            def __init__(self, parameters, decay):
                pass

        ema_stub.ExponentialMovingAverage = ExponentialMovingAverage
        sys.modules["torch_ema"] = ema_stub
    import ProteinReDiff.model as m

    return m


ARGS = dict(
    single_dim=32, pair_dim=16, head_dim=8, num_heads=2,
    transition_factor=4, num_blocks=2, esm_dim=16, n_recycles=1,
)


def make_inputs(B=2, N=12, n_pad=3, seed=0):
    rng = np.random.RandomState(seed)
    single = rng.randn(B, N, ARGS["single_dim"]).astype(np.float32)
    pair = rng.randn(B, N, N, ARGS["pair_dim"]).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    mask[:, N - n_pad:] = 0.0
    residue_mask = np.zeros((B, N), np.float32)
    residue_mask[:, 4: N - n_pad] = 1.0
    return single, pair, mask, residue_mask


class TestDenoiserParity:
    def test_denoiser_outputs_match(self):
        ref_mod = _import_reference()
        torch.manual_seed(0)
        ref = ref_mod.Denoiser(Namespace(**ARGS)).eval()

        single, pair, mask, residue_mask = make_inputs()
        batch = {
            "residue_mask": torch.from_numpy(residue_mask),
            "residue_and_atom_mask": torch.from_numpy(mask),
        }
        with torch.no_grad():
            t_single, t_pair, _ = ref(
                batch, None, None,
                torch.from_numpy(single).clone(),
                torch.from_numpy(pair).clone(),
                None,
            )

        from protein_redesign_tpu.config import ModelConfig
        from protein_redesign_tpu.models.denoiser import Denoiser
        from protein_redesign_tpu.utils.convert import convert_denoiser

        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = convert_denoiser(sd, ARGS["num_blocks"])
        cfg = ModelConfig(
            single_dim=ARGS["single_dim"], pair_dim=ARGS["pair_dim"],
            head_dim=ARGS["head_dim"], num_heads=ARGS["num_heads"],
            transition_factor=ARGS["transition_factor"],
            num_blocks=ARGS["num_blocks"], esm_dim=ARGS["esm_dim"],
            dtype="float32", remat=False,
        )
        import jax.numpy as jnp

        j_single, j_pair = Denoiser(cfg).apply(
            {"params": params}, jnp.asarray(single), jnp.asarray(pair),
            jnp.asarray(mask),
        )
        np.testing.assert_allclose(
            np.asarray(j_single), t_single.numpy(), atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(j_pair), t_pair.numpy(), atol=2e-4, rtol=2e-4
        )

    def test_denoiser_outputs_match_paper_scale(self):
        """One-shot parity at the paper-reproduction dims (single_dim 512,
        pair_dim 64, head_dim 16, 4 heads, 4 blocks — reference
        README.md:147-160). Retires the checkpoint-parity risk that the
        toy-scale test can't see (VERDICT round-1 item #3b)."""
        args = dict(
            single_dim=512, pair_dim=64, head_dim=16, num_heads=4,
            transition_factor=4, num_blocks=4, esm_dim=1280, n_recycles=1,
        )
        ref_mod = _import_reference()
        torch.manual_seed(2)
        ref = ref_mod.Denoiser(Namespace(**args)).eval()

        B, N, n_pad = 1, 96, 7
        rng = np.random.RandomState(3)
        single = rng.randn(B, N, args["single_dim"]).astype(np.float32)
        pair = rng.randn(B, N, N, args["pair_dim"]).astype(np.float32)
        mask = np.ones((B, N), np.float32)
        mask[:, N - n_pad:] = 0.0
        residue_mask = np.zeros((B, N), np.float32)
        residue_mask[:, 30: N - n_pad] = 1.0
        batch = {
            "residue_mask": torch.from_numpy(residue_mask),
            "residue_and_atom_mask": torch.from_numpy(mask),
        }
        with torch.no_grad():
            t_single, t_pair, _ = ref(
                batch, None, None,
                torch.from_numpy(single).clone(),
                torch.from_numpy(pair).clone(),
                None,
            )

        from protein_redesign_tpu.config import ModelConfig
        from protein_redesign_tpu.models.denoiser import Denoiser
        from protein_redesign_tpu.utils.convert import convert_denoiser

        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = convert_denoiser(sd, args["num_blocks"])
        cfg = ModelConfig(
            single_dim=args["single_dim"], pair_dim=args["pair_dim"],
            head_dim=args["head_dim"], num_heads=args["num_heads"],
            transition_factor=args["transition_factor"],
            num_blocks=args["num_blocks"], esm_dim=args["esm_dim"],
            dtype="float32", remat=False,
        )
        import jax.numpy as jnp

        j_single, j_pair = Denoiser(cfg).apply(
            {"params": params}, jnp.asarray(single), jnp.asarray(pair),
            jnp.asarray(mask),
        )
        np.testing.assert_allclose(
            np.asarray(j_single), t_single.numpy(), atol=1e-3, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(j_pair), t_pair.numpy(), atol=1e-3, rtol=1e-3
        )

    def test_atom_embedding_parity(self):
        ref_mod = _import_reference()
        torch.manual_seed(1)
        ref = ref_mod.AtomEmbedding(24).eval()
        feats = np.random.RandomState(0).randint(0, 2, (3, 7, 9))
        with torch.no_grad():
            t_out = ref(torch.from_numpy(feats)).numpy()

        import jax.numpy as jnp

        from protein_redesign_tpu.models.layers import AtomEmbedding
        from protein_redesign_tpu.utils.convert import _embed_stack

        tree = {}
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        _embed_stack(tree, "FusedCategoricalEmbedding_0/table", sd, "")
        j_out = AtomEmbedding(24).apply(
            {"params": tree}, jnp.asarray(feats)
        )
        np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)

    def test_projection_parity(self):
        """RBF / sinusoidal constants match the reference formulas."""
        ref_mod = _import_reference()
        x = np.linspace(0.0, 2.0, 7).astype(np.float32)
        ref_rbf = ref_mod.RadialBasisProjection(16)
        with torch.no_grad():
            t_out = ref_rbf(torch.from_numpy(x)).numpy()
        import jax.numpy as jnp

        from protein_redesign_tpu.models.layers import (
            RadialBasisProjection,
            SinusoidalProjection,
        )

        j_out = RadialBasisProjection(16).apply({}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)

        ref_sin = ref_mod.SinusoidalProjection(10)
        with torch.no_grad():
            t_out = ref_sin(torch.from_numpy(x)).numpy()
        j_out = SinusoidalProjection(10).apply({}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)


FULL_ARGS = dict(
    # DiffusionModel group (`model.py:136-158`) at toy dims
    training_mode=False, mask_prob=1.0, esm_dim=24, time_dim=12,
    dist_dim=12, single_dim=32, pair_dim=16, head_dim=8, num_heads=2,
    transition_factor=4, num_blocks=2, max_bond_distance=7, max_relpos=32,
    num_steps=8, diffusion_schedule="linear", learning_rate=4e-4,
    warmup_steps=1000, ema_decay=0.999,
    # dead IterativeDenoiser group (`model.py:160-170`)
    n_recycles=1, top_k_neighbors=30, dropout=0.3,
    num_gvp_encoder_layers=3, num_positional_embeddings=16,
    gvp_edge_hidden_dim_scalar=32, gvp_edge_hidden_dim_vector=32,
)


def _full_net_batch(B=2, N=14, n_atoms=4, n_res=7, seed=0):
    """A featurized batch carrying every key both forwards read
    (collate layout: atoms in [0, n_atoms), residues after)."""
    rng = np.random.RandomState(seed)
    b = {}
    b["atom_feats"] = rng.randint(0, 2, (B, N, 9)).astype(np.int64)
    b["atom_mask"] = np.zeros((B, N), np.float32)
    b["atom_mask"][:, :n_atoms] = 1.0
    b["atom_pos"] = rng.randn(B, N, 3).astype(np.float32)
    b["bond_feats"] = rng.randint(0, 2, (B, N, N, 3)).astype(np.int64)
    b["bond_mask"] = np.zeros((B, N, N), np.float32)
    b["bond_mask"][:, :n_atoms, :n_atoms] = 1.0
    b["bond_distance"] = rng.randint(0, 9, (B, N, N)).astype(np.int64)
    b["residue_type"] = np.zeros((B, N), np.int64)
    b["residue_type"][:, n_atoms:n_atoms + n_res] = rng.randint(
        1, 21, (B, n_res)
    )
    b["residue_mask"] = np.zeros((B, N), np.float32)
    b["residue_mask"][:, n_atoms:n_atoms + n_res] = 1.0
    b["residue_chain_index"] = np.zeros((B, N), np.int64)
    b["residue_index"] = np.zeros((B, N), np.int64)
    b["residue_index"][:, n_atoms:n_atoms + n_res] = np.arange(n_res)
    b["residue_atom_pos"] = rng.randn(B, N, 37, 3).astype(np.float32)
    b["residue_atom_mask"] = np.zeros((B, N, 37), np.float32)
    b["residue_atom_mask"][:, n_atoms:n_atoms + n_res, 1] = 1.0
    b["residue_esm"] = rng.randn(B, N, FULL_ARGS["esm_dim"]).astype(
        np.float32
    )
    # prepare_batch-derived keys (`model.py:424-468`); values arbitrary but
    # well-formed — forward() only consumes them via the batch dict.
    one_hot = np.eye(21, dtype=np.float32)[b["residue_type"]] * 2.0 - 1.0
    b["residue_one_hot"] = one_hot * b["residue_mask"][..., None]
    b["residue_extra_mask"] = b["residue_mask"].copy()
    b["residue_inv_extra_mask"] = np.zeros((B, N), np.float32)
    b["residue_type_masked"] = b["residue_type"].copy()
    b["residue_and_atom_mask"] = b["atom_mask"] + b["residue_mask"]
    return b


class TestFullNetParity:
    def test_forward_outputs_match(self):
        """Full ProteinReDiffNet forward (embedding heads + Denoiser +
        equivariant readout + sequence head) vs the reference
        `model.py:254-316` forward (VERDICT round-1 item #3a)."""
        ref_model_mod = _import_reference_model()
        torch.manual_seed(5)
        ref = ref_model_mod.ProteinReDiffModel(
            Namespace(**FULL_ARGS)
        ).eval()
        # 'final'/'gating'-init layers start at zero, which would zero both
        # heads and make the comparison vacuous; give every zero parameter
        # a random value so the whole mapping is exercised.
        with torch.no_grad():
            for p in ref.parameters():
                if float(p.abs().sum()) == 0.0:
                    torch.nn.init.normal_(p, std=0.3)

        B, N = 2, 14
        rng = np.random.RandomState(11)
        batch_np = _full_net_batch(B=B, N=N)
        z = rng.randn(B, N, 3).astype(np.float32)
        seq_t = rng.randn(B, N, 21).astype(np.float32)
        mask = batch_np["residue_and_atom_mask"]
        t = rng.randint(0, FULL_ARGS["num_steps"], (B,)).astype(np.int64)

        batch_t = {k: torch.from_numpy(v) for k, v in batch_np.items()}
        with torch.no_grad():
            t_noise, t_seq = ref(
                batch_t,
                torch.from_numpy(z).clone(),
                torch.from_numpy(seq_t).clone(),
                torch.from_numpy(mask),
                torch.from_numpy(t),
            )

        import jax.numpy as jnp

        from protein_redesign_tpu.config import ModelConfig
        from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
        from protein_redesign_tpu.utils.convert import convert_state_dict

        cfg_fields = {
            f for f in ModelConfig.__dataclass_fields__
        }
        cfg = ModelConfig(**{
            k: v for k, v in FULL_ARGS.items() if k in cfg_fields
        }).replace(dtype="float32", remat=False)
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = convert_state_dict(sd, cfg)

        model = ProteinReDiffModel(cfg)
        batch_j = {k: jnp.asarray(v) for k, v in batch_np.items()}
        j_noise, j_seq = model.apply(
            params, batch_j, jnp.asarray(z), jnp.asarray(seq_t),
            jnp.asarray(mask), jnp.asarray(t),
        )
        np.testing.assert_allclose(
            np.asarray(j_noise), t_noise.numpy(), atol=3e-4, rtol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(j_seq), t_seq.numpy(), atol=3e-4, rtol=3e-4
        )
