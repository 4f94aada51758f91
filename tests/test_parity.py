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
