"""FLOP accounting (utils/flops.py): the analytic denoiser count must
agree with XLA's own cost analysis of the compiled forward — the MFU
numbers in bench.py/BASELINE.md are only as good as this denominator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.utils.flops import (
    compiled_flops,
    denoiser_forward_flops,
    mfu,
)


def _forward_flops_xla(cfg, bucket, n_res):
    model = ProteinReDiffModel(cfg)
    b = {k: jnp.asarray(v)
         for k, v in _make_batch(32, n_res, bucket,
                                 esm_dim=cfg.esm_dim).items()}
    B, N = b["residue_mask"].shape
    mask = b["atom_mask"] + b["residue_mask"]
    seq = jnp.zeros((B, N, 21))
    t = jnp.zeros((B,), jnp.int32)
    z = jnp.asarray(np.random.RandomState(0).randn(B, N, 3), jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), b)
    fwd = jax.jit(lambda p, z: model.apply(p, b, z, seq, mask, t))
    compiled = fwd.lower(params, z).compile()
    return compiled_flops(compiled)


@pytest.mark.slow
def test_analytic_matches_xla_at_paper_dims():
    """Paper-scale dims (512/64, h16x4) at bucket 128: the analytic
    count must land within 15% of XLA's, bounding everything the model
    omits (embedders, readout, elementwise)."""
    cfg = ModelConfig(single_dim=512, pair_dim=64, num_blocks=2,
                      num_steps=8, esm_dim=320, training_mode=False,
                      pallas_auto_min_n=0)
    xla = _forward_flops_xla(cfg, bucket=128, n_res=96)
    assert xla is not None, "CPU backend stopped reporting cost analysis"
    analytic = denoiser_forward_flops(cfg, batch=1, n=128)
    assert analytic == pytest.approx(xla, rel=0.15), (analytic, xla)


def test_analytic_scales_with_n_cubed():
    """The O(N^3) triangle terms dominate at paper scale: doubling N
    from 512 must multiply the count by more than 4 (super-quadratic)
    and at most 8."""
    cfg = ModelConfig(single_dim=512, pair_dim=64, num_blocks=4,
                      num_steps=8)
    f1 = denoiser_forward_flops(cfg, 1, 512)
    f2 = denoiser_forward_flops(cfg, 1, 1024)
    assert 4.0 < f2 / f1 <= 8.0


def test_mfu_units():
    # 1.97e13 FLOP in 1 s on a 1.97e14-peak chip = 10% MFU.
    assert mfu(1.97e13, 1.0) == pytest.approx(0.10)


def test_batch_linear():
    cfg = ModelConfig(single_dim=64, pair_dim=16, num_blocks=1, num_steps=8)
    assert denoiser_forward_flops(cfg, 4, 128) == pytest.approx(
        4 * denoiser_forward_flops(cfg, 1, 128))
