"""Segmented DDPM sampling (SamplingRunner(segments=S)): host-chained
T/S-step dispatches must reproduce the single-scan sampler BIT-identically
for both sequence processes — a scan over concatenated slices is one scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _make_batch
from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

TINY = ModelConfig(
    esm_dim=16, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
    head_dim=4, num_heads=2, num_blocks=1, num_steps=8,
    dtype="float32", remat=False,
)


def _batch():
    return {
        k: jnp.asarray(v) for k, v in _make_batch(4, 8, 16, esm_dim=16).items()
    }


@pytest.mark.parametrize("seq_process", ["gaussian", "absorbing"])
def test_segmented_matches_single_scan(seq_process):
    model = ProteinReDiffModel(TINY.replace(seq_process=seq_process))
    batch = _batch()
    params = model.init_params(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(7)

    ref = jax.jit(
        lambda p, b, k: model.sample(p, b, k, mask_prob=0.5)
    )(params, batch, key)

    T = model.cfg.num_steps
    prepared, carry = jax.jit(
        lambda p, b, k: model.sample_init(p, b, k, mask_prob=0.5)
    )(params, batch, key)
    k_scan = jax.random.split(key, 4)[3]
    ts = jnp.arange(T - 1, -1, -1)
    keys = jax.random.split(k_scan, T)
    seg = jax.jit(model.sample_segment)
    for lo in range(0, T, 2):
        carry = seg(params, prepared, carry, ts[lo:lo + 2], keys[lo:lo + 2])
    out = jax.jit(model.sample_finish)(prepared, carry)

    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))


def test_runner_segments_match():
    """End-to-end through SamplingRunner: segments=4 == segments=1."""
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data

    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = _batch()
    params = model.init_params(jax.random.PRNGKey(0), batch)

    mol = update_mol_positions(mol_from_smiles("CC"), np.zeros((2, 3)))
    prot = protein_from_sequence("ACDEFGHI")
    data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}
    key = jax.random.PRNGKey(3)
    r1 = SamplingRunner(model, params, buckets=(16,), mask_prob=0.5)
    r4 = SamplingRunner(model, params, buckets=(16,), mask_prob=0.5,
                        segments=4)
    out1 = r1.run([data], key)
    out4 = r4.run([data], key)
    np.testing.assert_array_equal(out1[0][0], out4[0][0])
    np.testing.assert_array_equal(out1[0][1], out4[0][1])


@pytest.mark.parametrize("seq_process", ["gaussian", "absorbing"])
def test_runner_ddim_segments_match(seq_process):
    """Segmented DDIM == one-shot DDIM bit-identically through the runner
    (the tau/tau_prev/key streams slice exactly like the DDPM streams;
    both compose the same sample_init/sample_finish)."""
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data

    model = ProteinReDiffModel(
        TINY.replace(training_mode=False, seq_process=seq_process)
    )
    batch = _batch()
    params = model.init_params(jax.random.PRNGKey(0), batch)

    mol = update_mol_positions(mol_from_smiles("CC"), np.zeros((2, 3)))
    prot = protein_from_sequence("ACDEFGHI")
    data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}
    key = jax.random.PRNGKey(3)
    kw = dict(buckets=(16,), mask_prob=0.5, sampler="ddim", ddim_steps=6,
              eta=0.3)
    r1 = SamplingRunner(model, params, **kw)
    r3 = SamplingRunner(model, params, segments=3, **kw)
    out1 = r1.run([data], key)
    out3 = r3.run([data], key)
    np.testing.assert_array_equal(out1[0][0], out3[0][0])
    np.testing.assert_array_equal(out1[0][1], out3[0][1])


@pytest.mark.parametrize("sampler,kw", [
    ("ddpm", {}), ("ddim", {"ddim_steps": 4}),
])
def test_runner_trajectory(sampler, kw):
    """trajectory=K rides the segment boundaries: K frames per result,
    last frame == the final positions (sample_finish applies the same
    nm->Angstrom map to the same carry), and the sample itself is
    bit-identical to a run without capture."""
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data

    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = _batch()
    params = model.init_params(jax.random.PRNGKey(0), batch)
    mol = update_mol_positions(mol_from_smiles("CC"), np.zeros((2, 3)))
    prot = protein_from_sequence("ACDEFGHI")
    data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}
    key = jax.random.PRNGKey(3)

    runner = SamplingRunner(model, params, buckets=(16,), mask_prob=0.5,
                            sampler=sampler, **kw)
    plain = runner.run([data], key)
    traj = runner.run([data], key, trajectory=4)
    pos, logits, frames = traj[0]
    assert frames.shape == (4,) + pos.shape
    np.testing.assert_array_equal(frames[-1], pos)
    np.testing.assert_array_equal(plain[0][0], pos)
    np.testing.assert_array_equal(plain[0][1], logits)

    with pytest.raises(ValueError, match="positive divisor"):
        runner.run([data], key, trajectory=3)
    with pytest.raises(ValueError, match="positive divisor"):
        runner.run([data], key, trajectory=-2)  # |−2| divides; still bad
    rp = SamplingRunner(model, params, buckets=(16,), mask_prob=0.5,
                        sampler="ddim_parallel")
    with pytest.raises(ValueError, match="intermediate states"):
        rp.run([data], key, trajectory=2)


def test_trajectory_respects_explicit_segments():
    """With an explicit --sample_segments, trajectory capture never
    silently compiles a different segment shape: frames must divide the
    explicit segment count (then land on its boundaries), else error."""
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data

    model = ProteinReDiffModel(TINY.replace(training_mode=False))
    batch = _batch()
    params = model.init_params(jax.random.PRNGKey(0), batch)
    mol = update_mol_positions(mol_from_smiles("CC"), np.zeros((2, 3)))
    prot = protein_from_sequence("ACDEFGHI")
    data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}
    key = jax.random.PRNGKey(3)

    runner = SamplingRunner(model, params, buckets=(16,), mask_prob=0.5,
                            segments=4)  # T=8 -> seg_len 2
    out = runner.run([data], key, trajectory=2)  # 2 | 4: every 2nd seg
    traced = runner.trace_count
    assert out[0][2].shape[0] == 2
    # Same segment shape as plain segmented runs: no new compile.
    runner.run([data], key)
    assert runner.trace_count == traced
    with pytest.raises(ValueError, match="explicit"):
        runner.run([data], key, trajectory=8)  # 8 does not divide 4


def test_runner_segment_validation():
    from protein_redesign_tpu.cli.common import SamplingRunner

    model = ProteinReDiffModel(TINY)
    batch = _batch()
    params = model.init_params(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="divisible"):
        SamplingRunner(model, params, segments=3)
    with pytest.raises(ValueError, match="divisible"):
        SamplingRunner(model, params, sampler="ddim", ddim_steps=5,
                       segments=2)
    with pytest.raises(ValueError, match="Picard window"):
        SamplingRunner(model, params, sampler="ddim_parallel", segments=2)


def test_auto_segments_policy():
    """segments=0 (default): bound each dispatch's ESTIMATED runtime
    (conservative ~6.5 ms x B x (bucket/192)^3 per step, 30 s budget) —
    catching both the B=1 long-context and B=8 bucket-192 crash cases
    from BASELINE.md; explicit values win."""
    from protein_redesign_tpu.cli.common import SamplingRunner

    model = ProteinReDiffModel(TINY.replace(num_steps=1000))
    r = SamplingRunner.__new__(SamplingRunner)
    r.model, r.sampler, r.segments = model, "ddpm", 0
    # Short/cheap: one program.
    assert r._segments_for(192, 1) == 1
    assert r._segments_for(256, 1) == 1
    # The two observed crash shapes segment:
    assert r._segments_for(192, 8) > 1    # B=8 bucket 192 (~97 s)
    assert r._segments_for(768, 1) >= 10  # B=1 N=768 (157.7 s)
    assert r._segments_for(1024, 1) >= 20
    # Estimated dispatch stays under the budget in every case.
    for bucket, B in ((192, 8), (512, 2), (768, 1), (1024, 4)):
        S = r._segments_for(bucket, B)
        est = 6.5 * B * (bucket / 192) ** 3 * (1000 / S)
        assert est <= 30_000.0 or S == 1000
    r.segments = 4                        # explicit wins
    assert r._segments_for(1024, 1) == 4
    r.segments, r.sampler = 0, "ddim"     # DDIM segments over ddim_steps
    r.ddim_steps = 50
    assert r._segments_for(256, 1) == 1   # 50 short steps: one program
    assert r._segments_for(2048, 1) > 1   # DDIM-50 at 2048 (~2 min est)
    r.sampler = "ddim_parallel"           # already window-bounded: never
    assert r._segments_for(2048, 1) == 1
    r.sampler = "ddpm"
    r.model = ProteinReDiffModel(TINY)    # T=8: fits any budget
    r.segments = 0
    assert r._segments_for(256, 1) == 1
