"""Data-parallel sampling over the virtual 8-device mesh."""

import pytest
import jax
import numpy as np

from protein_redesign_tpu.config import ModelConfig
from protein_redesign_tpu.models.prdiff import ProteinReDiffModel
from protein_redesign_tpu.parallel.mesh import make_mesh

TINY = ModelConfig(
    esm_dim=16, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
    head_dim=4, num_heads=2, num_blocks=1, num_steps=2,
    dtype="float32", remat=False,
)


def test_mesh_sampling_runner():
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.data import ligand_to_data, protein_to_data

    mesh = make_mesh(jax.devices(), (8, 1))
    model = ProteinReDiffModel(TINY)

    mol = update_mol_positions(mol_from_smiles("CCO"), np.zeros((3, 3)))
    prot = protein_from_sequence("ACDEFGHIKL")
    data = {
        **ligand_to_data(mol),
        **protein_to_data(prot, esm_dim=16),
    }
    import jax.numpy as jnp

    from protein_redesign_tpu.data import collate_fn
    from protein_redesign_tpu.data.collate import numeric_batch

    init_batch = {
        k: jnp.asarray(v)
        for k, v in numeric_batch(collate_fn([data], buckets=(16,))).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), init_batch)

    runner = SamplingRunner(
        model, params, buckets=(16,), batch_size=8, mask_prob=0.3, mesh=mesh
    )
    # 10 samples with a non-multiple batch: runner pads rows internally.
    results = runner.run([data] * 10, jax.random.PRNGKey(1))
    assert len(results) == 10
    for pos, logits in results:
        assert pos.shape == (13, 3)  # 3 atoms + 10 residues
        assert logits.shape == (13, 21)
        assert np.isfinite(pos).all()


def _tiny_runner_inputs():
    from protein_redesign_tpu.chem import (
        mol_from_smiles,
        protein_from_sequence,
        update_mol_positions,
    )
    from protein_redesign_tpu.data import (
        collate_fn,
        ligand_to_data,
        protein_to_data,
    )
    from protein_redesign_tpu.data.collate import numeric_batch
    import jax.numpy as jnp

    mol = update_mol_positions(mol_from_smiles("CCO"), np.zeros((3, 3)))
    prot = protein_from_sequence("ACDEFGHIKL")
    data = {**ligand_to_data(mol), **protein_to_data(prot, esm_dim=16)}
    model = ProteinReDiffModel(TINY)
    init_batch = {
        k: jnp.asarray(v)
        for k, v in numeric_batch(collate_fn([data], buckets=(16,))).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), init_batch)
    return model, params, data


def test_mesh_sampling_matches_single_device():
    """DP sampling is embarrassingly parallel along the batch axis: an
    8-device mesh run must reproduce the single-device result bit-for-bit
    given the same key and effective batch (VERDICT round-1 item #2)."""
    from protein_redesign_tpu.cli.common import SamplingRunner

    model, params, data = _tiny_runner_inputs()
    datas = [data] * 8
    key = jax.random.PRNGKey(7)

    single = SamplingRunner(
        model, params, buckets=(16,), batch_size=8, mask_prob=0.3
    )
    res_single = single.run(datas, key)

    mesh = make_mesh(jax.devices(), (8, 1))
    sharded = SamplingRunner(
        model, params, buckets=(16,), batch_size=8, mask_prob=0.3, mesh=mesh
    )
    res_mesh = sharded.run(datas, key)

    for (p1, l1), (p2, l2) in zip(res_single, res_mesh):
        np.testing.assert_allclose(p1, p2, rtol=0, atol=1e-5)
        np.testing.assert_allclose(l1, l2, rtol=0, atol=1e-5)


def test_mesh_sampling_with_kernel_matches_single_device():
    """Mesh DP sampling on the Pallas attention kernel path: the
    custom_partitioning rows rule shards the kernel over each device's
    batch slice (round 2 — previously mesh inference was forced onto
    the XLA paths). Same key, same results as the unsharded kernel."""
    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

    model, params, data = _tiny_runner_inputs()
    model = ProteinReDiffModel(model.cfg.replace(use_pallas=True))
    datas = [data] * 8
    key = jax.random.PRNGKey(7)

    single = SamplingRunner(
        model, params, buckets=(16,), batch_size=8, mask_prob=0.3
    )
    res_single = single.run(datas, key)

    mesh = make_mesh(jax.devices(), (8, 1))
    sharded = SamplingRunner(
        model, params, buckets=(16,), batch_size=8, mask_prob=0.3, mesh=mesh
    )
    res_mesh = sharded.run(datas, key)

    for (p1, l1), (p2, l2) in zip(res_single, res_mesh):
        np.testing.assert_allclose(p1, p2, rtol=0, atol=1e-5)
        np.testing.assert_allclose(l1, l2, rtol=0, atol=1e-5)


def test_mesh_segmented_ddim_with_trajectory():
    """Segmented DDIM + trajectory capture compose with data-parallel
    mesh sampling: explicit segments=2 on an 8-device mesh matches the
    single-device one-shot DDIM result bit-for-bit, and frames come back
    gathered [K, n, 3]."""
    from protein_redesign_tpu.cli.common import SamplingRunner

    model, params, data = _tiny_runner_inputs()
    datas = [data] * 8
    key = jax.random.PRNGKey(7)
    kw = dict(buckets=(16,), batch_size=8, mask_prob=0.3,
              sampler="ddim", ddim_steps=2)

    single = SamplingRunner(model, params, **kw)
    res_single = single.run(datas, key)

    mesh = make_mesh(jax.devices(), (8, 1))
    sharded = SamplingRunner(model, params, mesh=mesh, segments=2, **kw)
    res_mesh = sharded.run(datas, key, trajectory=2)

    for (p1, l1), (p2, l2, frames) in zip(res_single, res_mesh):
        np.testing.assert_allclose(p1, p2, rtol=0, atol=1e-5)
        np.testing.assert_allclose(l1, l2, rtol=0, atol=1e-5)
        assert frames.shape == (2,) + p2.shape
        np.testing.assert_array_equal(frames[-1], p2)


def test_runner_mask_prob_does_not_retrace():
    """mask_prob is a traced argument: varying it per call reuses the one
    compiled program (the serve CLI depends on this — VERDICT item #2)."""
    from protein_redesign_tpu.cli.common import SamplingRunner

    model, params, data = _tiny_runner_inputs()
    # Freshly initialized heads are zero-init ('final' AF2 init), making
    # outputs conditioning-independent; perturb so mask_prob is observable.
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(x.dtype),
        params,
    )
    runner = SamplingRunner(
        model, params, buckets=(16,), batch_size=1, mask_prob=0.3
    )
    key = jax.random.PRNGKey(3)
    r1 = runner.run([data], key, mask_prob=0.05)
    assert runner.trace_count == 1
    r2 = runner.run([data], key, mask_prob=0.95)
    assert runner.trace_count == 1  # no retrace on a new mask_prob
    # And the traced scalar is actually live: different fractions change
    # the conditioning, hence the sampled positions.
    assert not np.allclose(r1[0][0], r2[0][0])


@pytest.mark.parametrize("outer_factored", [False, True])
def test_sequence_parallel_denoiser_matches(outer_factored):
    """sequence_parallel=True shards the pair tensor's complex axis over
    'model' (context parallelism for N >~ 1024); on a (2, 4) mesh the
    GSPMD-partitioned forward must match the unsharded one (SURVEY §5
    long-context — the last uncovered subsystem of round 1). Both
    OuterLinear/OPM implementations (default and factored) must
    partition correctly."""
    import jax.numpy as jnp

    from protein_redesign_tpu.models.denoiser import Denoiser

    cfg = TINY.replace(outer_factored=outer_factored)
    rng = np.random.RandomState(2)
    B, N = 2, 16
    single = jnp.asarray(rng.randn(B, N, cfg.single_dim), jnp.float32)
    pair = jnp.asarray(rng.randn(B, N, N, cfg.pair_dim), jnp.float32)
    mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))

    base = Denoiser(cfg)
    params = base.init(jax.random.PRNGKey(0), single, pair, mask)["params"]
    s_ref, p_ref = jax.jit(
        lambda p: base.apply({"params": p}, single, pair, mask)
    )(params)

    mesh = make_mesh(jax.devices(), (2, 4))
    sharded = Denoiser(cfg.replace(sequence_parallel=True))
    with mesh:
        s_sp, p_sp = jax.jit(
            lambda p: sharded.apply({"params": p}, single, pair, mask)
        )(params)
    np.testing.assert_allclose(
        np.asarray(s_sp), np.asarray(s_ref), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_sp), np.asarray(p_ref), atol=1e-5, rtol=1e-5
    )
