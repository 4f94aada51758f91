"""Data-parallel sampling over the virtual 8-device mesh."""

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
