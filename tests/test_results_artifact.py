"""Golden output-format parity with the reference's shipped inference
artifact (`/root/reference/results.pt`): a list of 8 per-sample tuples
(positions [1,n,3], sequence logits [1,n,21]; n varies per complex, e.g.
144 and 228) saved straight from `predict_step` (reference
`model.py:249-252,421-422`).

This framework's `SamplingRunner.run` returns the same per-sample pair,
trimmed to the true node count and with the batch dim squeezed (a
documented improvement; `cli/common.py:326-334`): for a 144-node complex,
(144, 3) Angstrom positions and (144, 21) residue-class logits.
"""

import os

import numpy as np
import pytest

REF_ARTIFACT = "/root/reference/results.pt"


@pytest.mark.skipif(
    not os.path.exists(REF_ARTIFACT), reason="reference artifact not mounted"
)
def test_reference_artifact_contract():
    torch = pytest.importorskip("torch")
    results = torch.load(REF_ARTIFACT, map_location="cpu", weights_only=True)
    assert isinstance(results, list) and len(results) == 8
    sizes = set()
    for pos, logits in results:
        assert pos.ndim == 3 and pos.shape[0] == 1 and pos.shape[2] == 3
        assert tuple(logits.shape) == (1, pos.shape[1], 21)
        assert pos.dtype == torch.float32
        assert logits.dtype == torch.float32
        sizes.add(int(pos.shape[1]))
    assert 144 in sizes  # the complex documented in SURVEY.md §4


def _complex_with_nodes(n_res, esm_dim):
    from protein_redesign_tpu.chem.mol import (
        mol_from_smiles,
        update_mol_positions,
    )
    from protein_redesign_tpu.chem.protein import protein_from_sequence
    from protein_redesign_tpu.data.featurize import (
        ligand_to_data,
        protein_to_data,
    )

    mol = mol_from_smiles("CC(=O)O")  # 4 heavy atoms
    mol = update_mol_positions(
        mol, np.zeros((mol.num_atoms(), 3), np.float32)
    )
    seq = ("ARNDCQEGHILKMFPSTWYV" * 7)[:n_res]
    prot = protein_from_sequence(seq)
    prot.atom_pos[:, 1] = np.random.RandomState(0).randn(n_res, 3)
    return {
        **ligand_to_data(mol),
        **protein_to_data(prot, esm_dim=esm_dim),
    }


def test_runner_output_matches_artifact_semantics():
    import jax

    from protein_redesign_tpu.cli.common import SamplingRunner
    from protein_redesign_tpu.config import ModelConfig
    from protein_redesign_tpu.models.prdiff import ProteinReDiffModel

    cfg = ModelConfig(
        esm_dim=16, time_dim=8, dist_dim=8, single_dim=16, pair_dim=8,
        head_dim=4, num_heads=2, num_blocks=1, num_steps=4,
        dtype="float32", remat=False,
    )
    model = ProteinReDiffModel(cfg)
    data = _complex_with_nodes(n_res=140, esm_dim=cfg.esm_dim)  # 4+140=144
    n_nodes = data["num_atoms"] + data["num_residues"]
    assert n_nodes == 144

    import jax.numpy as jnp  # noqa: F401  (jit warm path)

    batch = None
    params = None
    runner = SamplingRunner.__new__(SamplingRunner)
    # Build params via the runner's own init path: construct normally.
    from protein_redesign_tpu.data.collate import collate_fn, numeric_batch

    batch = {
        k: np.asarray(v)
        for k, v in numeric_batch(collate_fn([data], buckets=(192,))).items()
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    runner = SamplingRunner(model, params, batch_size=2, mask_prob=0.3)

    results = runner.run([data, data], jax.random.PRNGKey(1))
    assert len(results) == 2
    for pos, logits in results:
        assert pos.shape == (144, 3)
        assert logits.shape == (144, 21)
        assert np.isfinite(pos).all() and np.isfinite(logits).all()
