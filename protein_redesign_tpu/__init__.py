"""ProteinReDiff-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
ligand-binding protein redesign by joint sequence+structure diffusion.

Re-designed from scratch with the capabilities of HySonLab/Protein_Redesign
(ProteinReDiff; Structural Dynamics 11(6) 064102). The compute path is pure
JAX — jitted denoiser, lax.scan sampling, pjit/shard_map data+model
parallelism over a TPU mesh — while host-side chemistry (PDB/SDF/SMILES
parsing, featurization) is dependency-free Python/NumPy.

Layer map (mirrors the reference layering, see SURVEY.md):
  chem/      L0 chem/bio primitives (Protein, Molecule, featurizers)
  data/      L1 featurization, bucketed static-shape collation, datasets
  models/    L2-L4 masking, denoiser network, diffusion process
  ops/       geometry utilities and Pallas TPU kernels
  parallel/  mesh construction + pjit train/sample steps
  utils/     ESM embedder plug, TM-align wrapper, checkpointing, logging
  cli/       train / generate / batch-predict / preprocess entry points
"""

__version__ = "0.2.0"

# Lazy top-level API (PEP 562) — keeps `import protein_redesign_tpu` free
# of jax/flax import cost for host-side-only users (e.g. chem tooling).
_EXPORTS = {
    "ModelConfig": ("protein_redesign_tpu.config", "ModelConfig"),
    "DataConfig": ("protein_redesign_tpu.config", "DataConfig"),
    "TrainConfig": ("protein_redesign_tpu.config", "TrainConfig"),
    "ProteinReDiffModel": (
        "protein_redesign_tpu.models.prdiff", "ProteinReDiffModel"
    ),
    "ProteinReDiffNet": (
        "protein_redesign_tpu.models.prdiff", "ProteinReDiffNet"
    ),
    "DiffusionSchedule": (
        "protein_redesign_tpu.models.diffusion", "DiffusionSchedule"
    ),
    "Protein": ("protein_redesign_tpu.chem.protein", "Protein"),
    "Molecule": ("protein_redesign_tpu.chem.mol", "Molecule"),
    "ESMEmbedder": ("protein_redesign_tpu.utils.esm", "ESMEmbedder"),
    "SamplingRunner": ("protein_redesign_tpu.cli.common", "SamplingRunner"),
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    try:
        module, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    return getattr(importlib.import_module(module), attr)
