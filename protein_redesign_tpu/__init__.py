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

__version__ = "0.1.0"
