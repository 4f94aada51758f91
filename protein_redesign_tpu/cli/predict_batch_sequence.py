"""Batched sequence-only redesign CLI
(reference `scripts/predict_batch_seq_msk_inp.py:166-263`): identical
pipeline to the structure variant, but discards coordinates and writes
argmax-decoded sequences to sample_sequences.fasta.
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def main(argv=None):
    from .common import add_esm_args, add_sampler_args

    parser = ArgumentParser()
    parser.add_argument("--accelerator", type=str, default="tpu")  # accepted
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_devices", "--num_gpus", type=int, default=1,
                        dest="num_devices",
                        help="data-parallel sampling over this many chips "
                             "(the reference's DDP --num_gpus)")
    parser.add_argument("--num_workers", type=int, default=1)  # accepted
    parser.add_argument("--num_steps", type=int, default=64)
    parser.add_argument("--mask_prob", type=float, default=0.3)
    parser.add_argument("--training_mode", action="store_true")
    add_esm_args(parser)
    add_sampler_args(parser)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("-c", "--ckpt_path", type=Path, required=True)
    parser.add_argument("-o", "--output_dir", type=Path, required=True)
    parser.add_argument("-p", "--fasta", type=str, required=True)
    parser.add_argument("-l", "--ligand_file", type=str, default=None)
    parser.add_argument("-n", "--num_samples", type=int, default=1)
    args = parser.parse_args(argv)

    import jax

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from ..data.featurize import ligand_to_data, protein_to_data
    from ..models.prdiff import ProteinReDiffModel
    from ..utils.esm import ESMEmbedder
    from .common import (
        SamplingRunner,
        apply_serving_defaults,
        make_inference_mesh,
        parse_ligands,
        predict_seq,
        proteins_from_fasta_with_mask,
        runner_sampler_kwargs,
        sampler_cfg_overrides,
    )
    from .generate import _load_params

    seed = args.seed if args.seed is not None else int(
        np.random.randint(99999)
    )
    args.output_dir.mkdir(parents=True, exist_ok=True)

    params, cfg = _load_params(args.ckpt_path, num_steps=args.num_steps)
    model = ProteinReDiffModel(apply_serving_defaults(
        cfg.replace(training_mode=False, **sampler_cfg_overrides(args)),
        args,
    ))

    import random as _random

    proteins, names, masked_sequences = proteins_from_fasta_with_mask(
        args.fasta, args.mask_prob, rng=_random.Random(seed)
    )
    with open(args.output_dir / "masked_sequences.fasta", "w") as f:
        for i, (name, seq) in enumerate(zip(names, masked_sequences)):
            f.write(f">{name}_sample_{i % args.num_samples}\n{seq}\n")

    if args.ligand_file is None:
        ligands = parse_ligands(["*"] * len(names))
    else:
        ligands = parse_ligands(args.ligand_file)

    embedder = ESMEmbedder(model_name=args.esm_model,
                           esm_dim=cfg.esm_dim,
                           require=args.require_esm,
                           backend=args.esm_backend)
    datas = []
    for protein, ligand in zip(proteins, ligands):
        data = {
            **ligand_to_data(ligand),
            **protein_to_data(
                protein, residue_esm=embedder.embed_protein(protein)
            ),
        }
        datas.extend([data] * args.num_samples)

    runner = SamplingRunner(
        model, params, batch_size=args.batch_size, mask_prob=args.mask_prob,
        mesh=make_inference_mesh(args.num_devices),
        **runner_sampler_kwargs(args),
    )
    results = runner.run(datas, jax.random.PRNGKey(seed))

    rep_names = [n for n in names for _ in range(args.num_samples)]
    with open(args.output_dir / "sample_sequences.fasta", "w") as f:
        for i, (name, (_pos, seq_prob)) in enumerate(
            zip(rep_names, results)
        ):
            f.write(f">{name}_sample_{i % args.num_samples}\n")
            f.write(f"{predict_seq(seq_prob)}\n")
    print(f"wrote sample_sequences.fasta for {len(names)} inputs")


if __name__ == "__main__":
    main()
