"""Batched structure redesign CLI
(reference `scripts/predict_batch_strc_msk_inp.py:166-305`).

    python -m protein_redesign_tpu.cli.predict_batch_structure \\
        -c <ckpt> -o out/ -p seqs.fasta [-l ligands.smiles] -n 4 \\
        [--num_steps 1000] [--mask_prob 0.3]

Outputs per input name: sample_protein_<name>_model_<i>.pdb,
sample_ligand_<name>_model_<i>.sdf, sample_tmscores_<name>.txt, plus
masked_sequences.fasta up front.
"""

from __future__ import annotations

import dataclasses
import warnings
from argparse import ArgumentParser
from operator import itemgetter
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

    from ..chem.mol import get_mol_positions, mol_to_sdf, update_mol_positions
    from ..chem.protein import protein_to_pdb_file
    from ..data.featurize import ligand_to_data, protein_to_data
    from ..models.prdiff import ProteinReDiffModel
    from ..utils.esm import ESMEmbedder
    from ..utils.tmalign import run_tmalign
    from .common import (
        SamplingRunner,
        apply_serving_defaults,
        make_inference_mesh,
        parse_ligands,
        proteins_from_fasta_with_mask,
        runner_sampler_kwargs,
        sampler_cfg_overrides,
        update_pos,
        update_seq,
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
    for name, protein, ligand in zip(names, proteins, ligands):
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

    rep_proteins = [p for p in proteins for _ in range(args.num_samples)]
    rep_ligands = [l for l in ligands for _ in range(args.num_samples)]
    rep_names = [n for n in names for _ in range(args.num_samples)]

    ref_protein = None
    sample_proteins, sample_ligands, tmscores = [], [], []
    for k, ((pos, seq_prob), protein, ligand, name) in enumerate(
        zip(results, rep_proteins, rep_ligands, rep_names)
    ):
        sample_protein, sample_ligand = update_pos(protein, ligand, pos)
        sample_protein = update_seq(sample_protein, seq_prob)
        if k % args.num_samples == 0:
            warnings.warn(
                "Using the first sample as a reference. The resulting "
                "structures may be mirror images."
            )
            ref_protein = sample_protein
            sample_proteins, sample_ligands, tmscores = [], [], []
        tmscore, t, R = max(
            run_tmalign(sample_protein, ref_protein),
            run_tmalign(sample_protein, ref_protein, mirror=True),
            key=itemgetter(0),
        )
        sample_proteins.append(
            dataclasses.replace(
                sample_protein, atom_pos=t + sample_protein.atom_pos @ R
            )
        )
        sample_ligands.append(
            update_mol_positions(
                sample_ligand, t + get_mol_positions(sample_ligand) @ R
            )
        )
        tmscores.append(tmscore)
        if (k + 1) % args.num_samples == 0:
            for i, sp in enumerate(sample_proteins):
                protein_to_pdb_file(
                    sp,
                    args.output_dir / f"sample_protein_{name}_model_{i}.pdb",
                )
            for i, sl in enumerate(sample_ligands):
                with open(
                    args.output_dir / f"sample_ligand_{name}_model_{i}.sdf",
                    "w",
                ) as f:
                    f.write(mol_to_sdf(sl))
            with open(
                args.output_dir / f"sample_tmscores_{name}.txt", "w"
            ) as f:
                for tmscore in tmscores:
                    f.write(str(tmscore) + "\n")
    print(f"wrote outputs for {len(names)} inputs to {args.output_dir}")


if __name__ == "__main__":
    main()
