"""Single-complex generation CLI (reference `generate.py:94-215`).

    python -m protein_redesign_tpu.cli.generate \\
        -c <ckpt_dir> -o out/ -p <pdb-or-sequence> -l <sdf/mol2/SMILES/*> \\
        -n 8 [--num_steps 1000] [--mask_prob 0.3] [-r ref.pdb]

Outputs (same contract as the reference): sample_protein.pdb (multi-model),
sample_ligand.sdf, sample_tmscores.txt — samples rigidly aligned to the
reference (or first sample) with mirror-trial TM-align.
"""

from __future__ import annotations

import dataclasses
import warnings
from argparse import ArgumentParser
from pathlib import Path



def main(argv=None):
    from .common import add_esm_args, add_sampler_args

    parser = ArgumentParser()
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_workers", type=int, default=2)  # accepted, unused
    parser.add_argument("--num_devices", "--num_gpus", type=int, default=1,
                        dest="num_devices",
                        help="data-parallel sampling over this many chips")
    parser.add_argument("--num_steps", type=int, default=64)
    parser.add_argument("--mask_prob", type=float, default=0.3)
    parser.add_argument("--training_mode", action="store_true")
    add_esm_args(parser)
    parser.add_argument("-c", "--ckpt_path", type=Path, required=True)
    parser.add_argument("-o", "--output_dir", type=Path, required=True)
    parser.add_argument("-p", "--protein", type=str, required=True)
    parser.add_argument("-l", "--ligand", type=str, required=True)
    parser.add_argument("-n", "--num_samples", type=int, required=True)
    parser.add_argument("-r", "--ref_path", type=Path)
    add_sampler_args(parser)
    parser.add_argument("--fast_softmax", action="store_true",
                        help="bf16 attention probabilities (~1.5x sampling "
                             "speed at N=192; minor numeric deviation)")
    parser.add_argument("--save_trajectory", type=int, default=0,
                        metavar="K",
                        help="additionally write sample_trajectory_<i>.pdb "
                             "per sample: K intermediate denoising frames "
                             "as a multi-model PDB (K must divide the "
                             "sampler's step count; ddpm/ddim only). The "
                             "samples themselves are bit-identical — "
                             "frames are host fetches between the same "
                             "compiled dispatches")
    args = parser.parse_args(argv)

    import jax

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from ..chem.mol import get_mol_positions, mols_to_sdf_file, update_mol_positions
    from ..chem.protein import protein_from_pdb_file, proteins_to_pdb_file
    from ..data.featurize import ligand_to_data, protein_to_data
    from ..models.prdiff import ProteinReDiffModel
    from ..utils.esm import ESMEmbedder
    from ..utils.tmalign import run_tmalign
    from .common import (
        SamplingRunner,
        apply_serving_defaults,
        load_protein_arg,
        make_inference_mesh,
        parse_ligand_arg,
        runner_sampler_kwargs,
        sampler_cfg_overrides,
        update_pos,
        update_seq,
    )

    args.output_dir.mkdir(parents=True, exist_ok=True)

    params, cfg = _load_params(args.ckpt_path, num_steps=args.num_steps)
    model = ProteinReDiffModel(apply_serving_defaults(cfg.replace(
        training_mode=False, fast_softmax=args.fast_softmax,
        **sampler_cfg_overrides(args),
    ), args))

    protein = load_protein_arg(args.protein)
    ligand = parse_ligand_arg(args.ligand)

    total_num_atoms = len(protein.aatype) + ligand.num_atoms()
    print(f"Total number of atoms: {total_num_atoms}")
    if total_num_atoms > 384:
        warnings.warn(
            "Too many atoms. May take a long time for sample generation."
        )

    embedder = ESMEmbedder(model_name=args.esm_model,
                           esm_dim=cfg.esm_dim,
                           require=args.require_esm,
                           backend=args.esm_backend)
    data = {
        **ligand_to_data(ligand),
        **protein_to_data(
            protein, residue_esm=embedder.embed_protein(protein)
        ),
    }
    ref_protein = (
        protein_from_pdb_file(args.ref_path) if args.ref_path else None
    )

    runner = SamplingRunner(
        model, params, batch_size=args.batch_size, mask_prob=args.mask_prob,
        mesh=make_inference_mesh(args.num_devices),
        **runner_sampler_kwargs(args),
    )
    key = jax.random.PRNGKey(args.seed)
    results = runner.run(
        [data] * args.num_samples, key, trajectory=args.save_trajectory
    )

    sample_proteins, sample_ligands, tmscores = [], [], []
    from operator import itemgetter

    for sample_idx, result in enumerate(results):
        pos, seq_prob = result[0], result[1]
        if args.save_trajectory:
            # Un-aligned denoising movie (one MODEL per frame): the raw
            # diffusion states share the sampler's zero-CoM frame, so they
            # are directly comparable without the TM-align rigid fit
            # applied to the final samples below.
            frame_proteins = []
            for frame in result[2]:
                fp, _ = update_pos(protein, ligand, frame)
                frame_proteins.append(update_seq(fp, seq_prob))
            proteins_to_pdb_file(
                frame_proteins,
                args.output_dir / f"sample_trajectory_{sample_idx}.pdb",
            )
        sample_protein, sample_ligand = update_pos(protein, ligand, pos)
        sample_protein = update_seq(sample_protein, seq_prob)
        if ref_protein is None:
            warnings.warn(
                "Using the first sample as a reference. The resulting "
                "structures may be mirror images."
            )
            ref_protein = sample_protein
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

    proteins_to_pdb_file(
        sample_proteins, args.output_dir / "sample_protein.pdb"
    )
    mols_to_sdf_file(sample_ligands, args.output_dir / "sample_ligand.sdf")
    with open(args.output_dir / "sample_tmscores.txt", "w") as f:
        for tmscore in tmscores:
            f.write(str(tmscore) + "\n")
    print(f"wrote {len(sample_proteins)} samples to {args.output_dir}")


def _load_params(ckpt_path: Path, **overrides):
    """Accept a full-train checkpoint dir or a params-only export."""
    from ..utils.checkpoint import load_checkpoint, load_params_only

    if (Path(ckpt_path) / "config.json").exists():
        return load_params_only(ckpt_path, **overrides)
    # prefer="best": sample from the lowest-val_loss checkpoint (Lightning's
    # best_model_path semantics), not whatever save happens to be newest.
    state, cfg = load_checkpoint(ckpt_path, prefer="best", **overrides)
    return state.ema_params, cfg  # inference under EMA (`model.py:250-251`)


if __name__ == "__main__":
    main()
