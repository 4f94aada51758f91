"""Export a training checkpoint into a params-only serving artifact.

    python -m protein_redesign_tpu.cli.export_params \\
        runs/exp/checkpoints exported/model [--step N] [--raw_weights]

A full training checkpoint carries optimizer state + raw AND EMA params
(~4x the servable weights); the export keeps only the inference weights +
config, loads with every inference CLI via ``-c exported/model``, and is
the artifact to copy between hosts. By default the best-val_loss step's
EMA weights are exported — the reference always predicts under EMA
(`/root/reference/ProteinReDiff/model.py:250-251`).
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("ckpt", type=Path, help="training checkpoints dir")
    parser.add_argument("out", type=Path, help="output export directory")
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step (default: best val_loss, "
                             "falling back to latest)")
    parser.add_argument("--raw_weights", action="store_true",
                        help="export raw params instead of EMA")
    args = parser.parse_args(argv)

    from ..utils.checkpoint import load_checkpoint, save_params_only

    state, cfg = load_checkpoint(args.ckpt, step=args.step, prefer="best")
    params = state.params if args.raw_weights else state.ema_params
    save_params_only(args.out, params, cfg)
    print(
        f"exported step {int(state.step)} "
        f"({'raw' if args.raw_weights else 'EMA'} weights) -> {args.out} "
        f"[single_dim={cfg.single_dim}, pair_dim={cfg.pair_dim}, "
        f"num_blocks={cfg.num_blocks}, num_steps={cfg.num_steps}]"
    )


if __name__ == "__main__":
    main()
