"""Convert a reference PyTorch Lightning checkpoint (e.g. PRD_ver1.ckpt)
into this framework's params-only export.

    python -m protein_redesign_tpu.cli.convert_checkpoint \\
        PRD_ver1.ckpt converted/PRD_ver1 [--use_ema/--no-use_ema]

The export loads with every inference CLI via ``-c converted/PRD_ver1``.
EMA (shadow) weights are used by default — the reference always predicts
under EMA (`model.py:250-251`).
"""

from __future__ import annotations

from argparse import ArgumentParser, BooleanOptionalAction
from pathlib import Path


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("ckpt", type=Path, help="reference .ckpt path")
    parser.add_argument("out", type=Path, help="output export directory")
    parser.add_argument("--use_ema", action=BooleanOptionalAction,
                        default=True)
    args = parser.parse_args(argv)

    from ..utils.checkpoint import save_params_only
    from ..utils.convert import load_reference_checkpoint

    params, ema_params, cfg = load_reference_checkpoint(str(args.ckpt))
    chosen = ema_params if (args.use_ema and ema_params is not None) else params
    which = "EMA" if chosen is ema_params else "raw"
    save_params_only(args.out, chosen, cfg)
    print(
        f"converted {args.ckpt} ({which} weights) -> {args.out} "
        f"[single_dim={cfg.single_dim}, pair_dim={cfg.pair_dim}, "
        f"num_blocks={cfg.num_blocks}]"
    )


if __name__ == "__main__":
    main()
