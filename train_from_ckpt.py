#!/usr/bin/env python
"""Reference-compatible resume entry point (`/root/reference/train_from_ckpt.py`):
    python train_from_ckpt.py --trained_ckpt <dir> ...
Delegates to protein_redesign_tpu.cli.train (which handles --trained_ckpt)."""
import sys

from protein_redesign_tpu.cli.train import main

if __name__ == "__main__":
    if "--trained_ckpt" not in sys.argv:
        sys.exit("train_from_ckpt.py requires --trained_ckpt <checkpoint dir>")
    main()
