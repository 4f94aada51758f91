#!/usr/bin/env python
"""Reference-compatible entry point (`/root/reference/train.py`):
    python train.py --save_dir ... --training_mode ...
Delegates to protein_redesign_tpu.cli.train."""
from protein_redesign_tpu.cli.train import main

if __name__ == "__main__":
    main()
