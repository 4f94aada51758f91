#!/usr/bin/env python
"""Reference-compatible entry point (`/root/reference/generate.py`):
    python generate.py -c ckpt -o out -p <pdb|seq> -l <ligand> -n 8
Delegates to protein_redesign_tpu.cli.generate."""
from protein_redesign_tpu.cli.generate import main

if __name__ == "__main__":
    main()
