#!/usr/bin/env python
"""Reference-compatible entry point (`/root/reference/preprocess_pdbbind.py`).
Delegates to protein_redesign_tpu.cli.preprocess_pdbbind."""
from protein_redesign_tpu.cli.preprocess_pdbbind import main

if __name__ == "__main__":
    main()
