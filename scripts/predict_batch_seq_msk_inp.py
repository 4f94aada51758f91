#!/usr/bin/env python
"""Reference-compatible entry point
(`/root/reference/scripts/predict_batch_seq_msk_inp.py`).
Delegates to protein_redesign_tpu.cli.predict_batch_sequence."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from protein_redesign_tpu.cli.predict_batch_sequence import main

if __name__ == "__main__":
    main()
