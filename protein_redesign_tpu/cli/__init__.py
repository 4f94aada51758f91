"""Command-line entry points (reference `train.py`, `generate.py`,
`scripts/predict_batch_*`, `preprocess_pdbbind.py`)."""
