"""Aux subsystems: checkpointing, ESM embedder, TM-align, logging."""
