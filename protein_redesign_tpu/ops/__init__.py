"""Geometry utilities and Pallas TPU kernels for the hot ops."""

from .geometry import (
    angstrom_to_nanometre,
    nanometre_to_angstrom,
    nearest_bin,
    pseudo_beta,
    remove_mean,
)
