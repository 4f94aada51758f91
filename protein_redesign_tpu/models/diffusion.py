"""Beta schedules and the derived diffusion-schedule table.

Schedule math mirrors the reference (`/root/reference/ProteinReDiff/
difffusion.py:8-26` and the lazily-derived quantities at `model.py:172-190`)
but is computed eagerly into one immutable pytree of static jnp arrays, so
the whole table is a closure constant under jit / lax.scan.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(
    n_timestep: int, start: float = 0.0001, end: float = 0.02
) -> np.ndarray:
    return np.linspace(start, end, n_timestep, dtype=np.float64)


def cosine_beta_schedule(n_timestep: int) -> np.ndarray:
    steps = n_timestep + 1
    x = np.linspace(0, n_timestep, steps, dtype=np.float64)
    alphas_cumprod = np.cos((x / steps) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def get_betas(n_timestep: int, schedule: str) -> np.ndarray:
    if schedule == "linear":
        return linear_beta_schedule(n_timestep)
    if schedule == "cosine":
        return cosine_beta_schedule(n_timestep)
    raise ValueError(f"Invalid schedule: {schedule}")


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All derived quantities of `model.py:172-190` as f32 arrays [T]."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    one_minus_alphas_cumprod: jnp.ndarray
    sqrt_betas: jnp.ndarray
    sqrt_alphas: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    posterior_variance: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.betas.shape[0])

    @staticmethod
    def create(num_steps: int, schedule: str = "linear") -> "DiffusionSchedule":
        betas = get_betas(num_steps, schedule)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        one_minus = 1.0 - alphas_cumprod
        one_minus_prev = 1.0 - alphas_cumprod_prev
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
        return DiffusionSchedule(
            betas=f32(betas),
            alphas=f32(alphas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            one_minus_alphas_cumprod=f32(one_minus),
            sqrt_betas=f32(np.sqrt(betas)),
            sqrt_alphas=f32(np.sqrt(alphas)),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(one_minus)),
            sqrt_recip_alphas_cumprod=f32(1.0 / np.sqrt(alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / one_minus
            ),
            posterior_mean_coef2=f32(
                one_minus_prev * np.sqrt(alphas) / one_minus
            ),
            posterior_variance=f32(betas * one_minus_prev / one_minus),
        )


import jax.tree_util as jtu

jtu.register_dataclass(
    DiffusionSchedule,
    data_fields=[f.name for f in dataclasses.fields(DiffusionSchedule)],
    meta_fields=[],
)
