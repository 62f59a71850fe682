"""Closed-form JAX equilibrium profiles.

The reference builds every profile symbolically with sympy and re-lambdifies the
derived coefficients *inside the innermost (omega, k) loop* (hot loop #2 in
SURVEY.md section 3; e.g. `multiprocessor_Inhomogeneous_method.py:95-170`,
`Density_cylinder.py:569-620`). Here profiles are plain JAX functions traced once
under `jit`; any derivative a coefficient needs comes from `jax.grad`, so symbolic
math survives only in the tests (sympy as oracle, `tests/test_profiles.py`).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .config import ProfileConfig, ProfileKind

Profile = Callable[[jnp.ndarray], jnp.ndarray]


def make_profile(cfg: ProfileConfig, f0: float, fe: float) -> Profile:
    """Build f(x) interpolating between internal value f0 (at the axis/centre)
    and external value fe, per the configured family.

    Gaussian (reference `multiprocessor_Inhomogeneous_method.py:102-103`):
        f(x) = fe + (f0 - fe) exp(-(x-x0)^2 / W^2)
    Epstein (commented alternative, `Density_cylinder.py:141-143`):
        f(x) = fe + (f0 - fe) / cosh(x/a)^8
    Power law (rotational flow, `Twisted_photospheric_flow_sausage.py:176-180`):
        f(r) = amplitude * r^power
    """
    kind = cfg.kind
    if kind == ProfileKind.UNIFORM:
        def f(x):
            return f0 + 0.0 * x
        return f
    if kind == ProfileKind.GAUSSIAN:
        w2 = cfg.width ** 2
        x0 = cfg.center
        def f(x):
            return fe + (f0 - fe) * jnp.exp(-((x - x0) ** 2) / w2)
        return f
    if kind == ProfileKind.EPSTEIN:
        a = cfg.width
        def f(x):
            return fe + (f0 - fe) / jnp.cosh(x / a) ** 8
        return f
    if kind == ProfileKind.POWER_LAW:
        amp, p = cfg.amplitude, cfg.power
        def f(x):
            return amp * x ** p
        return f
    raise ValueError(f"unknown profile kind {kind}")


def _scalarize(f: Profile):
    return lambda s: jnp.reshape(f(s), ())


def elementwise_grad(f: Profile) -> Profile:
    """Elementwise df/dx of a scalar->scalar profile, shape-preserving."""
    scalar_grad = jax.grad(_scalarize(f))

    def df(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return scalar_grad(x)
        return jax.vmap(scalar_grad)(x.reshape(-1)).reshape(x.shape)

    return df


def elementwise_grad2(f: Profile) -> Profile:
    """Elementwise d2f/dx2."""
    return elementwise_grad(elementwise_grad(f))
