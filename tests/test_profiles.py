"""Profile + equilibrium correctness against the sympy oracle.

The reference derives all coefficients symbolically (sympy diff + lambdify,
`multiprocessor_Inhomogeneous_method.py:95-170`); we keep sympy only here, as
ground truth for the closed-form JAX profiles and their autodiff derivatives.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import sympy as sym

from eigensolver_tpu.config import ProfileConfig, ProfileKind, Regime, CaseConfig, Geometry
from eigensolver_tpu.equilibrium import make_equilibrium
from eigensolver_tpu.profiles import elementwise_grad, elementwise_grad2, make_profile


def test_gaussian_profile_and_derivatives_vs_sympy():
    f0, fe, W = 1.0, 1.8028485757121435, 0.9
    cfg = ProfileConfig(kind=ProfileKind.GAUSSIAN, width=W)
    f = make_profile(cfg, f0, fe)
    df = elementwise_grad(f)
    ddf = elementwise_grad2(f)

    x = sym.symbols("x")
    expr = fe + (f0 - fe) * sym.exp(-(x**2) / W**2)
    f_np = sym.lambdify(x, expr, "numpy")
    df_np = sym.lambdify(x, sym.diff(expr, x), "numpy")
    ddf_np = sym.lambdify(x, sym.diff(expr, x, 2), "numpy")

    xs = np.linspace(-1.0, 1.0, 101)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(xs))), f_np(xs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(df(jnp.asarray(xs))), df_np(xs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ddf(jnp.asarray(xs))), ddf_np(xs), rtol=1e-11)


def test_pressure_balanced_equilibrium_vs_sympy():
    """c_i(x) per `multiprocessor_Inhomogeneous_method.py:152-154`."""
    rg = Regime(c_i0=1.0, vA_i0=1.9, c_e=1.3, vA_e=0.8)
    case = CaseConfig(
        name="t", geometry=Geometry.SLAB, regime=rg,
        density_profile=ProfileConfig(kind=ProfileKind.GAUSSIAN, width=0.9),
    )
    eq = make_equilibrium(case)

    x = sym.symbols("x")
    g = rg.gamma
    rho_e = rg.rho_e
    prof = rho_e + (rg.rho_i0 - rho_e) * sym.exp(-(x**2) / 0.9**2)
    vA = rg.vA_i0 * sym.sqrt(rg.rho_i0) / sym.sqrt(prof)
    c = sym.sqrt(rho_e * (rg.c_e**2 + 0.5 * g * rg.vA_e**2) / prof - 0.5 * g * vA**2)
    cT = sym.sqrt(c**2 * vA**2 / (c**2 + vA**2))

    xs = np.linspace(-1.0, 1.0, 33)
    for fn, expr in [(eq.rho_i, prof), (eq.vA_i, vA), (eq.c_i, c), (eq.cT_i, cT)]:
        want = sym.lambdify(x, expr, "numpy")(xs)
        got = np.asarray(fn(jnp.asarray(xs)))
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_regime_derived_constants():
    rg = Regime(c_i0=1.0, vA_i0=1.9, c_e=1.3, vA_e=0.8)
    assert rg.rho_e == pytest.approx(1.8028485757121435)  # reference printout
    assert rg.cT_i0 == pytest.approx(np.sqrt(1.9**2 / (1 + 1.9**2)))


def test_twisted_force_balance_vs_sympy():
    """P_i(r) for v_phi = v r^p (`Twisted_photospheric_flow_sausage.py:183-185`)."""
    rg = Regime(c_i0=1.0, vA_i0=2.0, c_e=1.5, vA_e=0.5)
    v_twist, p = 0.1, 1.25
    case = CaseConfig(
        name="t", geometry=Geometry.CYLINDER, regime=rg,
        density_profile=ProfileConfig(kind=ProfileKind.UNIFORM),
        twist_profile=ProfileConfig(kind=ProfileKind.POWER_LAW,
                                    amplitude=v_twist, power=p),
    )
    eq = make_equilibrium(case)
    r = sym.symbols("r")
    P = rg.rho_i0 * v_twist**2 * r ** (2 * p) / (2 * p) + rg.P_0
    c = sym.sqrt(P * rg.gamma / rg.rho_i0)
    rs = np.linspace(0.05, 1.0, 21)
    np.testing.assert_allclose(
        np.asarray(eq.P_i(jnp.asarray(rs))), sym.lambdify(r, P, "numpy")(rs), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(eq.c_i(jnp.asarray(rs))), sym.lambdify(r, c, "numpy")(rs), rtol=1e-12)
    # radial force balance: dP/dr = rho v_phi^2 / r (B_phi = 0)
    dP = elementwise_grad(eq.P_i)
    lhs = np.asarray(dP(jnp.asarray(rs)))
    rhs = rg.rho_i0 * (v_twist * rs**p) ** 2 / rs
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
