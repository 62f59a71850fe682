"""Magnetic-twist (B_phi != 0) branch of the Hain-Lust coefficient chain,
validated against a sympy re-derivation of the reference's exact symbolic
definitions (`Cylinder/Rotational flow/Photospheric/Solvers/
Twisted_photospheric_flow_sausage.py:167-173` equilibrium with the kept
`B_twist*r` azimuthal-field branch, `:482-535` coefficient chain). The
reference lambdifies these sympy expressions per (omega, k); here they serve
only as the test oracle for the closed-form JAX chain in
`eigensolver_tpu.physics.cylinder.CylinderPhysics.coefficients` (including
the jax.grad-derived C3/g terms).
"""
import numpy as np
import jax.numpy as jnp
import pytest
import sympy as sym

from eigensolver_tpu import cases
from eigensolver_tpu.physics.cylinder import CylinderPhysics

B_TWIST = 0.1
V_TWIST = 0.15
POWER = 1.25


def _sympy_chain(rg, omega, k, m):
    """The reference's symbolic coefficient chain, verbatim algebra."""
    r = sym.symbols("r", positive=True)
    gamma = sym.Rational(5, 3)
    rho = sym.Float(rg.rho_i0)
    B_0 = rg.vA_i0 * sym.sqrt(rho)
    P_0 = rg.c_i0 ** 2 * rho / gamma

    B_iphi = B_TWIST * r
    B_i = B_0 * sym.sqrt(1 - 2 * B_iphi ** 2 / B_0 ** 2)
    v_iphi = V_TWIST * r ** POWER
    P_i = rho * V_TWIST ** 2 * r ** (2 * POWER) / (2 * POWER) + P_0
    c_i = sym.sqrt(P_i * gamma / rho)
    # reference vA_i sums the components (`:210-211`)
    vA_i = (B_i + B_iphi) / sym.sqrt(rho)

    shift = omega - m * v_iphi / r - k * 0
    # reference alfven_freq divides only the k*B_i term by sqrt(rho) (`:485-486`)
    alfven = m * B_iphi / r + k * B_i / sym.sqrt(rho)
    cusp = alfven * c_i / sym.sqrt(c_i ** 2 + vA_i ** 2)
    D = rho * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - alfven ** 2) * (
        shift ** 2 - cusp ** 2)
    fb = m * B_iphi / r + k * B_i
    Q = (-(shift ** 2 - alfven ** 2) * rho * v_iphi ** 2 / r
         + 2 * shift ** 2 * B_iphi ** 2 / r
         + 2 * shift * B_iphi * v_iphi * fb / r)
    T = fb * B_iphi + rho * v_iphi * shift
    C1 = (Q * shift ** 2
          - 2 * m * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - cusp ** 2) * T / r ** 2)
    C2 = (shift ** 4
          - (c_i ** 2 + vA_i ** 2) * (m ** 2 / r ** 2 + k ** 2) * (shift ** 2 - cusp ** 2))
    C3_diff = (B_iphi / r) ** 2 - rho * (v_iphi / r) ** 2
    C3 = (D * (rho * (shift ** 2 - alfven ** 2) + r * sym.diff(C3_diff, r))
          + (Q ** 2 - 4 * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - cusp ** 2) * T ** 2 / r ** 2))
    F = r * D / C3
    # g = -d/dr(r C1/C3) - r (C2 - C1^2/C3)/D (`Density_cylinder.py:617-619`)
    g = -sym.diff(r * C1 / C3, r) - r * (C2 - C1 ** 2 / C3) / D
    mods = ["numpy"]
    return {name: sym.lambdify(r, expr, mods) for name, expr in
            [("D", D), ("C1", C1), ("C3", C3), ("F", F), ("g", g),
             ("invF", C3 / (r * D))]}


@pytest.mark.parametrize("m", [0, 1])
def test_btwist_coefficient_chain_matches_sympy(m):
    case = cases.cylinder_twisted_magnetic(
        B_twist=B_TWIST, v_twist=V_TWIST, power=POWER, mode=m)
    ph = CylinderPhysics.from_case(case)
    omega, k = 1.3, 0.9
    oracle = _sympy_chain(case.regime, omega, k, m)
    Dfun, C1fun, C3fun, Ffun, gfun, invFfun = ph.coefficients(
        jnp.float64(omega), jnp.float64(k), m, twisted_c1=True)
    ours = {"D": Dfun, "C1": C1fun, "C3": C3fun, "F": Ffun, "g": gfun,
            "invF": invFfun}
    for rv in (0.3, 0.7, 0.95):
        for name in ours:
            want = float(oracle[name](rv))
            got = float(ours[name](jnp.float64(rv)))
            np.testing.assert_allclose(
                got, want, rtol=1e-9,
                err_msg=f"{name}(r={rv}) m={m} mismatch vs sympy oracle")


def test_btwist_equilibrium_force_balance():
    """d/dr(P + (B_z^2+B_phi^2)/2) + B_phi^2/r - rho v_phi^2/r == 0 for the
    linear-B_phi equilibrium (the reference's PT_i check, `:196-198`)."""
    from eigensolver_tpu.equilibrium import make_equilibrium
    from eigensolver_tpu.profiles import elementwise_grad

    case = cases.cylinder_twisted_magnetic(
        B_twist=B_TWIST, v_twist=V_TWIST, power=POWER)
    eq = make_equilibrium(case)

    def total_p(r):
        return eq.P_i(r) + (eq.B_i(r) ** 2 + eq.B_phi(r) ** 2) / 2.0

    dtp = elementwise_grad(total_p)
    r = jnp.linspace(0.05, 1.0, 64)
    resid = (np.asarray(dtp(r)) + np.asarray(eq.B_phi(r)) ** 2 / np.asarray(r)
             - np.asarray(eq.rho_i(r)) * np.asarray(eq.v_phi(r)) ** 2 / np.asarray(r))
    np.testing.assert_allclose(resid, 0.0, atol=1e-12)


@pytest.mark.slow
def test_btwist_reduces_to_flow_twist_at_zero_field():
    """B_twist -> 0 must reproduce the pure rotational-flow determinant."""
    import jax

    base = cases.cylinder_twisted_photospheric(v_twist=0.1, power=1.0, mode=1)
    withb = cases.cylinder_twisted_magnetic(
        B_twist=0.0, v_twist=0.1, power=1.0, mode=1)
    from eigensolver_tpu.sweep import make_dispersion
    d0 = jax.jit(jax.vmap(make_dispersion(base, 1)))
    d1 = jax.jit(jax.vmap(make_dispersion(withb, 1)))
    om = jnp.linspace(1.05, 1.25, 32)
    kk = jnp.full((32,), 1.2)
    r0 = d0(om, kk)
    r1 = d1(om, kk)
    np.testing.assert_allclose(np.asarray(r1.det), np.asarray(r0.det),
                               rtol=1e-9)


@pytest.mark.slow
def test_btwist_dispersion_finds_roots():
    """The B_phi != 0 engine produces finite determinants with sign changes
    in the photospheric surface-mode window (smoke: the branch is live)."""
    import jax

    case = cases.cylinder_twisted_magnetic(B_twist=0.1, v_twist=0.1, mode=1)
    import dataclasses
    case = dataclasses.replace(
        case, grid=dataclasses.replace(case.grid, n_interior=512))
    from eigensolver_tpu.sweep import make_dispersion
    disp = jax.jit(jax.vmap(make_dispersion(case, 1)))
    k = 1.2
    om = jnp.linspace(0.9 * k, 1.4 * k, 256)
    res = disp(om, jnp.full((256,), k))
    det = np.asarray(res.det)
    assert np.isfinite(det).mean() > 0.9
    s = np.signbit(det)
    assert (s[:-1] != s[1:]).any(), "no sign change in the search window"
