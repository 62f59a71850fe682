#!/usr/bin/env python
"""Independent high-accuracy re-judgement of reproduce.py misses.

For every reference-pickle root our sweep failed to match, re-run the
REFERENCE'S OWN numerical scheme - endpoint-parity shooting with the
exterior integrated from tiny initial conditions - but with tight
integrator tolerances (`solve_ivp` rtol=RTOL below, vs the reference's
`odeint` LSODA defaults on a 500-point output grid), locate the residual
dip near the shipped value, and classify the miss:

  ref_error       the high-accuracy root agrees with OUR root (within the
                  match tolerance) but not with the shipped value: the
                  pickle entry carries the reference's own discretization
                  error, not a physics miss on our side.
  genuine         the high-accuracy root confirms the shipped value: a real
                  miss of ours.
  irreproducible  the reference's own scheme, run accurately, produces no
                  residual dip below `accept_pct` anywhere near the shipped
                  value (cf. the REPRODUCTION.md "irreproducible entries").
  both_off        a dip exists but matches neither the pickle nor us.

This is a pure numpy/scipy replication of the reference pipelines - no
JAX, no code from this framework - so it is an independent arbiter between
our solver and the shipped pickles. Reference pipelines replicated:
  slab density:  `Slab/Non uniform density/Photospheric/Solvers/
                 multiprocessor_Inhomogeneous_method.py:319-414`
  slab flow:     `Slab/Non uniform flow/Solver/flow_multiprocessor_coronal.py:
                 300-395` (legacy shear form D(x) `:317-318`)
  cylinder:      `Cylinder/Non-uniform density/Coronal/solvers/
                 Density_cylinder.py:546-688` Hain-Luest chain (with the
                 axial-flow Doppler shift of `Cylinder_method_flow_testing
                 .py:577-578` when U != 0)

Usage:
  python tools/reproduce.py slab_flow_1 --json /tmp/repro.json
  python tools/ref_recheck.py /tmp/repro.json --out /tmp/recheck.json
"""
import argparse
import json
import sys
import warnings
from multiprocessing import Pool

import numpy as np
from scipy.integrate import solve_ivp
from scipy.optimize import brentq

warnings.filterwarnings("ignore")

GAMMA = 5.0 / 3.0
# RTOL is ~15x tighter than the odeint LSODA defaults the pickles were
# generated with (1.49e-8); recorded verbatim into each detail row as
# `rtol_note` so downstream evidence strings (tools/adjudicate.py) cannot
# misstate the arbiter's accuracy. atol must stay FINITE: with atol ~ 0 LSODA's
# relative-only control collapses the step at every solution zero crossing
# (measured: one slab residual at atol=1e-300 exceeds 280 s; at 1e-14 it is
# ~0.6 s). States are O(1e-8)..O(1), so 1e-14 keeps absolute error far below
# the 1e-3 match tolerance being adjudicated.
RTOL = 1e-9
ATOL = 1e-13


class _Budget(Exception):
    pass


_MAX_NFEV = 20_000     # ~10-20x the nfev of a healthy integration


def _ivp(rhs, span, y0):
    """solve_ivp with a stall guard: near interior poles (shear/continuum
    resonances, F -> 0 mode-conversion points) LSODA's step collapses and a
    single integration can take minutes even with a min_step floor (the
    floor forces progress at 1e-10 per step - 1e7+ steps to cross a 1e-3
    pole region). A hard nfev budget turns those pathological points into
    residual = NaN instead; the reference's own odeint suffered the same
    stiffness and simply emitted LSODA chatter (`stdout_redirected`,
    `multiprocessor_Inhomogeneous_method.py:35-59`)."""
    nfev = [0]

    def guarded(t, y):
        nfev[0] += 1
        if nfev[0] > _MAX_NFEV:
            raise _Budget
        return rhs(t, y)

    try:
        s = solve_ivp(guarded, span, y0, method="LSODA", rtol=RTOL, atol=ATOL,
                      min_step=1e-10)
    except _Budget:
        return None
    if not s.success or not np.all(np.isfinite(s.y[:, -1])):
        return None
    return s


# --------------------------------------------------------------------------
# case parameter table (mirrors tools/reproduce.py TARGETS; constants cited
# from the generating reference files)
# --------------------------------------------------------------------------

CASES = {
    # slab, Gaussian density (multiprocessor_Inhomogeneous_method.py:70-103)
    "slab_ph_09": dict(engine="slab_density", c_i0=1.0, vA_i0=1.9, c_e=1.3,
                       vA_e=0.8, width=0.9, wavelengths=7.0),
    "slab_ph_1e5": dict(engine="slab_density", c_i0=1.0, vA_i0=1.9, c_e=1.3,
                        vA_e=0.8, width=1e5, wavelengths=7.0),
    # coronal variant (multiprocessor_Inhomogeneous_method_coronal.py)
    "slab_co_09": dict(engine="slab_density", c_i0=1.0, vA_i0=1.2, c_e=0.4,
                       vA_e=3.0, width=0.9, wavelengths=3.0),
    # slab, uniform density + Gaussian flow (flow_multiprocessor_coronal.py:60-126)
    "slab_flow_1": dict(engine="slab_flow", c_i0=0.3, vA_i0=1.0, c_e=0.2,
                        vA_e=2.5, U_i0=0.35, width=1.0, wavelengths=3.0),
    # cylinder, Gaussian density (Density_cylinder.py:68-80,124-221)
    "cyl_co_09": dict(engine="cylinder", c_i0=1.0, vA_i0=2.0, c_e=0.5,
                      vA_e=5.0, width=0.9, U_i0=0.0, wavelengths=3.0),
    "cyl_ph_09": dict(engine="cylinder", c_i0=1.0, vA_i0=2.0, c_e=1.5,
                      vA_e=0.5, width=0.9, U_i0=0.0, wavelengths=3.0),
    # cylinder, uniform density + Gaussian axial flow
    # (Cylinder_method_flow_testing.py:134-135; U identified in reproduce.py)
    "cyl_flow_1": dict(engine="cylinder", c_i0=1.0, vA_i0=2.0, c_e=0.5,
                       vA_e=5.0, width=None, U_i0=0.05, flow_width=1.0,
                       wavelengths=3.0),
}


def _case_params(name):
    """CASES entry for ANY reproduce.py target, derived from its case
    config. Only the equilibrium CONSTANTS come from the framework (they
    are the same numbers as the generating reference files, already
    oracle-tested); all numerics here stay pure scipy, so the arbiter
    remains independent of the JAX solver."""
    if name in CASES:
        return CASES[name]
    sys.path.insert(0, ".")
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reproduce import TARGETS
    from eigensolver_tpu import cases as case_mod
    spec = TARGETS.get(name)
    if spec is None:
        return None
    fac, kw = spec["case"]
    case = getattr(case_mod, fac)(**kw)
    rg = case.regime
    base = dict(c_i0=rg.c_i0, vA_i0=rg.vA_i0, c_e=rg.c_e, vA_e=rg.vA_e,
                wavelengths=spec.get("grid", {}).get(
                    "exterior_wavelengths", 3.0))
    if fac.startswith("slab_density"):
        return dict(engine="slab_density", width=kw["width"], **base)
    if fac.startswith("slab_flow"):
        return dict(engine="slab_flow", width=kw["width"],
                    U_i0=kw.get("U_i0", 0.35), **base)
    if fac.startswith("cylinder_density"):
        return dict(engine="cylinder", width=kw["width"], U_i0=0.0, **base)
    if fac.startswith("cylinder_flow"):
        return dict(engine="cylinder", width=None, U_i0=kw.get("U", 0.05),
                    flow_width=kw.get("width", 1.0), **base)
    if fac == "cylinder_twisted_photospheric":
        return dict(engine="twisted", v_twist=kw["v_twist"],
                    power=kw["power"], m=kw["mode"], eps=0.01, **base)
    return None


def _derived(p):
    c_i0, vA_i0, c_e, vA_e = p["c_i0"], p["vA_i0"], p["c_e"], p["vA_e"]
    rho_i0 = 1.0
    rho_e = rho_i0 * (c_i0**2 + GAMMA / 2 * vA_i0**2) / (c_e**2 + GAMMA / 2 * vA_e**2)
    cT_e = np.sqrt(c_e**2 * vA_e**2 / (c_e**2 + vA_e**2))
    return rho_i0, rho_e, cT_e


# --------------------------------------------------------------------------
# slab engines (endpoint-parity full-domain scheme)
# --------------------------------------------------------------------------

def slab_residual(p, om, k, parity, signed=False):
    """% total-pressure mismatch of the reference slab scheme at (om, k).
    signed=True keeps the sign of (exterior - interior) - the quantity whose
    sign change the reference bisects on (`multiprocessor_Inhomogeneous_
    method.py:510-522`); zeros of the signed form are the scheme's roots."""
    c_i0, vA_i0, c_e, vA_e = p["c_i0"], p["vA_i0"], p["c_e"], p["vA_e"]
    rho_i0, rho_e, cT_e = _derived(p)
    W = p["width"]
    flow = p["engine"] == "slab_flow"
    U_i0 = p.get("U_i0", 0.0)

    if flow:
        def U(x): return U_i0 * np.exp(-x**2 / W**2)
        def dU(x): return U(x) * (-2.0 * x / W**2)
        def ddU(x): return U_i0 * np.exp(-x**2 / W**2) * (4 * x**2 / W**4 - 2.0 / W**2)
        def rho(x): return rho_i0 + 0.0 * x
        def vA(x): return vA_i0 + 0.0 * x
        def cs(x): return c_i0 + 0.0 * x
    else:
        def U(x): return 0.0
        def rho(x): return rho_e + (rho_i0 - rho_e) * np.exp(-x**2 / W**2)
        def vA(x): return vA_i0 * np.sqrt(rho_i0 / rho(x))
        def cs(x): return np.sqrt(rho_e * (c_e**2 + GAMMA / 2 * vA_e**2) / rho(x)
                                  - GAMMA / 2 * vA(x)**2)

    m_e = ((k**2 * vA_e**2 - om**2) * (k**2 * c_e**2 - om**2)
           / ((vA_e**2 + c_e**2) * (k**2 * cT_e**2 - om**2)))
    if m_e < 0:
        return np.nan
    p_e = (rho_e * (vA_e**2 + c_e**2) * (k**2 * cT_e**2 - om**2)
           / (om * (k**2 * c_e**2 - om**2)))

    L = p["wavelengths"] * 2.0 * np.pi / k
    se = _ivp(lambda x, V: [V[1], m_e * V[0]], (-L, -1.0),
              [1e-8, 1e-8 if not flow else 1e-15])
    if se is None:
        return np.nan
    vxe, dvxe = se.y[0, -1], se.y[1, -1]
    leftP = p_e * dvxe
    lb = vxe * ((om - k * U(-1.0)) / om if flow else 1.0)

    if flow:
        def rhs(x, V):
            w = om - k * U(x)
            c2, a2 = c_i0**2, vA_i0**2
            cT2 = c2 * a2 / (c2 + a2)
            m0 = ((k**2 * c2 - w**2) * (k**2 * a2 - w**2)
                  / ((c2 + a2) * (k**2 * cT2 - w**2)))
            # legacy shear form (`flow_multiprocessor_coronal.py:317-318`)
            Dx = (2.0 * k * dU(x) * ((w**2 - k**2 * cT2)
                  + (k**4 * cT2 * c2) / ((c2 + a2) * (w**2 - k**2 * cT2)))
                  / (w * (w**2 - k**2 * c2)))
            coeff = (k * ddU(x) / w) + (k * dU(x) * Dx / w) - m0
            return [V[1], -Dx * V[1] - coeff * V[0]]
    else:
        h = 1e-7

        def F(x):
            c2, a2 = cs(x)**2, vA(x)**2
            cT2 = c2 * a2 / (c2 + a2)
            return rho(x) * (c2 + a2) * (k**2 * cT2 - om**2) / (k**2 * c2 - om**2)

        def rhs(x, V):
            c2, a2 = cs(x)**2, vA(x)**2
            cT2 = c2 * a2 / (c2 + a2)
            m0 = ((k**2 * c2 - om**2) * (k**2 * a2 - om**2)
                  / ((c2 + a2) * (k**2 * cT2 - om**2)))
            dlogF = (F(x + h) - F(x - h)) / (2 * h * F(x))
            return [V[1], -dlogF * V[1] + m0 * V[0]]

    sign = 1.0 if parity == "sausage" else -1.0

    def endcond(dv):
        s = _ivp(rhs, (-1.0, 1.0), [lb, float(dv)])
        return np.nan if s is None else s.y[0, -1] + sign * lb

    dv = _solve_scalar(endcond, lb, k)
    if dv is None:
        return np.nan
    s = _ivp(rhs, (-1.0, 1.0), [lb, dv])
    if s is None:
        return np.nan
    w1 = om - k * U(-1.0)
    c2, a2 = cs(-1.0)**2, vA(-1.0)**2
    cT2 = c2 * a2 / (c2 + a2)
    PTi = (rho(-1.0) * (a2 + c2) * (k**2 * cT2 - w1**2)
           / (w1 * (k**2 * c2 - w1**2)))
    insideP = PTi * s.y[1, 0]
    d = (leftP - insideP) * 100 / max(abs(leftP), abs(insideP))
    return d if signed else abs(d)


# --------------------------------------------------------------------------
# cylinder engine (Hain-Luest P-formulation on the negative-r trick grid)
# --------------------------------------------------------------------------

def cylinder_residual(p, om, k, parity, m=None, signed=False):
    c_i0, vA_i0, c_e, vA_e = p["c_i0"], p["vA_i0"], p["c_e"], p["vA_e"]
    rho_i0, rho_e, cT_e = _derived(p)
    m = m if m is not None else (0 if parity == "sausage" else 1)
    U_i0 = p.get("U_i0", 0.0)
    B_0 = vA_i0 * np.sqrt(rho_i0)

    if p.get("width") is not None:        # Gaussian density, no flow
        W = p["width"]
        def rho(r): return rho_e + (rho_i0 - rho_e) * np.exp(-r**2 / W**2)
        def vz(r): return 0.0
    else:                                  # uniform density, Gaussian v_z
        FW = p["flow_width"]
        def rho(r): return rho_i0 + 0.0 * r
        def vz(r): return U_i0 * np.exp(-r**2 / FW**2)

    def vA(r): return B_0 / np.sqrt(rho(r))
    def cs2(r):
        return rho_e * (c_e**2 + GAMMA / 2 * vA_e**2) / rho(r) - GAMMA / 2 * vA(r)**2

    def shift(r): return om - k * vz(r)
    def alf2(r): return k**2 * B_0**2 / rho(r)          # alfven_freq^2
    def cusp2(r):
        c2 = cs2(r)
        return alf2(r) * c2 / (c2 + vA(r)**2)

    def Dfun(r):
        c2 = cs2(r)
        return (rho(r) * (c2 + vA(r)**2) * (shift(r)**2 - alf2(r))
                * (shift(r)**2 - cusp2(r)))

    def C2f(r):
        c2 = cs2(r)
        return (shift(r)**4 - (c2 + vA(r)**2) * (m**2 / r**2 + k**2)
                * (shift(r)**2 - cusp2(r)))

    def C3f(r):
        # Q = T = C3_diff = 0 for v_iphi = B_iphi = 0
        return Dfun(r) * rho(r) * (shift(r)**2 - alf2(r))

    def Ffun(r):
        return r * Dfun(r) / C3f(r)        # = r / (rho (shift^2 - alf^2))

    h = 1e-7

    def rhs_i(r, P):
        F = Ffun(r)
        dF = (Ffun(r + h) - Ffun(r - h)) / (2 * h)
        g = -r * C2f(r) / Dfun(r)          # C1 = 0
        return [P[1], (-dF / F) * P[1] + (g / F) * P[0]]

    m_e = ((k**2 * vA_e**2 - om**2) * (k**2 * c_e**2 - om**2)
           / ((vA_e**2 + c_e**2) * (k**2 * cT_e**2 - om**2)))
    if m_e < 0:
        return np.nan
    xi_e_const = -1.0 / (rho_e * (k**2 * vA_e**2 - om**2))

    L = p["wavelengths"] * 2.0 * np.pi / k
    # parity-dependent m^2/r^2: the reference's sausage block integrates
    # with 0/r^2 (`Cylinder_method_flow_testing.py:935`), the kink block
    # with 1/r^2 (`:638`). Hardcoding 1 here shifted every rechecked
    # SAUSAGE dip by ~0.5% (measured at cyl_flow_06 k=2.49: dip 8.1525
    # with the wrong term vs 8.1925 with m^2 - exactly our f64 zero
    # 8.19280), misclassifying our correct roots as both_off.
    se = _ivp(lambda r, P: [P[1], -P[1] / r + (m_e + (m * m) / r**2) * P[0]],
              (-L, -1.0), [1e-8, 1e-8])
    if se is None:
        return np.nan
    left_P = se.y[0, -1]
    left_xi = xi_e_const * se.y[1, -1]

    r_axis = -0.001

    def endcond(dP):
        s = _ivp(rhs_i, (-1.0, r_axis), [left_P, float(dP)])
        if s is None:
            return np.nan
        if parity == "kink":
            return s.y[0, -1]              # P(0) = 0
        return s.y[1, -1]                  # P'(0) = 0 (sausage, `:1083-1085`)

    dP = _solve_scalar(endcond, left_P, k)
    if dP is None:
        return np.nan
    s = _ivp(rhs_i, (-1.0, r_axis), [left_P, dP])
    if s is None:
        return np.nan
    r1 = -1.0
    inside_xi = s.y[1, 0] / (rho(r1) * (shift(r1)**2 - alf2(r1)))  # (C1 P + D P')/C3
    d = (left_xi - inside_xi) * 100 / max(abs(left_xi), abs(inside_xi))
    return d if signed else abs(d)


# --------------------------------------------------------------------------
# twisted (rotational-flow) engine: sympy-lambdified Hain-Luest chain +
# LSODA flux-form shooting. The reference twisted solvers build exactly
# these coefficients symbolically and integrate with complex odeintz
# (`Twisted_photospheric_flow_sausage.py:482-577`); here the chain is
# lambdified once per (v_twist, power, m) and integrated with tight-tol
# LSODA, with the exterior from tiny ICs as in the reference (`:545-555` -
# including its m_e < 0 skip, so leaky-region pickle entries come back NaN
# -> irreproducible: the documented scheme cannot produce them).
# --------------------------------------------------------------------------

_TWIST_CHAINS = {}


def _twisted_chain(p):
    key = (p["v_twist"], p["power"], p["m"], p["c_i0"], p["vA_i0"])
    ch = _TWIST_CHAINS.get(key)
    if ch is not None:
        return ch
    import sympy as sym
    r, om_s, k_s = sym.symbols("r omega k", positive=True)
    gamma = sym.Rational(5, 3)
    rho = sym.Float(1.0)
    B_0 = p["vA_i0"] * sym.sqrt(rho)
    P_0 = p["c_i0"] ** 2 * rho / gamma
    v_iphi = p["v_twist"] * r ** p["power"]
    P_i = rho * p["v_twist"] ** 2 * r ** (2 * p["power"]) / (2 * p["power"]) + P_0
    c_i = sym.sqrt(P_i * gamma / rho)
    vA_i = B_0 / sym.sqrt(rho)
    m = p["m"]
    shift = om_s - m * v_iphi / r
    alfven = k_s * B_0 / sym.sqrt(rho)
    cusp = alfven * c_i / sym.sqrt(c_i ** 2 + vA_i ** 2)
    D = rho * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - alfven ** 2) * (
        shift ** 2 - cusp ** 2)
    fb = k_s * B_0
    Q = (-(shift ** 2 - alfven ** 2) * rho * v_iphi ** 2 / r)
    T = rho * v_iphi * shift
    C1 = (Q * shift ** 2
          - 2 * m * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - cusp ** 2) * T / r ** 2)
    C2 = (shift ** 4 - (c_i ** 2 + vA_i ** 2) * (m ** 2 / r ** 2 + k_s ** 2)
          * (shift ** 2 - cusp ** 2))
    C3_diff = -rho * (v_iphi / r) ** 2
    C3 = (D * (rho * (shift ** 2 - alfven ** 2) + r * sym.diff(C3_diff, r))
          + (Q ** 2 - 4 * (c_i ** 2 + vA_i ** 2) * (shift ** 2 - cusp ** 2)
             * T ** 2 / r ** 2))
    F = r * D / C3
    g = -sym.diff(r * C1 / C3, r) - r * (C2 - C1 ** 2 / C3) / D
    ch = {n: sym.lambdify((r, om_s, k_s), e, "numpy") for n, e in
          [("C1", C1), ("C3", C3), ("F", F), ("g", g),
           ("invF", C3 / (r * D))]}
    _TWIST_CHAINS[key] = ch
    return ch


def twisted_residual(p, om, k, parity, signed=False):
    """% xi_r mismatch of the twisted scheme at (om, k); NaN where the
    reference's own m_e < 0 guard skips the omega."""
    rho_i0, rho_e, cT_e = _derived(p)
    c_e, vA_e = p["c_e"], p["vA_e"]
    m = p["m"]
    m_e = ((k**2 * vA_e**2 - om**2) * (k**2 * c_e**2 - om**2)
           / ((vA_e**2 + c_e**2) * (k**2 * cT_e**2 - om**2)))
    if m_e < 0:
        return np.nan
    ch = _twisted_chain(p)
    L = p["wavelengths"] * 2.0 * np.pi / k
    se = _ivp(lambda r, P: [P[1], -P[1] / r + (m_e + m**2 / r**2) * P[0]],
              (L, 1.0), [1e-8, 1e-8])
    if se is None:
        return np.nan
    P_e, dP_e = se.y[0, -1], se.y[1, -1]
    xi_e = (dP_e / P_e) / (rho_e * (om**2 - k**2 * vA_e**2))

    eps = p.get("eps", 0.01)
    F1 = ch["F"](1.0, om, k)

    def rhs(r, y):
        return [y[1] * ch["invF"](r, om, k), ch["g"](r, om, k) * y[0]]

    s1 = _ivp(rhs, (1.0, eps), [1.0, 0.0])
    s2 = _ivp(rhs, (1.0, eps), [0.0, F1])
    if s1 is None or s2 is None:
        return np.nan
    xi1 = ch["C1"](1.0, om, k) / ch["C3"](1.0, om, k)
    xi2 = F1
    if parity == "sausage":
        a1, a2 = s1.y[1, -1], s2.y[1, -1]      # P'(eps) = 0
        J = 0.0
    else:
        a1, a2 = s1.y[0, -1], s2.y[0, -1]      # P(eps) = 0 (+ jump)
        J = -rho_i0 * (p["v_twist"] * 1.0 ** p["power"]) ** 2
    if a2 == 0 or not (np.isfinite(a1) and np.isfinite(a2)):
        return np.nan
    B = -(a1 + J * xi_e) / a2
    xi_i = xi1 + B * xi2
    d = (xi_e - xi_i) * 100 / max(abs(xi_e), abs(xi_i))
    return d if signed else abs(d)


def _solve_scalar(f, scale, k):
    """Robust scalar root of f(dv)=0: the problem is LINEAR in dv (linear ODE,
    linear BC), so two evaluations determine the root exactly."""
    s = abs(scale) if scale != 0 else 1.0
    f0, f1 = f(0.0), f(s)
    if not (np.isfinite(f0) and np.isfinite(f1)) or f1 == f0:
        return None
    return -f0 * s / (f1 - f0)


# --------------------------------------------------------------------------
# classification driver
# --------------------------------------------------------------------------

def recheck_miss(args):
    name, p, om_ref, k, parity, om_ours, tol = args
    # om_ours may be a scalar (nearest root) or a list of OUR roots near the
    # entry (reproduce's omega_ours_window): the arbiter judges against the
    # CLOSEST of them - a pickle entry between two of our true zeros must
    # not be classified both_off merely because the dip's zero was not the
    # nearest one
    ours_list = ([o for o in om_ours if o is not None]
                 if isinstance(om_ours, (list, tuple)) else
                 ([om_ours] if om_ours else []))
    om_near = ours_list[0] if ours_list else None
    resid = {"slab_density": slab_residual, "slab_flow": slab_residual,
             "cylinder": cylinder_residual,
             "twisted": twisted_residual}[p["engine"]]
    rel_gap = (abs(om_near - om_ref) / om_ref if om_near else 1e-2)
    w = min(max(3.0 * rel_gap, 8e-3), 4e-2)
    om_star, r_star, nan_frac = _locate_zero(
        lambda o, s=False: resid(p, o, k, parity, signed=s), om_ref, w)
    out = dict(k=k, omega_ref=om_ref, omega_ours=om_near, parity=parity,
               omega_hiacc=om_star, resid_hiacc=r_star, nan_frac=nan_frac,
               rtol_note=f"@rtol={RTOL:g} ")
    if om_star is None or r_star > 5.0:
        out["verdict"] = "irreproducible"
        if nan_frac >= 0.5:
            # the scheme's own integrator stalls across the window: a
            # resonance/singular layer, not a locatable eigenvalue
            out["singular"] = True
        return out
    dev_ref = abs(om_star - om_ref) / abs(om_ref)
    dev_ours = (min(abs(om_star - o) / abs(om_star) for o in ours_list)
                if ours_list else np.inf)
    if dev_ours < tol <= dev_ref:
        out["verdict"] = "ref_error"
    elif dev_ref < tol:
        # both sides can sit inside the tolerance at once (the pickle's
        # first-acceptance offset is the same order as tol): the arbiter
        # then picks the side its converged dip actually lands on - a dip
        # 5x closer to our root than to the shipped value confirms ours,
        # not the pickle (tolerance-boundary cluster, PARITY r05)
        out["verdict"] = ("ref_error"
                          if dev_ours < 0.5 * dev_ref else "genuine")
    else:
        out["verdict"] = "both_off"
    out["dev_ref"] = round(dev_ref, 6)
    out["dev_ours"] = None if not np.isfinite(dev_ours) else round(dev_ours, 6)
    return out


def _locate_zero(f, om0, rel_halfwidth, n=17):
    """Nearest zero of the SIGNED mismatch within om0*(1 +- rel_halfwidth).

    A 5-point pre-scan detects SINGULAR windows first: inside resonance
    layers the scheme's integrator stalls (nfev budget -> NaN) at most
    omegas, and each stalled evaluation costs ~2 s - so windows with >= 3/5
    stalled points short-circuit to (None, inf, nan_frac) instead of paying
    for the full scan. Otherwise scans n points, brentq-refines every
    sign-change bracket, and keeps zeros whose |mismatch| is actually small
    (< 5%) - a pole flips the sign too, but |f| stays large at the brentq
    limit point, so poles are rejected. Returns (omega*, |residual|,
    nan_frac) for the zero nearest om0, or the argmin scan point when no
    true zero exists in the window (-> verdict `irreproducible`)."""
    oms = np.linspace(om0 * (1 - rel_halfwidth), om0 * (1 + rel_halfwidth), n)
    pre_idx = np.linspace(0, n - 1, 5).astype(int)
    fs = np.full(n, np.nan)
    for i in pre_idx:
        fs[i] = f(oms[i], True)
    n_bad = int(np.sum(~np.isfinite(fs[pre_idx])))
    if n_bad >= 3:
        return None, np.inf, n_bad / 5.0
    for i in range(n):
        if i not in pre_idx:
            fs[i] = f(oms[i], True)
    fin = np.isfinite(fs)
    nan_frac = float(np.mean(~fin))
    zeros = []
    for i in range(n - 1):
        if fin[i] and fin[i + 1] and fs[i] * fs[i + 1] < 0:
            try:
                z = brentq(lambda o: f(o, True), oms[i], oms[i + 1],
                           xtol=1e-12 * abs(om0), maxiter=80)
            except Exception:
                continue
            rz = abs(f(z, True))
            if np.isfinite(rz) and rz < 5.0:
                zeros.append((z, rz))
    if zeros:
        z, rz = min(zeros, key=lambda t: abs(t[0] - om0))
        return float(z), float(rz), nan_frac
    if not fin.any():
        return None, np.inf, nan_frac
    i = int(np.nanargmin(np.abs(fs)))
    return float(oms[i]), float(abs(fs[i])), nan_frac


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("report_json", help="output of tools/reproduce.py --json")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tol", type=float, default=3e-3)
    ap.add_argument("--jobs", type=int, default=12)
    ap.add_argument("--max-per-branch", type=int, default=0,
                    help="recheck at most N misses per branch (0 = all)")
    args = ap.parse_args()

    reports = json.load(open(args.report_json))
    try:
        from reproduce import TARGETS as _T
    except Exception:
        _T = {}
    tasks = []
    for rep in reports:
        name = rep.get("target")
        p = _case_params(name) if name else None
        if p is None:
            continue
        # per-target match tolerance (twisted targets use 8e-3: the
        # reference's first-acceptance offset is percent-level)
        tol = _T.get(name, {}).get("tol", args.tol)
        for br in ("sausage", "kink"):
            mis = rep.get(br, {}).get("misses")
            if not mis:
                continue
            windows = mis.get("omega_ours_window") or [None] * len(mis["k"])
            rows = list(zip(mis["omega_ref"], mis["k"], mis["omega_ours"],
                            windows))
            if args.max_per_branch:
                rows = rows[:args.max_per_branch]
            for om_r, k, om_o, win in rows:
                tasks.append((name, p, om_r, k, br,
                              win if win else om_o, tol))

    print(f"# rechecking {len(tasks)} misses on {args.jobs} processes",
          file=sys.stderr)
    with Pool(args.jobs) as pool:
        results = pool.map(recheck_miss, tasks)

    by_target = {}
    for (name, *_), res in zip(tasks, results):
        by_target.setdefault(name, []).append(res)
    summary = {}
    for name, rows in by_target.items():
        counts = {}
        for r in rows:
            counts[r["verdict"]] = counts.get(r["verdict"], 0) + 1
        summary[name] = counts
        print(json.dumps({"target": name, "verdicts": counts}))
    if args.out:
        json.dump({"summary": summary, "detail": by_target},
                  open(args.out, "w"), indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
