"""Derived equilibrium fields.

For the density cases the reference derives all internal speeds from the single
density profile under total-pressure balance
(`multiprocessor_Inhomogeneous_method.py:143-160`, `Density_cylinder.py:155-221`):

    rho_i(x) = profile(x)
    vA_i(x)  = vA_i0 sqrt(rho_i0 / rho_i(x))        [B constant]
    c_i(x)   = sqrt( rho_e (c_e^2 + g/2 vA_e^2) / rho_i(x)  -  g/2 vA_i(x)^2 )
    cT_i(x)  = c_i vA_i / sqrt(c_i^2 + vA_i^2)

For the twisted (rotational flow) cases the internal pressure instead follows
from radial force balance with the azimuthal flow
(`Twisted_photospheric_flow_sausage.py:183-189`):

    P_i(r) = rho_i0 v_twist^2 r^(2p) / (2p) + P_0,   c_i(r)^2 = gamma P_i / rho_i0
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from .config import CaseConfig, ProfileKind, Regime
from .profiles import Profile, make_profile


@dataclasses.dataclass(frozen=True)
class Equilibrium:
    """Bundle of callable equilibrium fields f(x) -> array (closed-form JAX)."""

    regime: Regime
    rho_i: Profile
    c_i: Profile
    vA_i: Profile
    cT_i: Profile
    B_i: Profile                    # longitudinal field B_z(r) (cylinder) / B_0
    U_i: Profile                    # longitudinal flow profile (slab flow cases)
    v_phi: Profile                  # azimuthal flow v_phi(r) (rotational flow)
    B_phi: Profile                  # azimuthal field B_phi(r)
    P_i: Profile

    def boundary_speeds(self, x_b: float = 1.0):
        """Characteristic speeds evaluated at the layer edge |x| = x_b
        (reference `c_bound`/`vA_bound`/`cT_bound`,
        `multiprocessor_Inhomogeneous_method.py:166-169`)."""
        xb = jnp.asarray(x_b, dtype=jnp.float64)
        c_b = float(self.c_i(xb))
        vA_b = float(self.vA_i(xb))
        cT_b = (c_b * vA_b) / (c_b ** 2 + vA_b ** 2) ** 0.5
        return c_b, vA_b, cT_b


def _const(v: float) -> Profile:
    def f(x):
        return v + 0.0 * x
    return f


def continuum_bands(case: CaseConfig, n: int = 512):
    """[(v_lo, v_hi, label), ...] ranges each characteristic speed sweeps
    across the non-uniform layer - the shaded continuum bands of the
    reference's overlay figures (fill_between of the boundary-to-centre speed
    ranges, `analysis_photospheric.py` / `analysis_cylinder_coronal_09.py`
    tails). Uniform speeds (zero-width bands) are dropped."""
    import numpy as np
    eq = make_equilibrium(case)
    eps = case.grid.axis_epsilon if case.geometry.value == "cylinder" else 0.0
    xs = jnp.linspace(eps, 1.0, n)
    out = []
    for fn, label in ((eq.cT_i, "$c_T$ continuum"),
                      (eq.c_i, "$c$ continuum"),
                      (eq.vA_i, "$v_A$ continuum")):
        v = np.asarray(fn(xs), float)
        lo, hi = float(np.min(v)), float(np.max(v))
        if hi - lo > 1e-9 * max(1.0, abs(hi)):
            out.append((lo, hi, label))
    # Doppler-shifted cusp band when the layer flows (backward slow continuum)
    u = np.asarray(eq.U_i(xs), float)
    if np.ptp(u) > 1e-12 or abs(u[0]) > 1e-12:
        ct = np.asarray(eq.cT_i(xs), float)
        out.append((float(np.min(u - ct)), float(np.max(u - ct)),
                    "$U - c_T$ continuum"))
        out.append((float(np.min(u + ct)), float(np.max(u + ct)),
                    "$U + c_T$ continuum"))
        if np.ptp(u) > 1e-12:
            # the flow (critical-layer) continuum itself: omega = k U(x)
            # has a regular singular point wherever the Doppler shift
            # vanishes; sheared-flow scans record swath entries there
            # (`flow_multiprocessor_coronal.py:317-318` D(x) pole)
            out.append((float(np.min(u)), float(np.max(u)),
                        "$U$ flow continuum"))
    return out


def genuine_continua(case: CaseConfig, n: int = 512, guard: float = 2e-4):
    """Signed phase-speed ranges of the GENUINE interior continua - the
    Doppler-shifted Alfven (U +- vA) and cusp (U +- cT) resonances (zeros of
    the Hain-Lust D factor / the slab singular factors) plus the shear-flow
    critical layer (omega = k U(x)). Unlike `continuum_bands` this excludes
    the apparent c(x) band: omega = k c(x) is a removable singularity of the
    vx/P_T formulations (the flux form integrates through it), and genuine
    slow body modes live there. Used to mask bracket formation: inside these
    ranges the discretized operator grows a dense point spectrum whose
    eigenvalues shift with grid resolution (measured: cyl_flow_1 at
    n_interior 1024/2048/4096 moves every in-band crossing by ~1e-4 while
    the discrete mode at v=0.9505 stays put to <5e-5), so sign changes there
    are not converged eigenvalues. Returns [] for twisted cases (their
    continua depend on k and m through m v_phi / (k r) - use
    `genuine_continua_rowfn` for those, which masks per ladder row). `guard`
    SHRINKS each range by a relative margin so edge modes hugging a continuum
    survive."""
    import numpy as np
    if case.twist_profile is not None:
        return []
    eq = make_equilibrium(case)
    eps = case.grid.axis_epsilon if case.geometry.value == "cylinder" else 0.0
    xs = jnp.linspace(eps, 1.0, n)
    u = np.asarray(eq.U_i(xs), float)
    out = []
    for fn, label in ((eq.vA_i, "alfven"), (eq.cT_i, "cusp")):
        v = np.asarray(fn(xs), float)
        for s in (+1.0, -1.0):
            lo, hi = float(np.min(u + s * v)), float(np.max(u + s * v))
            if hi - lo > 1e-9 * max(1.0, abs(hi)):
                out.append((lo, hi, f"{label}{'+' if s > 0 else '-'}"))
    if np.ptp(u) > 1e-12:
        out.append((float(np.min(u)), float(np.max(u)), "flow"))
    # one symmetric scale for both the shrink and the width filter, so a
    # narrow band can never come out inverted (lo' > hi')
    def _scale(lo, hi):
        return max(1.0, abs(lo), abs(hi))
    return [(lo + guard * _scale(lo, hi), hi - guard * _scale(lo, hi), lab)
            for lo, hi, lab in out
            if hi - lo > 2 * guard * _scale(lo, hi)]


def genuine_continua_rowfn(case: CaseConfig, n: int = 192, guard: float = 2e-4):
    """Row-local continuum ranges for the rotational-flow (twisted) family.

    The twisted continua are (k, m)-dependent: the Doppler shift is
    m v_phi(r)/r + k v_z(r) and the Alfven frequency m B_phi(r)/r +
    k B_z(r)/sqrt(rho) (resonant denominators of the Hain-Lust chain,
    `Twisted_photospheric_flow_sausage.py:482-530`), so no single
    phase-speed band per case exists. Returns a jit-traceable
    fn(k, m) -> (lo, hi) arrays of shape (4,): OMEGA ranges of the Doppler
    Alfven+/- and cusp+/- continua for that ladder row, shrunk by `guard`
    (relative) as in `genuine_continua`. Degenerate bands (zero width for
    e.g. p=1 flow-only twist, where m v_phi/r is r-independent) come out
    with lo > hi and match nothing. Returns None for non-twisted cases."""
    if case.twist_profile is None:
        return None
    eq = make_equilibrium(case)
    eps = case.grid.axis_epsilon if case.geometry.value == "cylinder" else 1e-3
    rr = jnp.linspace(eps, 1.0, n)

    def rowfn(k, m):
        dop = m * eq.v_phi(rr) / rr + k * eq.U_i(rr)
        w_a = m * eq.B_phi(rr) / rr + k * eq.B_i(rr) / jnp.sqrt(eq.rho_i(rr))
        ci = eq.c_i(rr)
        w_c = w_a * ci / jnp.sqrt(ci ** 2 + eq.vA_i(rr) ** 2)
        los, his = [], []
        for s in (w_a, -w_a, w_c, -w_c):
            band = dop + s
            lo, hi = jnp.min(band), jnp.max(band)
            scale = jnp.maximum(1.0, jnp.maximum(jnp.abs(lo), jnp.abs(hi)))
            los.append(lo + guard * scale)
            his.append(hi - guard * scale)
        return jnp.stack(los), jnp.stack(his)

    return rowfn


def make_equilibrium(case: CaseConfig) -> Equilibrium:
    rg = case.regime
    rho_e, g = rg.rho_e, rg.gamma

    # --- density profile and pressure-balanced speeds -----------------------
    rho_i = make_profile(case.density_profile, rg.rho_i0, rho_e)

    if case.twist_profile is not None:
        # Rotational-flow case: uniform density, force-balanced pressure.
        v_phi = make_profile(case.twist_profile, 0.0, 0.0)
        tp = case.twist_profile
        amp, p = tp.amplitude, tp.power
        P_0 = rg.P_0

        if case.b_twist_profile is not None:
            B_phi = make_profile(case.b_twist_profile, 0.0, 0.0)
        else:
            B_phi = _const(0.0)

        def rho_u(x):
            return rg.rho_i0 + 0.0 * x

        def P_i(r):
            # radial force balance for v_phi = amp * r^p
            # (`Twisted_photospheric_flow_sausage.py:183-185`)
            return rho_u(r) * amp ** 2 * (r ** (2.0 * p) / (2.0 * p)) + P_0

        def B_i(r):
            # pressure-balanced B_z when an azimuthal field is present
            # (`Twisted_photospheric_flow_sausage.py:167-173`)
            return rg.B_0 * jnp.sqrt(1.0 - 2.0 * (B_phi(r) ** 2 / rg.B_0 ** 2))

        def c_i(r):
            return jnp.sqrt(P_i(r) * g / rho_u(r))

        def vA_i(r):
            return (B_i(r) + B_phi(r)) / jnp.sqrt(rho_u(r))

        rho_fn = rho_u
    else:
        v_phi = _const(0.0)
        B_phi = _const(0.0)
        B_i = _const(rg.B_0)

        if case.density_profile.kind == ProfileKind.UNIFORM:
            # Uniform density: speeds are the exact regime constants. (The
            # balance formula below reproduces them only when rho_e itself is
            # balance-derived; cases with rho_e_override - e.g. the complex KH
            # file's independent rho_i=9, rho_e=5 - would otherwise skew c_i.)
            vA_i = _const(rg.vA_i0)
            c_i = _const(rg.c_i0)
        else:
            def vA_i(x):
                return rg.vA_i0 * jnp.sqrt(rg.rho_i0 / rho_i(x))

            def c_i(x):
                return jnp.sqrt(
                    rho_e * (rg.c_e ** 2 + 0.5 * g * rg.vA_e ** 2) / rho_i(x)
                    - 0.5 * g * vA_i(x) ** 2
                )

        def P_i(x):
            return c_i(x) ** 2 * rho_i(x) / g

        rho_fn = rho_i

    def cT_i(x):
        c2 = c_i(x) ** 2
        a2 = vA_i(x) ** 2
        return jnp.sqrt(c2 * a2 / (c2 + a2))

    # --- longitudinal flow profile (slab flow / cylinder axial flow) --------
    if case.flow_profile.kind == ProfileKind.UNIFORM and rg.U_i0 == rg.U_e == 0.0:
        U_i = _const(0.0)
    else:
        U_i = make_profile(case.flow_profile, rg.U_i0, rg.U_e)

    return Equilibrium(
        regime=rg,
        rho_i=rho_fn,
        c_i=c_i,
        vA_i=vA_i,
        cT_i=cT_i,
        B_i=B_i,
        U_i=U_i,
        v_phi=v_phi,
        B_phi=B_phi,
        P_i=P_i,
    )
