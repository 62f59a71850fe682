"""Eigenfunction reconstruction at converged roots (L4 of the reference stack).

The reference re-runs the exterior odeint + interior fsolve shooting at a
chosen root and derives the remaining components algebraically
(`analysis_compare_coronal_eigenfunctions_coronal.py:889-930`; full twisted
algebra in `twisted_flow_p08_v01_disp_diag_curves.py:2823-2889`). Here the
reconstruction is a pure re-evaluation of the already-converged dispersion
integration with trajectory capture - no root-finding.

Derived-component algebra (cited lines; B_z == reference B_i):
  f_B = m B_phi/r + k B_z ;  g_B = m B_z/r + k B_phi   (`:2665-2671`)
  xi_z  interior: `:2823` (B_phi=0 limit -> k c^2 P / ((c^2+vA^2) rho (Om^2-om_c^2)))
  xi_phi interior: `:2840` (B_phi=0 limit -> (m P/r) / (rho (Om^2-om_A^2)))
  v_r = -Om xi_r ; v_phi = -Om xi_phi - r (v_phi0/r)' xi_r  (`:2862-2863`)
  v_z = -Om xi_z - v_z0' xi_r  (`:2888-2889`; the reference differentiates
  v_z0/r there, a slip that is invisible because its v_z0 = 0 - we use v_z0')
  exterior xi_z: standard k c_e^2 P/((c_e^2+vA_e^2) rho_e (om^2 - k^2 cT_e^2))
  (the reference's `:2824` carries a spurious omega^2 factor; with its
  normalised plotting this is invisible - we keep the consistent form).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import CaseConfig
from .ode import rk4_trajectory
from .profiles import elementwise_grad
from .physics.cylinder import CylinderPhysics
from .physics.slab import SlabPhysics


@dataclasses.dataclass
class RadialEigenfunction:
    """Radial profiles of one eigenmode on the combined interior+exterior grid
    (ascending coordinate; `i_boundary` indexes the interface point)."""

    omega: float
    k: float
    mode: int                    # slab parity or cylinder azimuthal order m
    x: np.ndarray
    P_T: np.ndarray              # total-pressure perturbation
    xi_r: np.ndarray             # radial (cylinder) / x (slab) displacement
    i_boundary: int
    vx: Optional[np.ndarray] = None      # slab velocity perturbation
    xi_phi: Optional[np.ndarray] = None  # cylinder only
    xi_z: Optional[np.ndarray] = None
    v_r: Optional[np.ndarray] = None
    v_phi: Optional[np.ndarray] = None
    v_z: Optional[np.ndarray] = None

    def normalised(self, by: str = "xi_r") -> "RadialEigenfunction":
        ref = np.max(np.abs(getattr(self, by)))
        out = dataclasses.replace(self)
        for f in ("P_T", "xi_r", "vx", "xi_phi", "xi_z", "v_r", "v_phi", "v_z"):
            v = getattr(self, f)
            if v is not None:
                setattr(out, f, v / ref)
        return out


def reconstruct_slab(case: CaseConfig, parity: int, omega: float, k: float,
                     n_interior: int = 1024, n_exterior: int = 256,
                     exterior_extent: float = 2.0) -> RadialEigenfunction:
    """vx(x), PT(x), xi(x) on [-x_ext, +x_ext] for a slab root.

    Uses the SAME interior form as the dispersion path: the self-adjoint flux
    form for density cases, the D(x)/coeff(x) shear form when the case has a
    non-uniform flow (`flow_multiprocessor_coronal.py:317-356`) - so the
    reconstructed mode is the eigenfunction of the equation whose determinant
    the sweep zeroed, not of a different ODE.
    """
    ph = SlabPhysics.from_case(case)
    eq = ph.eq
    omega = float(omega)
    k = float(k)
    x_half = np.linspace(0.0, 1.0, n_interior + 1)
    Om = omega - k * np.asarray(eq.U_i(jnp.asarray(x_half)))

    if ph.has_flow:
        # shear form, state (vx, vx'); PT = (F/Om) vx' (the real Gaussian-flow
        # solver's interface pressure, `flow_multiprocessor_coronal.py:356` -
        # the -kU'/Om shear-pressure correction is the complex solver's
        # variant and is omitted here exactly as in make_dispersion)
        rhs = ph.make_shear_rhs(omega, k)
        y0 = jnp.array([0.0, 1.0]) if parity == 0 else jnp.array([1.0, 0.0])
        _, traj = rk4_trajectory(rhs, y0, 0.0, 1.0, n_interior)
        traj = np.asarray(traj)
        vx_half = traj[:, 0]
        dvx_half = traj[:, 1]
        Fv = np.asarray(jax.vmap(
            lambda x: ph.interior_F(x, omega, k))(jnp.asarray(x_half)))
        PT_half = (Fv / Om) * dvx_half
    else:
        rhs = ph.make_flux_rhs(omega, k)
        F0 = float(ph.interior_F(jnp.asarray(0.0), omega, k))
        y0 = jnp.array([0.0, F0]) if parity == 0 else jnp.array([1.0, 0.0])
        _, traj = rk4_trajectory(rhs, y0, 0.0, 1.0, n_interior)
        traj = np.asarray(traj)
        vx_half = traj[:, 0]
        w_half = traj[:, 1]
        PT_half = w_half / Om

    # mirror by parity: vx odd (sausage) / even (kink); PT has opposite parity
    sgn = -1.0 if parity == 0 else 1.0
    x_int = np.concatenate([-x_half[::-1][:-1], x_half])
    vx_int = np.concatenate([sgn * vx_half[::-1][:-1], vx_half])
    PT_int = np.concatenate([-sgn * PT_half[::-1][:-1], PT_half])

    # exterior (analytic): vx = vx(1) exp(-sqrt(m_e)(x-1)) scaled for xi continuity
    m_e = float(ph.exterior_m(omega, k))
    sq = np.sqrt(max(m_e, 0.0))
    p_e = float(ph.exterior_PT_coeff(omega, k))
    x_ext = np.linspace(1.0, 1.0 + exterior_extent * 2 * np.pi / k, n_exterior + 1)[1:]
    Om_i1 = omega - k * float(eq.U_i(jnp.asarray(1.0)))
    Om_e = omega - k * eq.regime.U_e
    vx_b = vx_half[-1]
    # xi continuity: vx_e(1) = vx_i(1) * Om_e / Om_i(1)
    amp = vx_b * Om_e / Om_i1
    decay = np.exp(-sq * (x_ext - 1.0))
    vx_ext = amp * decay
    PT_ext = p_e * (-sq) * amp * decay

    x = np.concatenate([x_int, x_ext])
    vx = np.concatenate([vx_int, vx_ext])
    PT = np.concatenate([PT_int, PT_ext])
    Om_full = omega - k * np.asarray(eq.U_i(jnp.asarray(x)))
    Om_full = np.where(np.abs(x) > 1.0, Om_e, Om_full)
    xi = vx / Om_full

    # mirror exterior to the left for a symmetric full-domain profile
    xL = -x[len(x_int):][::-1]
    vxL = sgn * vx[len(x_int):][::-1]
    PTL = -sgn * PT[len(x_int):][::-1]
    xiL = sgn * xi[len(x_int):][::-1]
    x = np.concatenate([xL, x, ])
    vx = np.concatenate([vxL, vx])
    PT = np.concatenate([PTL, PT])
    xi = np.concatenate([xiL, xi])

    return RadialEigenfunction(
        omega=omega, k=k, mode=parity, x=x, P_T=PT, xi_r=xi, vx=vx,
        i_boundary=int(np.searchsorted(x, 1.0)))


def reconstruct_cylinder(case: CaseConfig, m: int, omega: float, k: float,
                         n_interior: int = 1024, n_exterior: int = 512,
                         ) -> RadialEigenfunction:
    """P(r), xi_r(r) and derived xi_phi, xi_z, v_* for a cylinder root."""
    ph = CylinderPhysics.from_case(case)
    eq = ph.eq
    rg = eq.regime
    gr = case.grid
    omega = float(omega)
    k = float(k)
    eps = gr.axis_epsilon
    twisted = case.twist_profile is not None

    Dfun, C1fun, C3fun, Ffun, gfun, invFfun, _ = ph.coefficients(
        omega, k, m, twisted_c1=twisted)

    def rhs_int(r, y):
        P, w = y[0], y[1]
        return jnp.stack([w * invFfun(r), gfun(r) * P])

    F1 = float(Ffun(jnp.asarray(1.0)))
    _, t1 = rk4_trajectory(rhs_int, jnp.array([1.0, 0.0]), 1.0, eps, n_interior)
    _, t2 = rk4_trajectory(rhs_int, jnp.array([0.0, F1]), 1.0, eps, n_interior)
    t1, t2 = np.asarray(t1), np.asarray(t2)
    if m == 0:
        a1, a2 = t1[-1, 1], t2[-1, 1]
    else:
        a1, a2 = t1[-1, 0], t2[-1, 0]
    B = -a1 / a2
    traj = t1 + B * t2                    # axis-regular combination, P(1)=1
    r_in = np.linspace(1.0, eps, n_interior + 1)

    P_in = traj[:, 0]
    w_in = traj[:, 1]
    C1v = np.asarray(jax.vmap(C1fun)(jnp.asarray(r_in)))
    C3v = np.asarray(jax.vmap(C3fun)(jnp.asarray(r_in)))
    Dv = np.asarray(jax.vmap(Dfun)(jnp.asarray(r_in)))
    xi_in = C1v * P_in / C3v + w_in / r_in

    # exterior
    m_e = float(ph.exterior_m(omega, k))
    r_far = gr.exterior_wavelengths * 2 * np.pi / k

    def rhs_ext(r, y):
        P, dP = y[0], y[1]
        return jnp.stack([dP, -dP / r + (m_e + (m * m) / r ** 2) * P])

    _, te = rk4_trajectory(rhs_ext, jnp.array([1e-8, -1e-8]), r_far, 1.0, n_exterior)
    te = np.asarray(te)
    r_ex = np.linspace(r_far, 1.0, n_exterior + 1)
    scale = te[-1, 0]                     # normalise P_e(1) = P_i(1) = 1
    P_ex = te[:, 0] / scale
    dP_ex = te[:, 1] / scale
    xi_ex = dP_ex / (rg.rho_e * (omega**2 - k**2 * rg.vA_e**2))

    # ---- derived components (interior; citations in module docstring) -------
    rj = jnp.asarray(r_in)
    rho = np.asarray(eq.rho_i(rj))
    c2 = np.asarray(eq.c_i(rj)) ** 2
    vA2 = np.asarray(eq.vA_i(rj)) ** 2
    Bz = np.asarray(eq.B_i(rj))
    Bp = np.asarray(eq.B_phi(rj))
    vp = np.asarray(eq.v_phi(rj))
    vz0 = np.asarray(eq.U_i(rj))
    Om = omega - m * vp / r_in - k * vz0
    omA = (m * Bp / r_in + k * Bz) / np.sqrt(rho)
    omC = omA * np.sqrt(c2) / np.sqrt(c2 + vA2)
    f_B = m * Bp / r_in + k * Bz
    g_B = m * Bz / r_in + k * Bp
    Qv = (-(Om**2 - omA**2) * rho * vp**2 / r_in
          + 2 * Om**2 * Bp**2 / r_in + 2 * Om * Bp * vp * f_B / r_in)
    Tv = f_B * Bp + rho * vp * Om

    xi_z_in = ((f_B * (c2 / (c2 + vA2)) * (Om**2 * P_in - Qv * xi_in)
                / (Om**2 * rho * (Om**2 - omC**2)))
               - ((2 * Om * vp * Bp + f_B * vp**2) * (xi_in / r_in))
               - (Bp * (g_B * P_in - 2 * Bz * Tv * (xi_in / r_in))
                  / (Bz * rho * (Om**2 - omA**2)))) / (Bp**2 / Bz + Bz)
    xi_phi_in = (((g_B * P_in - 2 * Bz * Tv * (xi_in / r_in))
                  / (rho * (Om**2 - omA**2))) + Bp * xi_z_in) / Bz

    dvp_over_r = elementwise_grad(lambda r: eq.v_phi(r) / r)
    dvz = elementwise_grad(eq.U_i)
    v_r_in = -Om * xi_in
    v_phi_in = -Om * xi_phi_in - np.asarray(dvp_over_r(rj)) * r_in * xi_in
    v_z_in = -Om * xi_z_in - np.asarray(dvz(rj)) * xi_in

    # exterior derived components (static exterior)
    cT_e2 = rg.cT_e**2
    xi_z_ex = (k * rg.c_e**2 * P_ex
               / ((rg.c_e**2 + rg.vA_e**2) * rg.rho_e * (omega**2 - k**2 * cT_e2)))
    xi_phi_ex = (m * P_ex / r_ex) / (rg.rho_e * (omega**2 - k**2 * rg.vA_e**2))
    v_r_ex = -omega * xi_ex
    v_phi_ex = -omega * xi_phi_ex
    v_z_ex = -omega * xi_z_ex

    # assemble ascending grid: interior (eps -> 1) + exterior (1 -> r_far)
    def j(a_in, a_ex):
        return np.concatenate([a_in[::-1], a_ex[::-1][1:]])

    x = j(r_in, r_ex)
    return RadialEigenfunction(
        omega=omega, k=k, mode=m, x=x,
        P_T=j(P_in, P_ex), xi_r=j(xi_in, xi_ex),
        xi_phi=j(xi_phi_in, xi_phi_ex), xi_z=j(xi_z_in, xi_z_ex),
        v_r=j(v_r_in, v_r_ex), v_phi=j(v_phi_in, v_phi_ex),
        v_z=j(v_z_in, v_z_ex),
        i_boundary=n_interior)
