"""Fixed-step RK4 integrator correctness/convergence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigensolver_tpu.ode import rk4_final, rk4_final_renorm, rk4_trajectory


def test_rk4_harmonic_oscillator():
    def rhs(x, y):
        return jnp.stack([y[1], -y[0]])

    y0 = jnp.array([1.0, 0.0])
    yf = rk4_final(rhs, y0, 0.0, np.pi, 512)
    np.testing.assert_allclose(np.asarray(yf), [-1.0, 0.0], atol=1e-9)


def test_rk4_fourth_order_convergence():
    def rhs(x, y):
        return jnp.stack([y[1], -y[0]])

    y0 = jnp.array([1.0, 0.0])
    errs = []
    for n in [64, 128, 256]:
        yf = rk4_final(rhs, y0, 0.0, np.pi, n)
        errs.append(abs(float(yf[0]) + 1.0))
    # at least 4th-order (this symmetric problem superconverges to ~5th)
    assert errs[0] / errs[1] > 14.0
    assert errs[1] / errs[2] > 14.0


def test_rk4_complex_state():
    """Native complex integration replaces the reference's odeintz float-view
    wrapper (`Twisted_photospheric_flow_sausage.py:67-96`)."""
    lam = 0.3 + 1.1j

    def rhs(x, y):
        return lam * y

    y0 = jnp.array([1.0 + 0.0j])
    yf = rk4_final(rhs, y0, 0.0, 2.0, 256)
    np.testing.assert_allclose(np.asarray(yf)[0], np.exp(2 * lam), rtol=1e-9)


def test_rk4_trajectory_shape():
    def rhs(x, y):
        return -y

    yf, ys = rk4_trajectory(rhs, jnp.array([1.0]), 0.0, 1.0, 100)
    assert ys.shape == (101, 1)
    np.testing.assert_allclose(float(ys[-1, 0]), float(yf[0]))
    np.testing.assert_allclose(float(yf[0]), np.exp(-1.0), rtol=1e-8)


def test_rk4_renorm_matches_plain_up_to_scale():
    """Growing exponential over a long domain: renormalised integration keeps
    the direction exactly (dispersion determinants are scale-invariant)."""
    def rhs(x, y):
        return jnp.stack([y[1], 4.0 * y[0]])

    y0 = jnp.array([1e-8, 1e-8])
    yf, logs = rk4_final_renorm(rhs, y0, 0.0, 20.0, 2048, every=64)
    # true growing solution direction: (1, 2)
    ratio = float(yf[1] / yf[0])
    assert ratio == pytest.approx(2.0, rel=1e-8)


def test_rk4_traced_domain_bounds():
    """x0/x1 may be traced (per-candidate exterior extents)."""
    def rhs(x, y):
        return jnp.stack([y[1], -y[0]])

    f = jax.jit(jax.vmap(lambda L: rk4_final(rhs, jnp.array([1.0, 0.0]), 0.0, L, 256)))
    Ls = jnp.array([np.pi, np.pi / 2])
    out = np.asarray(f(Ls))
    np.testing.assert_allclose(out[0], [-1.0, 0.0], atol=1e-8)
    np.testing.assert_allclose(out[1], [0.0, -1.0], atol=1e-8)
