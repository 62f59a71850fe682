"""Modified-Bessel module vs scipy (real + complex) and the Pallas kernel
(interpret mode) vs the pure-JAX implementation."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import iv, ivp, kv, kvp

from eigensolver_tpu import special


@pytest.mark.parametrize("m", [0, 1])
def test_kve_ratio_real(m):
    zs = np.array([0.05, 0.5, 1.5, 1.99, 2.01, 3.0, 5.0, 8.9, 15.0, 50.0, 200.0])
    got = np.asarray(special.kve_ratio(m, jnp.asarray(zs)))
    want = kvp(m, zs) / kv(m, zs)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("m", [0, 1])
def test_kve_ratio_complex(m):
    rng = np.random.default_rng(0)
    zs = rng.uniform(0.05, 20, 25) + 1j * rng.uniform(-10, 10, 25)
    got = np.asarray(special.kve_ratio(m, jnp.asarray(zs)))
    want = np.array([kvp(m, z) / kv(m, z) for z in zs])
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize("m", [0, 1])
def test_ive_ratio_real(m):
    zs = np.array([0.1, 1.0, 4.0, 8.0])
    got = np.asarray(special.ive_ratio(m, jnp.asarray(zs)))
    want = ivp(m, zs) / iv(m, zs)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_k_values_small():
    zs = np.array([0.1, 0.7, 1.9])
    np.testing.assert_allclose(np.asarray(special.k0(jnp.asarray(zs))),
                               kv(0, zs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(special.k1(jnp.asarray(zs))),
                               kv(1, zs), rtol=1e-12)


@pytest.mark.slow  # fast-tier budget: the Pallas kernel is opt-in and the padding variant duplicates the sharding gate (re-tiered r05; <50 s bar)
def test_pallas_kernel_interpret_matches_jax():
    from eigensolver_tpu.kernels.bessel import kve_ratio_pallas
    z = jnp.asarray(np.random.default_rng(1).uniform(0.05, 30, 1024), jnp.float32)
    r0p, r1p = kve_ratio_pallas(z, interpret=True)
    r0 = special.kve_ratio(0, z)
    r1 = special.kve_ratio(1, z)
    np.testing.assert_allclose(np.asarray(r0p), np.asarray(r0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r1p), np.asarray(r1), rtol=1e-5)


def test_kve_hot_vmap_matches_scalar():
    """The custom_vmap hot wrapper must be transparent: vmapped results equal
    the plain elementwise evaluation (CPU branch of the dispatch)."""
    import jax
    from eigensolver_tpu.kernels import bessel

    z = jnp.asarray(np.random.default_rng(2).uniform(0.05, 30, 257))
    r0v, r1v = jax.vmap(bessel.kve_ratio_both_hot)(z)
    r0, r1 = special.kve_ratio_both(z)
    np.testing.assert_allclose(np.asarray(r0v), np.asarray(r0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r1v), np.asarray(r1), rtol=1e-12)
    # scalar call passes through untouched
    s0, s1 = bessel.kve_ratio_both_hot(jnp.float64(3.3))
    w0, w1 = special.kve_ratio_both(jnp.float64(3.3))
    assert float(s0) == float(w0) and float(s1) == float(w1)


@pytest.mark.slow  # fast-tier budget: the Pallas kernel is opt-in and the padding variant duplicates the sharding gate (re-tiered r05; <50 s bar)
def test_kve_hot_pallas_branch_is_wired(monkeypatch):
    """Force the dispatch to the Pallas kernel (interpret mode on CPU) and
    check (a) it actually runs, (b) a full cylinder dispersion batch through
    the hot path matches the pure-JAX exterior to 1e-6 (the VERDICT's
    on-device equality bar, exercised in interpret mode)."""
    import jax
    from eigensolver_tpu.kernels import bessel

    hits = []
    real_pallas = bessel.kve_ratio_pallas

    def fake_pallas(z, interpret=False):
        hits.append(z.shape)
        return real_pallas(z, interpret=True)

    monkeypatch.setattr(bessel, "_hot_dispatch", lambda z: "pallas")
    monkeypatch.setattr(bessel, "kve_ratio_pallas", fake_pallas)

    z = jnp.asarray(np.random.default_rng(3).uniform(0.05, 30, 300), jnp.float32)
    with jax.disable_jit():          # keep the monkeypatch visible (no cache)
        r0v, r1v = jax.vmap(bessel.kve_ratio_both_hot)(z)
    assert hits, "pallas branch never dispatched"
    r0, r1 = special.kve_ratio_both(z)
    np.testing.assert_allclose(np.asarray(r0v), np.asarray(r0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r1v), np.asarray(r1), rtol=1e-6)


@pytest.mark.slow
def test_bessel_exterior_equals_numeric_exterior():
    """Cylinder dispersion roots identical under 'bessel' vs 'numeric'
    exterior treatment (machine precision)."""
    import dataclasses
    import jax
    from eigensolver_tpu import cases
    from eigensolver_tpu.search import bisect, find_brackets, ladder_scan
    from eigensolver_tpu.sweep import make_dispersion

    case_b = cases.cylinder_density_coronal(width=1e5)
    case_b = dataclasses.replace(
        case_b, grid=dataclasses.replace(case_b.grid, n_interior=256))
    case_n = dataclasses.replace(
        case_b, grid=dataclasses.replace(case_b.grid, exterior_method="numeric"))
    k = 1.0
    W = np.linspace(2.0, 4.0, 801)
    out = {}
    for nm, c in [("bessel", case_b), ("numeric", case_n)]:
        disp = jax.jit(jax.vmap(make_dispersion(c, 1)))
        om = jnp.asarray(W * k)[None, :]
        ks = jnp.asarray([k])
        det, valid, _ = ladder_scan(disp, om, ks)
        d = np.asarray(det[0])
        v = np.asarray(valid[0])
        s = np.sign(d)
        roots = []
        for i in np.nonzero((s[:-1] * s[1:] < 0) & v[:-1] & v[1:])[0]:
            roots.append(W[i] - d[i] * (W[i + 1] - W[i]) / (d[i + 1] - d[i]))
        out[nm] = np.asarray(roots)
    assert len(out["bessel"]) == len(out["numeric"]) > 0
    # numeric exterior carries its own RK discretisation error (~1e-8)
    np.testing.assert_allclose(out["bessel"], out["numeric"], rtol=1e-6)
