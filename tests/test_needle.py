"""Band-edge (needle) pass: near-edge spectral structure the production
ladder cannot resolve (`sweep.run_needle_pass`).

Reference behaviour reproduced: pickles carry entries AT the cusp-continuum
edges - an isolated discrete zero just outside the band top
(`width15_coronal.pickle` k=0.080505) and the band-edge accumulation point
of the in-band spectrum (`width3.pickle` k=0.43303); both sit inside the
main ladder's `ladder_edge_shrink` margin
(`multiprocessor_Inhomogeneous_method.py:790-835` records them because its
seed grid is per-(k, omega) with no band masking).
"""
import dataclasses

import numpy as np
import pytest

from eigensolver_tpu import cases as case_mod
from eigensolver_tpu.roots import RootBranch, RootSet, merge_rootsets
from eigensolver_tpu.sweep import _filter_edge_modes, needle_edges


def test_merge_rootsets_tight_dedup_preserves_near_edge_roots():
    a = RootSet({"sausage": RootBranch(omegas=np.array([0.36798, 0.4]),
                                       ks=np.array([0.4, 0.4]))}, "c")
    # second set: one exact duplicate (bisection-level agreement) plus two
    # roots 3e-5 apart - closer than the production dedup_rel=1e-4
    b = RootSet({"sausage": RootBranch(
        omegas=np.array([0.36798, 0.367991, 0.368002]),
        ks=np.array([0.4, 0.4, 0.4]))}, "c")
    m = merge_rootsets(a, b)
    om = m["sausage"].omegas
    assert len(om) == 4  # duplicate collapsed, near-edge pair preserved
    assert np.isclose(om, 0.367991).any() and np.isclose(om, 0.368002).any()


def test_filter_edge_modes_keeps_innermost_per_window():
    # in-band window above edge 0.85 (side +1): three roots at distances
    # 1e-5, 1e-4, 1e-3; outside window (side -1, in_band=False) untouched
    edges = ((0.85, -1.0, False), (0.85, +1.0, True))
    k = 0.5
    v = np.array([0.85 * (1 + d) for d in (1e-5, 1e-4, 1e-3)] + [0.8497])
    br = RootBranch(omegas=v * k, ks=np.full(4, k))
    out = _filter_edge_modes(br, edges, width_rel=3e-3, edge_modes=1)
    vv = np.sort(out.omegas / out.ks)
    assert len(out) == 2
    np.testing.assert_allclose(vv, [0.8497, 0.85 * (1 + 1e-5)], rtol=1e-12)


def test_needle_edges_cusp_windows():
    case = case_mod.slab_density_photospheric(width=3.0)
    edges = needle_edges(case)
    # cusp+ and cusp- bands, two edges each, two sides each
    assert len(edges) == 8
    in_band = [e for e in edges if e[2]]
    assert len(in_band) == 4
    lo = min(e for e, _, _ in edges if e > 0)
    assert abs(lo - 0.84977) < 1e-4


@pytest.mark.slow
def test_needle_pass_finds_band_edge_entries():
    """End-to-end: the pass recovers both reference miss classes (f64, one
    k each; PARITY_r05 slab_ph_3 / slab_co_15 'needle' entries)."""
    import jax
    from eigensolver_tpu.sweep import run_needle_pass
    assert jax.config.jax_enable_x64  # conftest enables x64 for slow tier
    for fac, kw, k, om_ref in [
        # band-edge accumulation marker (in-band innermost zero)
        (case_mod.slab_density_photospheric, dict(width=3.0),
         0.43303, 0.367977),
        # isolated discrete zero just outside the band top
        (case_mod.slab_density_coronal, dict(width=1.5),
         0.080505, 0.0716901),
    ]:
        case = fac(**kw)
        case = dataclasses.replace(case, grid=dataclasses.replace(
            case.grid, exterior_method="numeric", exterior_wavelengths=7.0))
        edges = tuple(e for e in needle_edges(case) if e[0] > 0)
        rs, st = run_needle_pass(case, modes=(0,), ks=[k], edges=edges)
        om = rs["sausage"].omegas
        assert len(om) > 0
        rel = np.abs(om - om_ref) / om_ref
        assert rel.min() < 3e-3, f"{kw}: nearest {rel.min():.2e}"
        # in-band keep policy: at most edge_modes roots per in-band window
        n_in_band = sum(1 for e in edges if e[2])
        assert len(om) <= n_in_band + 8  # outside windows are sparse
