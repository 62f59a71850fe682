"""Reference-parity fuzz acceptance on a strided (reference-seed) subgrid.

The reference records swath entries AT its own scan seeds (it accepts any
scanned omega whose interface residual is under tolerance,
`multiprocessor_Inhomogeneous_method.py:503-508`; the cylinder flow file
scans 70 seeds/band at xi_tol=6%, `Cylinder_method_flow_testing.py:530,1153`).
With n_omega = stride*(N_ref-1)+1 the strided fuzz subsample coincides with
the reference's N_ref-point linspace while the bracket search keeps the full
ladder.
"""
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from eigensolver_tpu.search import SearchConfig, collect, search_rows


def _disp(omega, k):
    # det has a zero at omega = 2.0; mismatch dips under 3% in a swath
    # around it (reference-style percent residual)
    det = omega - 2.0
    mism = 100.0 * jnp.abs(det)          # <3% for |omega-2| < 0.03
    return SimpleNamespace(det=det, valid=jnp.ones_like(omega, bool),
                           mismatch_pct=mism)


def _run(cfg, n_omega):
    om = jnp.linspace(1.0, 3.0, n_omega)[None, :]
    ks = jnp.ones((1,))
    pr = search_rows(_disp, _disp, om, ks, cfg)
    return np.sort(collect(pr)[0])


def test_fuzz_stride_records_reference_seed_positions():
    n_ref = 11                             # "reference" seeds over [1, 3]
    stride = 9
    n_omega = stride * (n_ref - 1) + 1     # 91: strided == linspace(1,3,11)
    cfg = SearchConfig(n_omega=n_omega, n_bisect=50, max_brackets_per_row=4,
                       accept_pct=1.0, fuzz_accept_pct=3.0,
                       fuzz_stride=stride)
    roots = _run(cfg, n_omega)
    ref_seeds = np.linspace(1.0, 3.0, n_ref)
    in_swath = ref_seeds[np.abs(ref_seeds - 2.0) < 0.03]  # exactly [2.0]
    # every fuzz-accepted point must BE a reference seed inside the swath
    # (plus the bisected true root at 2.0, which coincides here)
    for r in roots:
        assert np.min(np.abs(in_swath - r)) < 1e-6 or abs(r - 2.0) < 1e-6


def test_fuzz_stride_1_keeps_dense_swath_minima():
    cfg_dense = SearchConfig(n_omega=91, n_bisect=50, max_brackets_per_row=4,
                             accept_pct=1.0, fuzz_accept_pct=3.0)
    roots = _run(cfg_dense, 91)
    # dense fuzz keeps the under-tolerance local minimum + first-of-run
    # points; all live inside the swath
    assert len(roots) >= 1
    assert np.all(np.abs(roots - 2.0) < 0.031)


def test_fuzz_stride_does_not_change_bracketed_roots():
    kw = dict(n_omega=91, n_bisect=55, max_brackets_per_row=4, accept_pct=1.0)
    a = _run(SearchConfig(fuzz_accept_pct=None, **kw), 91)
    b = _run(SearchConfig(fuzz_accept_pct=3.0, fuzz_stride=9, **kw), 91)
    # the polished root at 2.0 is present either way
    assert np.min(np.abs(a - 2.0)) < 1e-9
    assert np.min(np.abs(b - 2.0)) < 1e-9
