"""RootSet dedup + reference-pickle format compatibility."""
import numpy as np
import pytest

from eigensolver_tpu.roots import (RootBranch, RootSet, dedup_roots,
                                   load_pickle, save_pickle)


def test_dedup_collapses_band_duplicates():
    om = np.array([1.0, 1.00001, 2.0, 2.5, 2.5000001])
    ks = np.array([0.5, 0.5, 0.5, 0.7, 0.7])
    o, k = dedup_roots(om, ks, rel_tol=1e-4)
    assert len(o) == 3
    np.testing.assert_allclose(o, [1.0, 2.0, 2.5])


def test_dedup_keeps_distinct_k():
    om = np.array([1.0, 1.0])
    ks = np.array([0.5, 0.6])
    o, k = dedup_roots(om, ks, rel_tol=1e-4)
    assert len(o) == 2


def test_pickle_roundtrip_4tuple(tmp_path):
    rs = RootSet({
        "sausage": RootBranch(np.array([1.0, 2.0]), np.array([0.1, 0.2])),
        "kink": RootBranch(np.array([3.0]), np.array([0.3])),
    }, "case")
    p = str(tmp_path / "t.pickle")
    save_pickle(p, rs)
    rs2 = load_pickle(p)
    np.testing.assert_allclose(rs2["sausage"].omegas, [1.0, 2.0])
    np.testing.assert_allclose(rs2["kink"].ks, [0.3])


def test_pickle_roundtrip_2tuple(tmp_path):
    rs = RootSet({"kink": RootBranch(np.array([3.0, 4.0]), np.array([0.3, 0.4]))})
    p = str(tmp_path / "t2.pickle")
    save_pickle(p, rs)
    rs2 = load_pickle(p)
    assert set(rs2.branches) == {"kink"}
    np.testing.assert_allclose(rs2["kink"].omegas, [3.0, 4.0])


def test_pickle_roundtrip_8tuple_complex(tmp_path):
    rs = RootSet({
        "sausage": RootBranch(np.array([1.0]), np.array([0.1]),
                              omegas_imag=np.array([0.05])),
        "kink": RootBranch(np.array([2.0]), np.array([0.2]),
                           omegas_imag=np.array([-0.01])),
    })
    p = str(tmp_path / "t8.pickle")
    save_pickle(p, rs)
    rs2 = load_pickle(p)
    np.testing.assert_allclose(rs2["sausage"].omegas_imag, [0.05])
    np.testing.assert_allclose(rs2["kink"].omegas_imag, [-0.01])


def test_reads_reference_pickle():
    """The shipped reference outputs load directly (format parity)."""
    import os
    p = ("/root/reference/Slab/Non uniform density/Photospheric/"
         "Example data/width09.pickle")
    if not os.path.exists(p):
        pytest.skip("reference data not mounted")
    rs = load_pickle(p, "width09")
    assert len(rs["sausage"]) == 207
    assert len(rs["kink"]) == 98
