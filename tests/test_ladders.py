"""Omega-ladder construction: band coverage and edge-clustered seeding."""
import dataclasses

import numpy as np

from eigensolver_tpu import cases
from eigensolver_tpu.sweep import build_ladders


def _case(shape):
    c = cases.slab_density_photospheric(width=0.9)
    return dataclasses.replace(
        c, k_values=(0.5, 1.0), speeds=(0.9, 1.0, 1.2),
        grid=dataclasses.replace(c.grid, ladder_shape=shape))


def test_uniform_ladders_cover_bands():
    om, ks = build_ladders(_case("uniform"), n_omega=64)
    om, ks = np.asarray(om), np.asarray(ks)
    assert om.shape == (4, 64)          # 2 k x 2 bands
    # each row spans its band (shrunk edges), monotone increasing
    assert np.all(np.diff(om, axis=1) > 0)
    v = om / ks[:, None]
    assert np.all(v > 0.9) and np.all(v < 1.2)


def test_chebyshev_ladders_cluster_at_band_edges():
    omu, ksu = build_ladders(_case("uniform"), n_omega=128)
    omc, ksc = build_ladders(_case("chebyshev"), n_omega=128)
    omu, omc = np.asarray(omu), np.asarray(omc)
    # same endpoints, same monotonicity
    np.testing.assert_allclose(omc[:, 0], omu[:, 0], rtol=1e-12)
    np.testing.assert_allclose(omc[:, -1], omu[:, -1], rtol=1e-12)
    assert np.all(np.diff(omc, axis=1) > 0)
    # quadratic clustering: near-edge spacing is O(width/n^2), far below
    # the uniform width/n spacing (body-mode families accumulate at the
    # characteristic-speed band edges - SURVEY.md section 7 'root
    # completeness')
    du = np.diff(omu[0])
    dc = np.diff(omc[0])
    assert dc[0] < 0.05 * du[0]
    assert dc[-1] < 0.05 * du[-1]
    # and the interior spacing stays within ~pi/2 of uniform
    assert dc.max() < 1.65 * du.max()


def test_unknown_ladder_shape_raises():
    import pytest

    with pytest.raises(ValueError):
        build_ladders(_case("geometric"), n_omega=16)
