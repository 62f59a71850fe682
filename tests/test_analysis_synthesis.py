"""Analysis (L4), synthesis (L5), viz/VTK (L6) and the native runtime."""
import os

import numpy as np
import pytest

from eigensolver_tpu.analysis import (SpeedWindow, classify, fit_branch,
                                      separate_branches, standard_windows)
from eigensolver_tpu.config import Regime
from eigensolver_tpu.eigenfunctions import RadialEigenfunction
from eigensolver_tpu.roots import RootBranch
from eigensolver_tpu.synthesis import (FieldGrid, boundary_surface,
                                       synthesize, to_cartesian, vorticity_3d)


def _fake_branch():
    # two separated phase-speed branches over a shared k grid
    k = np.linspace(0.5, 3.0, 20)
    v1 = 1.0 + 0.05 * k
    v2 = 2.0 - 0.1 * k
    ks = np.concatenate([k, k])
    omegas = np.concatenate([v1 * k, v2 * k])
    return RootBranch(omegas=omegas, ks=ks)


def test_classify_windows():
    rg = Regime(c_i0=1.0, vA_i0=2.0, c_e=0.5, vA_e=5.0)
    br = _fake_branch()
    out = classify(br, standard_windows(rg))
    # v in [1.025, 1.15] -> slow body window is (cT_i0=0.894, 1.0): branch 1 is
    # above it, in neither slow nor fast(2..5)? fast_body=(2,5): branch2 at k
    # small has v~1.95 not in; so most land in "other"
    total = sum(len(b) for b in out.values())
    assert total == len(br)


def test_separate_branches_finds_two():
    chains = separate_branches(_fake_branch(), v_gap=0.05)
    big = [c for c in chains if len(c) >= 10]
    assert len(big) == 2


def test_fit_branch_recovers_linear_phase_speed():
    k = np.linspace(0.5, 3.0, 20)
    v = 1.0 + 0.05 * k
    bf = fit_branch(RootBranch(omegas=v * k, ks=k), order=1)
    np.testing.assert_allclose(bf(k), v, rtol=1e-10)


def _fake_ef():
    x = np.linspace(0.01, 3.0, 200)
    prof = np.exp(-((x - 0.8) ** 2) / 0.2)
    return RadialEigenfunction(
        omega=1.2, k=1.0, mode=1, x=x, P_T=prof, xi_r=prof * 0.5,
        xi_phi=prof * 0.3, xi_z=prof * 0.1, v_r=-1.2 * prof * 0.5,
        v_phi=-1.2 * prof * 0.3, v_z=-1.2 * prof * 0.1, i_boundary=100)


def test_synthesize_matches_loop_reference():
    """The broadcast synthesis equals the reference's explicit quadruple loop
    (`Gaussian_flow_Cylinder_movie.py:836-846`) on a tiny grid."""
    ef = _fake_ef()
    grid = FieldGrid(t=np.linspace(0, 1, 3), r=np.linspace(0.05, 2.0, 7),
                     theta=np.linspace(0, 2 * np.pi, 5),
                     z=np.linspace(0.01, 2.0, 4))
    out = synthesize(ef, grid)
    fr = np.interp(grid.r, ef.x, ef.xi_r)
    m, k, w = ef.mode, ef.k, ef.omega
    want = np.zeros((3, 7, 5, 4))
    for t in range(3):
        for i in range(7):
            for j in range(5):
                for kk in range(4):
                    want[t, i, j, kk] = (fr[i] * np.cos(m * grid.theta[j])
                                         * np.cos(k * grid.z[kk])
                                         * np.cos(w * grid.t[t]))
    np.testing.assert_allclose(out["xi_r"], want, rtol=1e-12)


def test_cartesian_and_boundary():
    ef = _fake_ef()
    grid = FieldGrid(t=np.linspace(0, 1, 2), r=np.linspace(0.05, 2.0, 30),
                     theta=np.linspace(0, 2 * np.pi, 16),
                     z=np.linspace(0.01, 2.0, 3))
    f = to_cartesian(synthesize(ef, grid), grid)
    assert "v_x" in f and "xi_y" in f and "P_x" in f
    bx, by = boundary_surface(f, grid, r0=1.0, amplitude=0.1)
    assert bx.shape == (2, 16, 3)
    r_b = np.hypot(bx, by)
    assert np.all(np.abs(r_b - 1.0) < 0.3)


def test_vorticity_of_rigid_rotation():
    """curl of v = Omega x r equals 2 Omega."""
    n = 24
    xs = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    Om = 0.7
    vx, vy, vz = -Om * Y, Om * X, np.zeros_like(X)
    wx, wy, wz = vorticity_3d(vx, vy, vz, xs, xs, xs)
    np.testing.assert_allclose(wz, 2 * Om, rtol=1e-10)
    np.testing.assert_allclose(wx, 0.0, atol=1e-12)


def test_vtk_writer_native_matches_python(tmp_path):
    """The C++ serializer produces byte-identical files to the pure-Python
    (reference-format) writer."""
    from eigensolver_tpu.io import vtk as vtk_io
    from eigensolver_tpu.native import vtk_native

    rng = np.random.default_rng(0)
    shape = (5, 4, 3)
    x, y, z = (rng.normal(size=shape).astype(np.float32) for _ in range(3))
    var = {"PT": rng.normal(size=shape).astype(np.float32)}

    p_py = str(tmp_path / "py.vtk")
    with open(p_py, "wb") as f:
        f.write(b"# vtk DataFile Version 3.0 \n")
        f.write(b"vtk output \n")
        f.write(b"BINARY \n")
        f.write(b"DATASET STRUCTURED_GRID \n")
        f.write(f"DIMENSIONS  {shape[0]} {shape[1]} {shape[2]}  \n".encode())
        f.write(f"POINTS {np.prod(shape)} float  \n".encode())
        f.write(vtk_io._points_block(x, y, z))
        f.write(f"\nPOINT_DATA {np.prod(shape)}  ".encode())
        f.write(b"\nSCALARS PT float \n")
        f.write(b"LOOKUP_TABLE default \n")
        f.write(vtk_io._scalar_block(var["PT"]))

    if not vtk_native.available():
        pytest.skip("native library not built")
    p_c = str(tmp_path / "c.vtk")
    vtk_native.write_structured_grid(p_c, x, y, z, var)
    assert open(p_py, "rb").read() == open(p_c, "rb").read()


def test_vtk_python_matches_reference_packing(tmp_path):
    """Point block ordering/endianness == reference struct.pack loop
    (`Export_vtk.py:89-95`)."""
    import struct
    from eigensolver_tpu.io import vtk as vtk_io
    rng = np.random.default_rng(1)
    shape = (3, 2, 2)
    x, y, z = (rng.normal(size=shape).astype(np.float32) for _ in range(3))
    want = b""
    for k in range(shape[2]):
        for j in range(shape[1]):
            for i in range(shape[0]):
                want += struct.pack(">f", x[i, j, k])
                want += struct.pack(">f", y[i, j, k])
                want += struct.pack(">f", z[i, j, k])
    assert vtk_io._points_block(x, y, z) == want


def test_result_store_roundtrip_and_resume(tmp_path):
    from eigensolver_tpu.native.store import ResultStore, read_all, resume_k_done
    p = str(tmp_path / "roots.eigr")
    with ResultStore(p) as st:
        st.append(0, np.array([0.5, 0.5]), np.array([1.1, 1.2]))
        st.append(1, np.array([0.7]), np.array([1.5]), np.array([0.02]))
    modes, ks, om, oi = read_all(p)
    assert list(modes) == [0, 0, 1]
    np.testing.assert_allclose(om, [1.1, 1.2, 1.5])
    np.testing.assert_allclose(oi, [0.0, 0.0, 0.02])
    np.testing.assert_allclose(resume_k_done(p, 0), [0.5])
    # append more after reopen (resume)
    with ResultStore(p) as st:
        st.append(0, np.array([0.9]), np.array([2.0]))
    modes2, ks2, _, _ = read_all(p)
    assert len(modes2) == 4
    np.testing.assert_allclose(resume_k_done(p, 0), [0.5, 0.9])


def test_viz_smoke(tmp_path):
    from eigensolver_tpu.roots import RootSet
    from eigensolver_tpu.viz import dispersion_diagram, eigenfunction_figure

    rg = Regime(c_i0=1.0, vA_i0=2.0, c_e=0.5, vA_e=5.0)
    rs = RootSet({"sausage": _fake_branch(), "kink": _fake_branch()}, "t")
    p1 = dispersion_diagram(rs, rg, path=str(tmp_path / "disp.png"))
    assert os.path.getsize(p1) > 5000
    p2 = eigenfunction_figure([_fake_ef()], path=str(tmp_path / "ef.png"))
    assert os.path.getsize(p2) > 5000


def test_growth_rate_diagram(tmp_path):
    from eigensolver_tpu.roots import RootSet
    from eigensolver_tpu.viz import growth_rate_diagram

    rg = Regime(c_i0=1.0, vA_i0=2.0, c_e=0.5, vA_e=5.0)
    br = _fake_branch()
    im = np.zeros_like(br.omegas)
    im[::3] = 0.05  # some unstable roots
    rs = RootSet({"kink": RootBranch(br.omegas, br.ks, omegas_imag=im)}, "kh")
    p = growth_rate_diagram(rs, rg, path=str(tmp_path / "growth.png"),
                            kh_threshold=1.2)
    assert os.path.getsize(p) > 5000


def test_vorticity_pipeline_and_figure(tmp_path):
    """End-to-end vorticity deliverable: eigenfunction -> Cartesian resample
    -> curl -> cut-plane figure (the reference's
    `Vorticity_gaussian_flow_vert_cut.py` class), with a physics check: a
    kink (m=1) perturbation's vertical vorticity at the axis is finite and
    the pipeline's curl matches a direct np.gradient of the resampled
    velocity (same oracle as test_vorticity_of_rigid_rotation)."""
    from eigensolver_tpu.synthesis import vorticity_pipeline
    from eigensolver_tpu.viz import vorticity_cut_figure

    ef = _fake_ef()
    grid = FieldGrid(t=np.linspace(0, 1, 2), r=np.linspace(0.05, 2.0, 40),
                     theta=np.linspace(0, 2 * np.pi, 32),
                     z=np.linspace(0.01, 2.0, 9))
    xs, ys, zs, vel, vort, PT = vorticity_pipeline(ef, grid, n_xy=40)
    assert vel["v_x"].shape == (40, 40, 9)
    # oracle: the pipeline's curl is exactly vorticity_3d of its own vel
    wx, wy, wz = vorticity_3d(vel["v_x"], vel["v_y"], vel["v_z"], xs, ys, zs)
    np.testing.assert_array_equal(wz, vort[2])
    assert np.all(np.isfinite(wz))
    for cut in ("x", "y", "z"):
        p = tmp_path / f"vort_{cut}.png"
        out = vorticity_cut_figure(xs, ys, zs, vel, vort, PT=PT, cut=cut,
                                   path=str(p))
        assert p.exists() and p.stat().st_size > 0


def test_vorticity_3d_figure(tmp_path):
    """Native 3-D all-components view (`Vorticity_gaussian_flow_3D.py:
    993-1042`): velocity + vorticity 3-D quivers with the advected boundary
    scatter render and save."""
    from eigensolver_tpu.synthesis import vorticity_pipeline
    from eigensolver_tpu.viz import vorticity_3d_figure

    ef = _fake_ef()
    grid = FieldGrid(t=np.linspace(0, 1, 2), r=np.linspace(0.05, 2.0, 30),
                     theta=np.linspace(0, 2 * np.pi, 24),
                     z=np.linspace(0.01, 2.0, 5))
    xs, ys, zs, vel, vort, PT = vorticity_pipeline(ef, grid, n_xy=24)
    fields = to_cartesian(synthesize(ef, grid), grid)
    bx, by = boundary_surface(fields, grid, amplitude=0.2)
    p = tmp_path / "vort3d.png"
    out = vorticity_3d_figure(xs, ys, zs, vel, vort,
                              boundary=(bx[0], by[0]), path=str(p))
    assert p.exists() and p.stat().st_size > 5000


def test_tube_3d_movie(tmp_path):
    """3-D advected-tube-surface movie (`Gaussian_flow_Cylinder_movie.py:
    1166-1232`): plot_surface + two z cross-sections, animated and saved
    (gif fallback when ffmpeg is absent)."""
    from eigensolver_tpu.viz import animate_tube_3d, tube_3d_frame

    ef = _fake_ef()
    grid = FieldGrid(t=np.linspace(0, 1, 3), r=np.linspace(0.05, 2.0, 30),
                     theta=np.linspace(0, 2 * np.pi, 24),
                     z=np.linspace(0.01, 2.0, 5))
    fields = to_cartesian(synthesize(ef, grid), grid)
    bnd = boundary_surface(fields, grid, amplitude=0.2)
    fig = tube_3d_frame(fields, grid, bnd, t_index=0, z_indices=(0, -1))
    assert len(fig.axes) == 3
    import matplotlib.pyplot as plt
    plt.close(fig)
    out = animate_tube_3d(fields, grid, str(tmp_path / "tube.mp4"),
                          boundary=bnd)
    assert os.path.exists(out) and os.path.getsize(out) > 0
