"""Continuum-bracket exclusion: genuine_continua ranges and the search mask.

Inside genuine continua (Doppler Alfven/cusp, shear critical layer) the
discretized operator has a dense resolution-dependent point spectrum;
sign changes there are not converged eigenvalues and must not consume the
bracket budget (measured on cyl_flow_1: ~115 in-band crossings/row vs the
budget of 24, hiding the recheck-confirmed discrete mode at v = 0.9505 -
see PARITY_r02.json cyl_flow_1 MISSED entries and the fix commit).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from eigensolver_tpu import cases
from eigensolver_tpu.equilibrium import genuine_continua
from eigensolver_tpu.search import SearchConfig, search_rows


def test_genuine_continua_cyl_flow():
    case = cases.cylinder_flow_coronal(U=0.05, width=1.0)
    bands = {lab: (lo, hi) for lo, hi, lab in genuine_continua(case)}
    # Doppler cusp band U + cT over the Gaussian layer: U in [0.05/e, 0.05],
    # cT = 2/sqrt(5) = 0.8944 (guard-shrunk edges)
    lo, hi = bands["cusp+"]
    assert 0.91 < lo < 0.915 and 0.944 < hi < 0.9445
    # shear critical layer present; alfven band around vA = 2
    assert "flow" in bands
    assert 2.0 < bands["alfven+"][0] < 2.02
    # mirrored negative bands for the cylinder's negative-v scans
    assert bands["cusp-"][0] < 0 and bands["alfven-"][1] < 0


def test_genuine_continua_excludes_apparent_c_band():
    # slab photospheric: slow body modes live in (cT_i0, c_i0) even though
    # omega = k c(x) crosses there - the c band is an APPARENT singularity
    # (the flux form integrates through it) and must not be excluded
    case = cases.slab_density_photospheric(width=0.9)
    labs = [lab for _, _, lab in genuine_continua(case)]
    assert set(labs) <= {"alfven+", "alfven-", "cusp+", "cusp-"}
    for lo, hi, lab in genuine_continua(case):
        if lab == "cusp+":
            assert hi < 0.886          # below the matched slow-body band
    # no flow -> no critical-layer band
    assert "flow" not in labs


def test_genuine_continua_empty_for_twisted():
    case = cases.cylinder_twisted_photospheric(v_twist=0.1, power=1.0, mode=1)
    assert genuine_continua(case) == []


def test_exclusion_masks_brackets():
    # synthetic dispersion: det = sin(20 pi v) has sign changes everywhere;
    # excluding v in (0.4, 0.6) must remove exactly the brackets there
    class R:
        def __init__(self, det):
            self.det = det
            self.valid = jnp.ones_like(det, bool)
            self.mismatch_pct = jnp.zeros_like(det)

    def disp(om, k):
        return R(jnp.sin(20.0 * jnp.pi * om / k))

    k = jnp.ones((1,))
    om = jnp.linspace(0.30, 0.70, 801)[None, :]
    base = SearchConfig(n_omega=801, max_brackets_per_row=16, n_bisect=30,
                        scan_dtype="float64", polish_dtype="float64",
                        accept_pct=50.0)
    pr0 = search_rows(disp, disp, om, k, base)
    roots0 = np.sort(np.asarray(pr0.omega)[np.asarray(pr0.mask)])
    cfg = dataclasses.replace(base, exclude_v_ranges=((0.4, 0.6),))
    pr1 = search_rows(disp, disp, om, k, cfg)
    roots1 = np.sort(np.asarray(pr1.omega)[np.asarray(pr1.mask)])
    assert len(roots1) < len(roots0)
    assert np.all((roots1 <= 0.4 + 1e-9) | (roots1 >= 0.6 - 1e-9))
    # roots outside the exclusion are preserved bit-for-bit
    keep0 = roots0[(roots0 < 0.4) | (roots0 > 0.6)]
    np.testing.assert_array_equal(np.round(keep0, 12), np.round(roots1, 12))
