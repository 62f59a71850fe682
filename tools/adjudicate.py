#!/usr/bin/env python
"""Per-root adjudication of reference-pickle reproduction misses.

Merges the outputs of tools/reproduce.py (--json) and tools/ref_recheck.py
(--out) into one machine-checked verdict per unmatched reference root:

  matched             (counted from the reproduce report)
  ref_discretization  the reference's OWN scheme, re-run with tight
                      integrator tolerances (solve_ivp at ref_recheck.RTOL,
                      interpolated into the evidence strings, vs the
                      odeint defaults the pickle was generated with), puts
                      the root where WE put it, not where the pickle does:
                      the pickle entry carries the reference's
                      discretization error (recheck verdict `ref_error`).
  ref_irreproducible  the reference's own scheme, run accurately, has no
                      residual dip below 5% anywhere near the shipped value
                      (recheck verdict `irreproducible`) - cf. the 149%
                      residuals documented in REPRODUCTION.md.
  continuum_artifact  the phase speed lies inside a computed continuum band
                      (cT / c / vA ranges swept across the non-uniform
                      layer, or the Doppler-shifted U +- cT flow continuum)
                      where no discrete neutral eigenmode exists; the
                      reference's percent-tolerance acceptance records
                      integrator-noise swaths there
                      (`flow_multiprocessor_coronal.py:668-678`).
  MISSED              everything else: a genuine miss of ours.

Verdict precedence: the independent high-accuracy recheck dominates - a
root the reference's own method reproducibly finds (verdict `genuine`,
with the dip reaching an actual zero: resid <= 0.5%) is MISSED even if it
sits inside a continuum band; a `genuine` whose dip bottoms out ABOVE
0.5% residual inside a band is a critical-layer quasi-mode (a true
discrete root polishes to ~1e-6% under the recheck; a percent-level floor
means the reference accepted a non-zero under its 2.5-3% tolerance) and
counts continuum_artifact. Continuum classification otherwise only
excuses entries the recheck already failed to reproduce, and `both_off`
(a dip exists but matches neither side) is counted as MISSED
conservatively unless inside a band.

Usage:
  python tools/reproduce.py slab_ph_09 ... --json /tmp/repro.json
  python tools/ref_recheck.py /tmp/repro.json --out /tmp/recheck.json
  python tools/adjudicate.py /tmp/repro.json --recheck /tmp/recheck.json \
      --out PARITY_r02.json
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def case_rowfn(target_name):
    """Row-local (k,m)-dependent continuum checker for twisted targets:
    (rowfn, m) where rowfn(k, m) -> (lo, hi) OMEGA band arrays
    (`equilibrium.genuine_continua_rowfn`), or (None, None) for the
    static-band families."""
    from eigensolver_tpu import cases as case_mod
    from eigensolver_tpu.equilibrium import genuine_continua_rowfn
    from tools.reproduce import TARGETS

    spec = TARGETS.get(target_name)
    if spec is None:
        return None, None
    fac, kw = spec["case"]
    case = getattr(case_mod, fac)(**kw)
    fn = genuine_continua_rowfn(case)
    return fn, (case.modes[0] if fn is not None else None)


_ROW_BAND_LABELS = ("Doppler alfven+ (row-local)", "Doppler alfven- (row-local)",
                    "Doppler cusp+ (row-local)", "Doppler cusp- (row-local)")


def in_row_band(omega_ref, k, rowfn, m, pad=0.002):
    """Twisted-family band hit: omega_ref against the (k, m)-local Doppler
    Alfven/cusp ranges, padded by `pad * k` (the same phase-speed pad as
    `in_band`, converted to omega units)."""
    import numpy as np
    lo, hi = rowfn(float(k), float(m))
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    g = pad * abs(k)
    for j in range(len(lo)):
        if lo[j] - g <= omega_ref <= hi[j] + g:
            return _ROW_BAND_LABELS[j]
    return None


def case_continuum_bands(target_name):
    """Continuum (v_lo, v_hi, label) bands for a reproduce.py target."""
    from eigensolver_tpu import cases as case_mod
    from eigensolver_tpu.equilibrium import continuum_bands
    from tools.reproduce import TARGETS

    spec = TARGETS.get(target_name)
    if spec is None:
        return []
    fac, kw = spec["case"]
    case = getattr(case_mod, fac)(**kw)
    bands = [(lo, hi, lab) for (lo, hi, lab) in continuum_bands(case)]
    # Flow-free equilibria are v -> -v symmetric: emit explicit mirrored
    # bands and match SIGNED v below. Flowing cases (signed U +- cT bands,
    # asymmetric) must NOT be mirrored - |v| matching there would let a
    # backward-mode miss be misclassified as continuum_artifact.
    if not any("U" in lab for _, _, lab in bands):
        bands += [(-hi, -lo, lab + " (mirror)") for lo, hi, lab in bands]
    return bands


def in_band(v, bands, pad=0.002):
    """Signed band hit with a small absolute pad: the reference's scan
    resolution (band/35 .. band/90 seed spacing) lets swath entries land
    slightly outside the exact continuum range. Mirror symmetry is handled
    by `case_continuum_bands` emitting explicit negative bands for
    flow-free cases."""
    for lo, hi, lab in bands:
        if lo - pad <= v <= hi + pad:
            return lab
    return None


def _case_key(target_name):
    from tools.reproduce import TARGETS
    spec = TARGETS.get(target_name)
    if spec is None:
        return target_name
    fac, kw = spec["case"]
    return (fac, tuple(sorted(kw.items())))


def _cross_pickle_duplicates(out):
    """Reclassify MISSED entries that are byte-identical across pickles of
    DIFFERENT physics configurations. A configuration-dependent eigenvalue
    cannot coincide to 8 digits across different (v_twist, power) runs -
    e.g. the entry (omega=5.74592, k=4.0) ships verbatim in five twisted
    pickles spanning v_twist 0.005..0.15 and power 0.8..1.25, with only a
    marginal 2.4-3.8% residual dip under the reference's own scheme. Only
    entries whose recheck dip (if any) stays above 1% are touched, so a
    solid independently-confirmed zero can never be reclassified."""
    locs = {}
    for name, tgt in out.items():
        for br, b in tgt["branches"].items():
            for r in b["roots"]:
                if r["verdict"] != "MISSED":
                    continue
                key = (round(r["omega_ref"], 8), round(r["k"], 8))
                locs.setdefault(key, []).append((name, br, r))
    for key, entries in locs.items():
        case_keys = {_case_key(name) for name, _, _ in entries}
        if len(case_keys) < 2:
            continue
        for name, br, r in entries:
            ev = r.get("evidence") or ""
            # structured recheck residual (ADVICE r03: the prose evidence
            # string is not a data channel); skip reclassification when an
            # independent dip reached <= 1% - a solid confirmed zero can
            # never be reclassified
            resid = r.get("resid_hiacc")
            if resid is not None and resid <= 1.0:
                continue
            r["verdict"] = "ref_irreproducible"
            r["evidence"] = (
                f"identical entry (omega={key[0]}, k={key[1]}) ships in "
                f"{len(entries)} pickles of {len(case_keys)} different "
                f"physics configurations - a configuration-independent "
                f"artifact, not an eigenvalue of each; prior evidence: {ev}")
            b = out[name]["branches"][br]
            b["counts"]["MISSED"] -= 1
            b["counts"]["ref_irreproducible"] += 1
    # recompute rates
    for name, tgt in out.items():
        for br, b in tgt["branches"].items():
            c = b["counts"]
            denom = b["total"] - (c["ref_discretization"]
                                  + c["ref_irreproducible"]
                                  + c["continuum_artifact"])
            b["rate_non_artifact"] = (round(c["matched"] / denom, 4)
                                      if denom > 0 else None)
    return out


def _threshold_sensitivity(out, thresholds=(0.25, 0.5, 1.0)):
    """Overall non-artifact match rate as the quasi-mode residual cut varies
    (ADVICE r03: the 0.5% cut the headline rate depends on is a heuristic -
    publish the rate at neighbouring cuts so its leverage is visible).
    Recomputed from the STRUCTURED per-root recheck fields: an in-band
    `genuine` recheck with dip residual > thr counts continuum_artifact,
    <= thr counts MISSED; every other verdict keeps its shipped class."""
    sens = {}
    for thr in thresholds:
        matched = denom = 0
        for name, tgt in out.items():
            if name.startswith("_"):
                continue
            for b in tgt["branches"].values():
                c = b["counts"]
                matched += c["matched"]
                excl = c["ref_discretization"] + c["ref_irreproducible"]
                art = 0
                for r in b["roots"]:
                    if (r.get("recheck_verdict") == "genuine"
                            and r.get("in_band")):
                        art += int((r.get("resid_hiacc") or 0.0) > thr)
                    elif r["verdict"] == "continuum_artifact":
                        art += 1
                denom += b["total"] - excl - art
        sens[f"{thr}%"] = round(matched / denom, 4) if denom else None
    return sens


def adjudicate(repro_reports, recheck_detail, pad=0.002, oracle_detail=None):
    out = {}
    oracle_detail = oracle_detail or {}
    for rep in repro_reports:
        name = rep.get("target")
        if not name or "error" in rep:
            continue
        bands = case_continuum_bands(name)
        rowfn, row_m = case_rowfn(name)
        rc_rows = {}
        for row in recheck_detail.get(name, []):
            key = (row["parity"], round(row["omega_ref"], 10),
                   round(row["k"], 10))
            rc_rows[key] = row
        orc_rows = {}
        for row in oracle_detail.get(name, []):
            key = (row["parity"], round(row["omega_ref"], 10),
                   round(row["k"], 10))
            orc_rows[key] = row
        tgt = {"bands": [[round(lo, 5), round(hi, 5), lab]
                         for lo, hi, lab in bands], "branches": {}}
        for br in ("sausage", "kink"):
            if br not in rep or not isinstance(rep[br], dict):
                continue
            b = rep[br]
            roots = []
            counts = {"matched": b.get("matched", 0),
                      "ref_discretization": 0, "ref_irreproducible": 0,
                      "continuum_artifact": 0, "MISSED": 0}
            mis = b.get("misses") or {}
            for om_r, k, v, om_o, rel in zip(
                    mis.get("omega_ref", []), mis.get("k", []),
                    mis.get("v_phase", []), mis.get("omega_ours", []),
                    mis.get("rel_err", [])):
                rc = rc_rows.get((br, round(om_r, 10), round(k, 10)))
                band = in_band(v, bands, pad)
                if band is None and rowfn is not None:
                    band = in_row_band(om_r, k, rowfn, row_m, pad)
                verdict, why = "MISSED", None
                if rc is not None:
                    rcv = rc["verdict"]
                    if rcv == "genuine" and band and rc["resid_hiacc"] > 0.5:
                        # the hi-acc rerun reproduces a residual DIP at the
                        # shipped location but it bottoms out far above zero
                        # (a true discrete root polishes to ~1e-6%): inside a
                        # continuum band that is a regularisation-dependent
                        # quasi-mode of the reference's adaptive integrator,
                        # not an eigenvalue
                        verdict = "continuum_artifact"
                        why = (f"inside {band}; reference scheme's own dip "
                               f"bottoms at {rc['resid_hiacc']:.3g}% (no "
                               f"zero) - critical-layer quasi-mode")
                    elif rcv == "genuine":
                        verdict = "MISSED"
                        why = (f"reference scheme {rc.get('rtol_note', '')}"
                               f"confirms root "
                               f"(resid {rc['resid_hiacc']:.3g}%, dev_ref "
                               f"{rc.get('dev_ref')})")
                    elif rcv == "ref_error":
                        verdict = "ref_discretization"
                        why = (f"hi-acc rerun of the reference scheme moves "
                               f"the root to {rc['omega_hiacc']:.6g} "
                               f"(= ours to {rc.get('dev_ours')}), "
                               f"{rc.get('dev_ref')} rel from the pickle")
                    elif rcv == "irreproducible":
                        if band:
                            verdict = "continuum_artifact"
                            why = (f"inside {band}; reference's own scheme "
                                   f"has no sub-5% dip (best "
                                   f"{rc['resid_hiacc']:.3g}%)")
                        else:
                            verdict = "ref_irreproducible"
                            why = (f"reference's own scheme "
                                   f"{rc.get('rtol_note', '')}: no "
                                   f"residual dip < 5% near the entry (best "
                                   f"{rc['resid_hiacc']:.3g}%)")
                    else:  # both_off
                        if band:
                            verdict = "continuum_artifact"
                            why = (f"inside {band}; hi-acc dip at "
                                   f"{rc['omega_hiacc']:.6g} matches neither "
                                   f"side (regularisation-dependent)")
                        else:
                            verdict = "MISSED"
                            why = (f"ambiguous: hi-acc dip "
                                   f"{rc['omega_hiacc']:.6g} matches neither "
                                   f"(counted as missed)")
                elif band:
                    verdict = "continuum_artifact"
                    why = f"inside {band}"
                # third-scheme override (tools/oracle_cylflow.py): when an
                # INDEPENDENT scheme - analytic Doppler Edwin-Roberts for
                # the uniform cases, Chebyshev collocation for the
                # non-uniform ones - puts the eigenvalue AT one of our roots
                # and > tol from the shipped value, the entry carries the
                # reference's first-acceptance offset (xi_tol = 6%
                # break-on-accept, `Cylinder_method_flow_testing.py:530`),
                # not a physics miss of ours. Verdict-precedence: only
                # entries still MISSED after the recheck are touched, so a
                # recheck-confirmed genuine miss can never be excused.
                orc = orc_rows.get((br, round(om_r, 10), round(k, 10)))
                if verdict == "MISSED" and orc is not None and \
                        orc.get("verdict") == "ours_confirmed":
                    verdict = "ref_discretization"
                    why = (f"third scheme [{orc['scheme']}] puts the "
                           f"eigenvalue at {orc['omega_oracle']:.6g} = ours "
                           f"(dev {orc['dev_ours']:.2g}) vs "
                           f"{orc['dev_ref']:.2g} rel from the pickle; "
                           f"shipped value sits at "
                           f"{orc.get('resid_at_ref_pct', '?')}% of the "
                           f"reference's 6% acceptance metric"
                           + (f"; prior: {why}" if why else ""))
                counts[verdict] += 1
                roots.append({"omega_ref": om_r, "k": k, "v": v,
                              "omega_ours": om_o, "rel_err": rel,
                              "verdict": verdict, "evidence": why,
                              "oracle": (None if orc is None else
                                         {kk: orc.get(kk) for kk in
                                          ("scheme", "verdict",
                                           "omega_oracle", "dev_ref",
                                           "dev_ours", "resid_at_ref_pct")}),
                              # structured recheck fields (the duplicates
                              # pass and the sensitivity report read these,
                              # NOT the prose evidence string)
                              "resid_hiacc": (rc.get("resid_hiacc")
                                              if rc else None),
                              "recheck_verdict": (rc["verdict"]
                                                  if rc else None),
                              "in_band": bool(band)})
            total = b.get("total", 0)
            excluded = (counts["ref_discretization"]
                        + counts["ref_irreproducible"]
                        + counts["continuum_artifact"])
            denom = total - excluded
            tgt["branches"][br] = {
                "total": total, "counts": counts,
                "median_rel_err": b.get("median_rel_err"),
                "rate_raw": b.get("rate"),
                "rate_non_artifact": (round(counts["matched"] / denom, 4)
                                      if denom > 0 else None),
                "roots": roots,
            }
        out[name] = tgt
    out = _cross_pickle_duplicates(out)
    out["_sensitivity"] = {"quasi_mode_residual_cut":
                           _threshold_sensitivity(out)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("repro_json")
    ap.add_argument("--recheck", default=None)
    ap.add_argument("--oracle", default=None,
                    help="tools/oracle_cylflow.py --out JSON (third-scheme "
                         "arbitration of the cyl_flow family)")
    ap.add_argument("--out", default="PARITY_r02.json")
    ap.add_argument("--pad", type=float, default=0.002)
    args = ap.parse_args()

    reports = json.load(open(args.repro_json))
    recheck = (json.load(open(args.recheck))["detail"]
               if args.recheck else {})
    oracle = (json.load(open(args.oracle))["detail"]
              if args.oracle else {})
    result = adjudicate(reports, recheck, pad=args.pad, oracle_detail=oracle)
    json.dump(result, open(args.out, "w"), indent=1)
    for name, tgt in result.items():
        if name.startswith("_"):
            continue
        for br, b in tgt["branches"].items():
            print(json.dumps({"target": name, "branch": br,
                              "counts": b["counts"],
                              "rate_raw": b["rate_raw"],
                              "rate_non_artifact": b["rate_non_artifact"]}))
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
