#!/usr/bin/env python
"""Assemble recheck coverage for a breadth reproduce report from prior
recheck artifacts, and emit the residual misses that still need a fresh
`ref_recheck` run.

The independent arbiter's verdict for a pickle entry depends on (target,
parity, omega_ref, k) plus OUR nearby-root window. Entries whose window is
unchanged between rounds keep their verdict, so a full-breadth
re-adjudication does not need to re-run the (CPU-hours) recheck on every
miss - only on entries with no prior row, or whose prior verdict could
flip with a changed window (`both_off`/`irreproducible` rows are re-judged
from their recorded dip against the NEW window; `genuine`/`ref_error`
rows depend only on the dip vs the pickle and carry over verbatim).

Usage:
  python tools/recheck_merge.py artifacts/repro_r05.json \
      --prior artifacts/recheck_r05_cylflow.json artifacts/recheck_r04_part1.json ... \
      --out artifacts/recheck_r05_merged.json \
      --todo artifacts/repro_r05_todo.json
"""
import argparse
import json
import sys

import numpy as np


def rejudge(row, window, tol):
    """Re-derive the verdict of a prior recheck row against OUR new window
    (same rule as ref_recheck.recheck_miss's tail)."""
    om_star = row.get("omega_hiacc")
    r_star = row.get("resid_hiacc", np.inf)
    out = dict(row)
    ours_list = [o for o in (window or []) if o is not None]
    if ours_list:
        out["omega_ours"] = ours_list[0]
    if om_star is None or (r_star is not None and r_star > 5.0):
        out["verdict"] = "irreproducible"
        return out
    om_ref = row["omega_ref"]
    dev_ref = abs(om_star - om_ref) / abs(om_ref)
    dev_ours = (min(abs(om_star - o) / abs(om_star) for o in ours_list)
                if ours_list else np.inf)
    if dev_ours < tol <= dev_ref:
        out["verdict"] = "ref_error"
    elif dev_ref < tol:
        # closer-side rule when BOTH are inside tolerance (see
        # ref_recheck.recheck_miss - kept identical)
        out["verdict"] = ("ref_error"
                          if dev_ours < 0.5 * dev_ref else "genuine")
    else:
        out["verdict"] = "both_off"
    out["dev_ref"] = round(dev_ref, 6)
    out["dev_ours"] = None if not np.isfinite(dev_ours) else round(dev_ours, 6)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("repro_json")
    ap.add_argument("--prior", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--todo", default=None,
                    help="write a reproduce-style report holding only the "
                         "misses with no prior recheck row (feed to "
                         "ref_recheck.py)")
    ap.add_argument("--tol", type=float, default=3e-3)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    sys.path.insert(0, "tools")
    from reproduce import TARGETS as _T

    prior = {}
    for fn in args.prior:
        try:
            detail = json.load(open(fn))["detail"]
        except Exception as e:
            print(f"# skip {fn}: {e}", file=sys.stderr)
            continue
        for tname, rows in detail.items():
            for row in rows:
                key = (tname, row["parity"], round(row["omega_ref"], 8),
                       round(row["k"], 8))
                # later files win (pass newest last)
                prior[key] = row

    reports = json.load(open(args.repro_json))
    merged = {}
    todo = []
    n_hit = n_rejudged = n_missing = 0
    for rep in reports:
        name = rep.get("target")
        if not name or "error" in rep:
            continue
        tol = _T.get(name, {}).get("tol", args.tol)
        rows_out = []
        todo_rep = {"target": name}
        any_todo = False
        for br in ("sausage", "kink"):
            mis = rep.get(br, {}).get("misses")
            if not mis:
                continue
            todo_mis = {k: [] for k in ("omega_ref", "k", "v_phase",
                                        "rel_err", "omega_ours",
                                        "omega_ours_window")}
            wins = mis.get("omega_ours_window") or [None] * len(mis["k"])
            nears = mis.get("omega_ours") or [None] * len(mis["k"])
            for i, (om_r, k) in enumerate(zip(mis["omega_ref"], mis["k"])):
                # window fallback = the report's nearest root: windows only
                # list our roots within 2.5% of the pickle entry, but the
                # dip can sit farther out (same fallback as
                # ref_recheck.recheck_miss's `win if win else om_o`)
                if not wins[i] and nears[i] is not None:
                    wins[i] = [nears[i]]
                row = prior.get((name, br, round(om_r, 8), round(k, 8)))
                if row is None:
                    n_missing += 1
                    for kk in todo_mis:
                        src = mis.get(kk)
                        todo_mis[kk].append(src[i] if src else None)
                    any_todo = True
                    continue
                # ALWAYS re-judge from the recorded dip against the NEW
                # window: a prior `ref_error` depends on the old window
                # (our roots may have moved between rounds), while `genuine`
                # (dip == pickle) is window-independent and re-derives to
                # itself. Only the expensive dip *location* is reused.
                row = rejudge(row, wins[i], tol)
                n_rejudged += 1
                rows_out.append(row)
            if any(todo_mis["k"]):
                todo_rep[br] = {"misses": todo_mis}
        merged[name] = rows_out
        if any_todo:
            todo.append(todo_rep)

    json.dump({"summary": {}, "detail": merged}, open(args.out, "w"))
    print(f"# prior rows kept {n_hit}, re-judged {n_rejudged}, "
          f"missing {n_missing}", file=sys.stderr)
    if args.todo:
        json.dump(todo, open(args.todo, "w"))
        print(f"# wrote {args.todo} ({sum(1 for _ in todo)} targets with "
              f"uncovered misses)", file=sys.stderr)


if __name__ == "__main__":
    main()
