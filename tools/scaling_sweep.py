"""Scaling-curve measurement for the heavy-tail operators (VERDICT r6 #1).

Runs each swept query at several scale factors (the generated
``.scaledata/sf*`` twins — see tools/gen_scale_data.py) and fits the
log-log slope of wall time vs driving-table rows: the measured scaling
exponent. A capped/banded/bucketed operator must stay ~linear
(exponent ≤ ~1.2); anything near 2 means a pair expansion escaped its cap
and would not survive 100 TB.

Protocol (the BASELINE.md discipline): one un-timed warm-up execution per
(query, sf) so plan codegen/JIT is never attributed to the data, then
``--runs`` timed noop-sink executions keeping the MIN; caches cleared
between runs. Times are warm steady-state by construction — the quantity
that scales with data, not with first-run compilation.

Usage:
  python tools/scaling_sweep.py [--root /root/repo/.scaledata]
      [--sfs 0.1 0.3 1] [--runs 2] [--out SCALING.json] [query ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from cdmx_airquality_etl_spark import QUERIES  # noqa: E402
from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
from cdmx_airquality_etl_spark.sources.parquet import load_table  # noqa: E402

# query -> the table whose row count drives its cost (the x-axis)
DEFAULT_SWEEP = {
    "q_dedup_fuzzy": "documents",
    "q_dedup_containment": "documents",
    "q_dedup_minhash": "documents",
    "q_dedup_weighted": "documents",
    "q_dedup_text_clusters": "documents",
    "q_dedup_simhash": "documents",
    "q_lsh_planner": "documents",
    "q_curation_pipeline": "documents",
    "q_pagerank": "lineitem",
    "q_triangle_count": "lineitem",
    "q_shortest_path": "lineitem",
    "q_bootstrap_ci": "lineitem",
    "q_knn_graph": "embeddings",
    "q_dedup_semantic": "embeddings",
    "q_similarity_ann_ivfpq": "embeddings",
    "q_similarity_ann_ivfpq_probe": "embeddings",
    "q_join_skew_salted": "orders",
    "q_sessionize": "events",
    # round-8 additions (VERDICT r7 #3): the 10-12-exchange tier that was
    # never swept — every 100 TB claim is a measurement, uniformly
    "q_label_propagation": "lineitem",
    "q_source_skew_tv": "documents",
    "q_assortativity": "lineitem",
    "q_spearman_matrix": "events",
    "q_cohen_kappa": "documents",
    "q_kaplan_meier": "events",
    "q_funnel_windowed": "events",
}


def code_hash() -> str:
    """Provenance stamp for measured points (round-11 ADVICE: --merge-sf's
    soundness rested entirely on caller discipline): sha256 over the
    package's .py file bytes, path-sorted.  Any engine edit — even one
    that 'should not' change a plan — changes the stamp, so a
    mixed-version merge is detectable instead of silently fabricating a
    slope."""
    import hashlib

    pkg = os.path.join(REPO_ROOT, "cdmx_airquality_etl_spark")
    h = hashlib.sha256()
    for root, _dirs, files in sorted(os.walk(pkg)):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            p = os.path.join(root, name)
            h.update(os.path.relpath(p, pkg).encode())
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:12]


def check_merge_provenance(q: str, entry: dict, stamp: str) -> None:
    """Refuse a --merge-sf when any prior point of ``q`` carries a
    provenance stamp differing from the current tree's; warn (and defer
    to the caller's code-unchanged assertion) for pre-stamp legacy
    points."""
    for k, pt in entry.get("per_sf", {}).items():
        prior_code = pt.get("code")
        if prior_code is None:
            print(
                f"{q} sf{k}: prior point has no provenance stamp "
                "(pre-round-12) — merging on the caller's code-unchanged "
                "assertion",
                flush=True,
            )
        elif prior_code != stamp:
            raise SystemExit(
                f"--merge-sf refused for {q}: prior sf{k} point was "
                f"measured at package hash {prior_code}, current tree is "
                f"{stamp} — the execution code changed, so a merged curve "
                "would mix code versions; re-measure the full sf range "
                "instead"
            )


def fit_exponent(ns: list[int], ts: list[float]) -> float:
    """Least-squares slope of log(t) on log(n)."""
    xs = [math.log(n) for n in ns]
    ys = [math.log(t) for t in ts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--root", default=os.path.join(REPO_ROOT, ".scaledata"))
    ap.add_argument("--sfs", nargs="+", type=float, default=[0.1, 0.3, 1.0])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "SCALING.json"))
    ap.add_argument(
        "--merge-sf",
        action="store_true",
        help="merge the fresh per-sf points into a query's EXISTING entry "
        "and refit the exponent on the union, instead of replacing the "
        "entry. ONLY sound when the query's execution code is unchanged "
        "since the prior points were measured — enforced via the per-point "
        "'code' provenance stamp (package sha256 at measurement time): the "
        "merge REFUSES when a prior point's stamp differs from the current "
        "tree. Points predating the stamp (legacy) merge with a warning — "
        "there the caller still asserts code-unchanged. Used to extend a "
        "committed curve by one decade without paying the full re-measure.",
    )
    args = ap.parse_args()

    sweep = {
        q: DEFAULT_SWEEP.get(q, "documents")
        for q in (args.queries or DEFAULT_SWEEP)
    }
    spark = get_spark("scaling-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    sf_dirs = {sf: os.path.join(args.root, f"sf{sf:g}") for sf in args.sfs}
    rows: dict[float, dict[str, int]] = {}
    for sf, d in sf_dirs.items():
        rows[sf] = {
            t: load_table(spark, d, t).count()
            for t in set(sweep.values())
        }

    # MERGE semantics + incremental writes (round-9 lesson: a crash at op
    # 6 of 23 used to lose the whole sweep — results now land after every
    # operator, and sweeping a subset updates only those entries)
    results: dict[str, dict] = {}
    prior_sfs: list[str] = []
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prior = json.load(f)
            results.update(prior.get("results", {}))
            prior_sfs = prior.get("sfs", [])
        except (json.JSONDecodeError, OSError):
            pass

    def write_out() -> None:
        out = {
            "protocol": (
                f"min of {args.runs} warm noop-sink runs per (query, sf) "
                "after an un-timed warm-up; exponent = least-squares slope "
                "of log(sec) vs log(driving-table rows); entries merge "
                "across sweep invocations — each result's per_sf keys are "
                "the range IT was fitted on"
            ),
            "sfs": sorted(
                set(prior_sfs) | {f"{sf:g}" for sf in args.sfs}, key=float
            ),
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    stamp = code_hash()
    for q, table in sweep.items():
        if args.merge_sf and q in results:
            check_merge_provenance(q, results[q], stamp)
        per_sf: dict[str, dict] = {}
        for sf in args.sfs:
            d = sf_dirs[sf]
            # warm-up: plan + codegen, un-timed
            QUERIES[q](spark, d).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            best = math.inf
            for _ in range(args.runs):
                t0 = time.time()
                QUERIES[q](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            per_sf[f"{sf:g}"] = {
                "sec": round(best, 3),
                "rows": rows[sf][table],
                "code": stamp,
            }
            print(
                f"{q} sf{sf:g}: {best:.2f}s ({rows[sf][table]} {table} rows)",
                flush=True,
            )
        if args.merge_sf and q in results:
            merged = dict(results[q].get("per_sf", {}))
            merged.update(per_sf)
            per_sf = merged
        keys = sorted(per_sf, key=float)
        ns = [per_sf[k]["rows"] for k in keys]
        ts = [per_sf[k]["sec"] for k in keys]
        exp = fit_exponent(ns, ts)
        results[q] = {
            "driving_table": table,
            "per_sf": per_sf,
            "exponent": round(exp, 3),
        }
        print(f"{q}: exponent {exp:.3f}", flush=True)
        write_out()

    print(json.dumps({q: r["exponent"] for q, r in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
