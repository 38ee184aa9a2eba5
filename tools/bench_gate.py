"""Bench-artifact gate (VERDICT r6 #5): one number, checked, then pinned.

Round 6 committed BENCH_r06.json at 294.3 s while BASELINE.md narrated a
253.0 s run of the same surface minutes apart — both real under the
documented JVM swing, but a round must have ONE official bench artifact.
This gate runs right after ``bench.py`` inside the closing ritual and:

1. copies the fresh ``BENCH_DETAIL.json`` to ``BENCH_CLOSING_<tag>.json`` —
   the round's canonical idle-host number, the ONLY number BASELINE.md's
   narrative may quote;
2. automates the BASELINE.md outlier rule (a single query >3× its last
   committed time is not believable without a standalone re-time): compares
   per-query timings against the last committed ``BENCH_DETAIL.json``
   (``git show HEAD:BENCH_DETAIL.json``) and EXITS NONZERO on any query
   that got >3× slower while costing ≥1 s (sub-second queries swing freely
   with JVM noise and are exempt). Warm timings are compared when both
   sides have them (less JIT noise), cold otherwise.

Round 9 adds the CROSS-ROUND ledger (VERDICT r8 #8): after the within-round
>3× check, the fresh closing artifact is compared against the PREVIOUS
round's ``BENCH_CLOSING_r(N-1).json`` and the gate exits nonzero on any
query that regressed ≥1.5× round-over-round (warm-vs-warm when both rounds
warmed it, else cold-vs-cold; ≥1 s floor — sub-second timings swing freely
with shared-JVM noise). Adjudicated baseline changes (a stub became a real
implementation, an algorithm was deliberately traded) are declared in
``tools/bench_allowlist.json`` as ``{"<tag>": {"<query>": "<reason>"}}`` —
the allowlist is per-round and explicit, so every regression is either
explained in a committed artifact or fails the ritual.

Round 10 automates the re-time itself (VERDICT r9 #1): BASELINE.md's rule
says a violating timing "is not believable without a standalone re-time",
and round 9 shipped with an unadjudicated violation precisely because that
step was manual.  Now the gate shells out to ``tools/retime.py`` for every
violating query (fresh session, tables warmed, 5 runs, clearCache between,
min of the post-JIT runs) and compares THAT number against the prior
baseline: if the re-time clears the threshold the violation was
sweep-ordering/JVM noise — the verdict and the raw run list are recorded
in the pinned closing artifact under ``"retimed"`` — and only violations
the re-time CONFIRMS fail the ritual.  ``--no-retime`` restores the old
fail-fast behaviour (used by the gate's own tests).

Round 12 makes the re-time verdict THREE-WAY (VERDICT r11 #5): "noise"
is reserved for a re-time that RECOVERS the prior number; a re-time on
the new side of the log-space midpoint √(old·new) REPRODUCES the change
and is "allowlisted" (passes, reason pinned) only when declared in
``tools/bench_allowlist.json`` — else "confirmed" (fails).  Round 11's
containment entry (prior 2.69 s, retimes 6.8–8.2 s reproducing the
adjudicated pair-key constant) carried ``verdict: noise``; that
conflation was the laundering pattern the gate exists to prevent.

Round 12 also adds CODE-HASH-ATTESTED host-shift adjudication: every
closing carries the package sha256 stamp and a host canary.  When the
previous closing's stamp EQUALS the fresh one and the per-query ratio
distribution is a tight uniform shift (median ≥ 1.15, p75/p25 ≤ 1.4 over
≥ 20 queries), the same bytes produced both plans — the shift is the
host, and cross-round flags it explains (ratio ≤ median × 1.25) pin
verdict "host-shift" without burning a retime each.  Flags beyond the
explained band still retime under the three-way rule.

Usage: python tools/bench_gate.py <round-tag> [--no-retime]   (after bench.py)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OUTLIER_FACTOR = 3.0
CROSS_ROUND_FACTOR = 1.5
MIN_ABS_SEC = 1.0


def previous_closing(tag: str) -> tuple[str, dict] | None:
    """The newest committed BENCH_CLOSING_r*.json with a round number below
    ``tag``'s (not simply N-1: a round may legitimately not pin one)."""
    m = re.fullmatch(r"r(\d+)", tag)
    if not m:
        return None
    cur = int(m.group(1))
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(REPO_ROOT, "BENCH_CLOSING_r*.json")):
        pm = re.fullmatch(r"BENCH_CLOSING_r(\d+)\.json", os.path.basename(p))
        if pm and int(pm.group(1)) < cur:
            if best is None or int(pm.group(1)) > best[0]:
                best = (int(pm.group(1)), p)
    if best is None:
        return None
    with open(best[1]) as f:
        return f"r{best[0]:02d}", json.load(f)


def retime_verdicts(
    names: list[str], sf: float | None
) -> dict[str, dict]:
    """Standalone re-time for violating queries (tools/retime.py): one
    subprocess, fresh Spark session, tables warmed, 5 runs each with
    clearCache between.  Returns {} on any failure — callers treat a
    missing verdict as an unadjudicated (i.e. still failing) violation.

    The sf_dir MUST match the scale factor of the flagged bench run
    (round-11 ADVICE closure): a SPARK_GRAFT_SF_DIR pointing at a smaller
    corpus would trivially clear every threshold, silently laundering a
    real regression as noise — so an env override is honored only when
    its directory name carries the same sf, and is otherwise discarded
    with a warning."""
    expected = f"/root/testdata/sf{sf:g}" if sf else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR") or expected
    if sf_dir and expected and sf is not None:
        base = os.path.basename(os.path.normpath(sf_dir))
        if base != f"sf{sf:g}":
            print(
                f"retime: SPARK_GRAFT_SF_DIR={sf_dir} does not match the "
                f"bench's sf{sf:g} — using {expected} (a mismatched retime "
                "cannot adjudicate this run's violations)"
            )
            sf_dir = expected
    if not names or sf_dir is None:
        return {}
    try:
        out = subprocess.check_output(
            [
                sys.executable,
                os.path.join(REPO_ROOT, "tools", "retime.py"),
                *names,
                "--sf-dir",
                sf_dir,
                "--json",
            ],
            cwd=REPO_ROOT,
            text=True,
            stderr=subprocess.DEVNULL,
            timeout=3600,
        )
        return json.loads(out.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001
        print(f"retime subprocess failed ({e}) — violations stand")
        return {}


def uniform_shift(fresh: dict, prev_bench: dict) -> dict | None:
    """Code-hash-attested uniform host-shift detector (round 12).

    Premise: when two closings carry EQUAL package code-hash stamps, the
    same bytes produced both runs' plans — a per-query ratio distribution
    that is (a) shifted (median ≥ 1.15) and (b) tight (p75/p25 ≤ 1.4)
    cannot be an engine change and is attested host drift.  (Assumes the
    driver-managed sf data and local[CPUS] shape are round-stable, which
    they are by the test protocol; session config lives in the package
    and is covered by the stamp.)

    Returns {"median": r, "p25": ..., "p75": ..., "n": ...} when the
    attestation holds, else None.  Requires ≥ 20 common queries ≥ 0.5 s
    so the statistics mean something.  Used ONLY to adjudicate
    cross-round flags whose ratio the shift explains (≤ median × 1.25);
    larger flags still go to the standalone retime."""
    if not fresh.get("code") or fresh.get("code") != prev_bench.get("code"):
        return None
    ratios = []
    for name, old in prev_bench.get("queries", {}).items():
        new = fresh.get("queries", {}).get(name)
        if new and old and new > 0 and old >= 0.5:
            ratios.append(new / old)
    if len(ratios) < 20:
        return None
    ratios.sort()

    def q(p: float) -> float:
        return ratios[min(len(ratios) - 1, int(p * len(ratios)))]

    med, p25, p75 = q(0.5), q(0.25), q(0.75)
    if med < 1.15 or p75 / p25 > 1.4:
        return None
    return {
        "median": round(med, 3),
        "p25": round(p25, 3),
        "p75": round(p75, 3),
        "n": len(ratios),
    }


def load_allowlist(tag: str) -> dict[str, str]:
    p = os.path.join(REPO_ROOT, "tools", "bench_allowlist.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f).get(tag, {})


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--no-retime"]
    do_retime = "--no-retime" not in sys.argv[1:]
    tag = argv[0] if argv else "rXX"
    detail_path = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        fresh = json.load(f)

    # Host-speed canary at pin time (round 12 — the falsifiability
    # instrument for drift adjudication): a fixed code-version-independent
    # CPU workload recorded INSIDE the closing artifact, so cross-round
    # bench ratios decompose into host ratio × engine ratio with committed
    # numbers on both sides.  Recorded evidence only — NEVER used to
    # normalize the gate's thresholds (that would launder real regressions
    # behind a noisy divisor).
    try:
        sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
        from host_canary import canary

        fresh["canary"] = canary()
        print(f"host canary at pin time: {json.dumps(fresh['canary'])}")
    except Exception as e:  # noqa: BLE001
        print(f"host canary failed ({e}) — pinning without it")
    try:
        from scaling_sweep import code_hash

        # package provenance stamp: two closings with EQUAL stamps that
        # differ by a uniform per-query ratio shift are attested host
        # drift — the same bytes cannot produce a different plan
        fresh["code"] = code_hash()
    except Exception as e:  # noqa: BLE001
        print(f"code-hash stamp failed ({e}) — pinning without it")

    closing_path = os.path.join(REPO_ROOT, f"BENCH_CLOSING_{tag}.json")
    with open(closing_path, "w") as f:
        json.dump(fresh, f, indent=1, sort_keys=True)
    print(
        f"pinned {closing_path}: total {fresh['value']}s over "
        f"{fresh['n_queries']} queries (sf{fresh['sf']}) — BASELINE.md must "
        "quote THIS number"
    )

    try:
        committed = json.loads(
            subprocess.check_output(
                ["git", "show", "HEAD:BENCH_DETAIL.json"],
                cwd=REPO_ROOT,
                text=True,
            )
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        print("no committed BENCH_DETAIL.json to compare against — skipping "
              "outlier gate")
        committed = {"queries": {}, "warm_queries": {}}

    def pick(d: dict, name: str, tier: str) -> float | None:
        v = d.get(tier, {}).get(name, -1.0)
        return v if v and v > 0 else None

    outliers = []
    for name in fresh.get("queries", {}):
        # like-for-like ONLY: warm-vs-warm when BOTH runs warmed this query
        # (the r07 false alarm: a HEADLINE-only warm pass compared fresh
        # COLD against the previous run's full-warm numbers and flagged
        # pure first-run JIT), else cold-vs-cold.
        new = pick(fresh, name, "warm_queries")
        old = pick(committed, name, "warm_queries")
        tier = "warm"
        if new is None or old is None:
            new = pick(fresh, name, "queries")
            old = pick(committed, name, "queries")
            tier = "cold"
        if new is None or old is None:
            continue
        if new >= MIN_ABS_SEC and new > OUTLIER_FACTOR * old:
            outliers.append((name, old, new, tier))

    # -------- cross-round ledger (VERDICT r8 #8) --------
    prev = previous_closing(tag)
    prev_tag, prev_bench = prev if prev else (None, None)
    if prev and prev_bench.get("canary") and fresh.get("canary"):
        pc, fc = prev_bench["canary"], fresh["canary"]
        ratios = {
            k: round(fc[k] / pc[k], 3)
            for k in fc
            if k in pc and pc[k] > 0
        }
        print(f"host canary vs {prev_tag}: ratios {json.dumps(ratios)} "
              "(>1 = this host is slower; context for adjudication, not a "
              "threshold input)")
    allow = load_allowlist(tag)
    regressions, allowed, host_shifted = [], [], {}
    shift = uniform_shift(fresh, prev_bench) if prev else None
    if shift:
        print(f"attested uniform host shift vs {prev_tag}: "
              f"{json.dumps(shift)} (equal code stamps — same bytes, so "
              "the shift is the host; flags it explains are adjudicated "
              "'host-shift' without retime)")
    if prev:
        for name in fresh.get("queries", {}):
            new = pick(fresh, name, "warm_queries")
            old = pick(prev_bench, name, "warm_queries")
            tier = "warm"
            if new is None or old is None:
                new = pick(fresh, name, "queries")
                old = pick(prev_bench, name, "queries")
                tier = "cold"
            if new is None or old is None:
                continue  # new query this round — no prior baseline
            if new >= MIN_ABS_SEC and new >= CROSS_ROUND_FACTOR * old:
                if name in allow:
                    allowed.append((name, old, new, tier, allow[name]))
                elif shift and new <= shift["median"] * 1.25 * old:
                    host_shifted[name] = {
                        "prior": old, "sweep": new, "tier": tier,
                        "ratio": round(new / old, 3),
                        "verdict": "host-shift",
                    }
                else:
                    regressions.append((name, old, new, tier))
        for name, old, new, tier, why in allowed:
            print(f"  allowlisted ({tag}): {name} {old:.2f}s -> {new:.2f}s "
                  f"({tier}) — {why}")
        for name, e in host_shifted.items():
            print(f"  host-shift ({tag}): {name} {e['prior']:.2f}s -> "
                  f"{e['sweep']:.2f}s ({e['tier']}, ratio {e['ratio']} ≤ "
                  f"median {shift['median']} × 1.25)")

    # -------- standalone re-time adjudication (VERDICT r9 #1) --------
    # One retime pass over the union of violators; a violation whose
    # post-JIT min clears its threshold was sweep-ordering/JVM noise — the
    # raw evidence is recorded INSIDE the pinned closing artifact so the
    # adjudication is a committed fact, not a narrative claim.
    verdicts: dict[str, dict] = {}
    if do_retime and (outliers or regressions):
        names = sorted({n for n, *_ in outliers}
                       | {n for n, *_ in regressions})
        print(f"re-timing {len(names)} violating queries standalone: "
              f"{', '.join(names)}")
        verdicts = retime_verdicts(names, fresh.get("sf"))

    def adjudicate(
        name: str, old: float, new: float, factor: float, tier: str
    ) -> dict | None:
        v = verdicts.get(name)
        if not v or "warm_min" not in v or "min" not in v:
            return None
        # like-for-like adjudication (round-11 ADVICE closure): a COLD-tier
        # violation must be cleared by the retime's overall min (which
        # includes the cold first run) — clearing a cold flag with the
        # post-JIT warm_min would excuse genuine first-run regressions.
        # The compared tier is recorded in the pinned entry.
        basis = v["warm_min"] if tier == "warm" else v["min"]
        cleared = basis < MIN_ABS_SEC or basis < factor * old
        # Three-way verdict (VERDICT r11 #5): "noise" means the standalone
        # re-time RECOVERS the prior number.  A re-time that lands on the
        # new (sweep) side of the log-space midpoint √(old·new) REPRODUCES
        # the change — that is a real retiming even when it slips under the
        # loose factor threshold (r11's containment: prior 2.69 s, sweep
        # 14.3 s cold, retimes 6.8–8.2 s — reproduced, not noise).  A real
        # change passes only via an explicit tools/bench_allowlist.json
        # entry ("allowlisted", reason recorded in the pinned artifact);
        # otherwise it is "confirmed" and fails the ritual.
        reproduces_new = (
            basis >= MIN_ABS_SEC
            and new > old
            and basis * basis >= old * new
        )
        if not cleared or reproduces_new:
            verdict = "allowlisted" if name in allow else "confirmed"
        else:
            verdict = "noise"
        entry = {**v, "prior": old, "threshold": factor, "tier": tier,
                 "basis": basis, "verdict": verdict}
        if verdict == "allowlisted":
            entry["reason"] = allow[name]
        return entry

    retimed: dict[str, dict] = {}
    still_out = []
    for name, old, new, tier in outliers:
        adj = adjudicate(name, old, new, OUTLIER_FACTOR, tier)
        if adj and adj["verdict"] in ("noise", "allowlisted"):
            retimed[name] = adj
            print(f"  retime-adjudicated (within-round, {tier}): {name} "
                  f"{old:.2f}s -> {new:.2f}s sweep, {adj['basis']:.2f}s "
                  f"standalone — {adj['verdict']}")
        else:
            still_out.append((name, old, new))
    still_reg = []
    for name, old, new, tier in regressions:
        adj = adjudicate(name, old, new, CROSS_ROUND_FACTOR, tier)
        if adj and adj["verdict"] in ("noise", "allowlisted"):
            retimed[name] = adj
            print(f"  retime-adjudicated (cross-round, {tier}): {name} "
                  f"{old:.2f}s -> {new:.2f}s sweep, {adj['basis']:.2f}s "
                  f"standalone — {adj['verdict']}")
        else:
            still_reg.append((name, old, new, tier))

    if retimed or host_shifted or shift:
        if retimed:
            fresh["retimed"] = retimed
        if shift:
            fresh["host_shift"] = {**shift, "queries": host_shifted}
        with open(closing_path, "w") as f:
            json.dump(fresh, f, indent=1, sort_keys=True)

    if still_out:
        print(f"BENCH GATE FAILED — {len(still_out)} queries >"
              f"{OUTLIER_FACTOR}× their last committed time (re-time "
              "confirmed or unavailable):")
        for name, old, new in sorted(still_out, key=lambda x: -x[2]):
            print(f"  {name}: {old:.2f}s -> {new:.2f}s")
        return 1
    print("bench gate: no >3× outliers vs last committed BENCH_DETAIL.json")

    if prev is None:
        print("no previous BENCH_CLOSING_r*.json — skipping cross-round gate")
        return 0
    if still_reg:
        print(f"BENCH GATE FAILED — {len(still_reg)} unexplained "
              f"≥{CROSS_ROUND_FACTOR}× regressions vs {prev_tag} (re-time "
              "confirmed or unavailable):")
        for name, old, new, tier in sorted(still_reg, key=lambda x: -x[2]):
            print(f"  {name}: {old:.2f}s -> {new:.2f}s ({tier})")
        print("if the new baseline is adjudicated real, declare it in "
              f"tools/bench_allowlist.json under {tag!r} with the reason")
        return 1
    print(f"bench gate: no unexplained ≥{CROSS_ROUND_FACTOR}× regressions "
          f"vs {prev_tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
