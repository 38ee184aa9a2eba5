"""Rotating fresh-process oracle slice (VERDICT r10 #6).

The driver's CORRECTNESS sample has drawn the SAME 50 queries every round
since r07, so ~261 queries (the whole relational core among them) have not
had a DRIVER-side check in many rounds. The committed full-surface sweeps
cover them, but those share one long-lived JVM — a bug that only bites in
a fresh session (registration order, codegen cache, session-state leakage)
would hide. This tool hash-verifies a deterministic ROTATING slice of the
registry per round in a FRESH process (its own Spark session via
tools/check_oracle.py), so every query gets a fresh-process differential
check at least every ⌈311/25⌉ ≈ 13 rounds.

Rotation is pure arithmetic on the round number over the sorted registry —
no state file, reproducible by the judge: slice r starts at
((r − 11) · SLICE) mod N over sorted names (anchored so round 11 starts
at 0).

Usage: python tools/sample_rotate.py <round-number> [--sf-dir DIR] [--out F]
Writes ROTATE_r{N}.json {round, start, queries, ok, seconds, log_tail}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SLICE = 25
ANCHOR_ROUND = 11  # round 11 starts the rotation at index 0


def slice_for_round(names: list[str], rnd: int) -> list[str]:
    n = len(names)
    start = ((rnd - ANCHOR_ROUND) * SLICE) % n
    picked = [names[(start + i) % n] for i in range(min(SLICE, n))]
    return picked


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from cdmx_airquality_etl_spark.registry import QUERIES

    names = sorted(QUERIES)
    picked = slice_for_round(names, args.round)
    out_path = args.out or os.path.join(
        REPO_ROOT, f"ROTATE_r{args.round:02d}.json"
    )
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "tools", "check_oracle.py"),
            args.sf_dir,
            *picked,
        ],
        cwd=REPO_ROOT,
        text=True,
        capture_output=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-(SLICE + 3):])
    ok = proc.returncode == 0 and "all queries match the oracle" in proc.stdout
    with open(out_path, "w") as f:
        json.dump(
            {
                "round": args.round,
                "sf_dir": args.sf_dir,
                "start": ((args.round - ANCHOR_ROUND) * SLICE) % len(names),
                "n_registry": len(names),
                "queries": picked,
                "ok": ok,
                "seconds": round(time.time() - t0, 1),
                "log_tail": tail,
            },
            f,
            indent=1,
        )
    print(f"{'OK' if ok else 'FAILED'} rotating slice round {args.round}: "
          f"{len(picked)} queries in {time.time() - t0:.0f}s -> {out_path}")
    if not ok:
        print(tail)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
