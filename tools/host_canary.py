"""Deterministic host-speed canary (round 12 — the falsifiability
instrument VERDICT r11's drift adjudication said was missing).

Rounds 10→11 lost ~1.8× of bench throughput to what per-query retime
evidence said was HOST drift (uniform multiplicative shift, VM restart
observed, no hot-path code changes) — but the claim was unfalsifiable:
nothing in the pinned artifacts measured the host itself.  This canary
is a fixed, code-version-independent CPU workload whose wall time scales
ONLY with host speed.  The bench gate runs it at pin time and records it
inside the closing artifact, so any future cross-round bench ratio can
be decomposed into host-speed ratio × engine ratio with committed
numbers on both sides.

Components (each the min of ``reps`` runs — min is the noise-robust
statistic under transient contention):

- ``sha256_sec``    — single-thread hashlib chain over a 1 MiB buffer
                      (fixed-function CPU throughput; immune to numpy /
                      BLAS build differences)
- ``pyloop_sec``    — a pure-Python arithmetic loop (interpreter +
                      branch-heavy integer work, the Python-side profile)
- ``npsort_sec``    — sort + elementwise ufuncs on a fixed-seed 4M array
                      (single-threaded numpy: memory bandwidth + SIMD)
- ``mt_sha256_sec`` — the sha256 chain split across 32 GIL-releasing
                      threads (multicore throughput, the local[32]
                      profile; a hypervisor stealing cores shows here
                      while leaving the single-thread numbers intact)

(A BLAS matmul component was tried first and REJECTED: min-of-5 swung
2× run-to-run on the very host this tool exists to characterize —
multi-threaded BLAS scheduling is itself too noisy to be a ruler.)

The canary deliberately measures the HOST, not the engine: no Spark, no
parquet, no repo imports.  It is NOT used to normalize gate thresholds
(that would launder real regressions behind a noisy divisor) — it is
recorded evidence for the adjudication narrative.

Usage: python tools/host_canary.py   (one JSON line on stdout)
"""

from __future__ import annotations

import hashlib
import json
import time

import numpy as np


def _best(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _sha256() -> None:
    buf = b"\x00" * (1 << 20)
    for _ in range(512):
        buf = hashlib.sha256(buf).digest() * (1 << 15)  # back to 1 MiB


def _pyloop() -> None:
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    assert acc > 0


def _npsort() -> None:
    rng = np.random.default_rng(12345)
    a = rng.random(4_000_000)
    b = np.sort(a)
    c = np.sqrt(b) + np.log1p(b)
    assert float(c[0]) >= 0.0


def _mt_sha256() -> None:
    from concurrent.futures import ThreadPoolExecutor

    def chain(_):
        buf = b"\x00" * (1 << 20)
        for _ in range(96):
            buf = hashlib.sha256(buf).digest() * (1 << 15)

    with ThreadPoolExecutor(max_workers=32) as ex:
        list(ex.map(chain, range(32)))


def canary(reps: int = 5) -> dict:
    out = {
        "sha256_sec": _best(_sha256, reps),
        "pyloop_sec": _best(_pyloop, reps),
        "npsort_sec": _best(_npsort, reps),
        "mt_sha256_sec": _best(_mt_sha256, reps),
    }
    out["total_sec"] = round(sum(out.values()), 4)
    return out


if __name__ == "__main__":
    print(json.dumps(canary()))
