"""The recording harness keeps only the last ~2000 chars of bench stdout
(BENCH_r02 was captured truncated and unparseable). Guard the invariant:
the summary line bench.py prints — aggregate + HEADLINE subset + failure
list — fits the capture window even at worst-case timing widths."""

import json

import pytest

import bench


@pytest.fixture(autouse=True)
def _stub_canary(monkeypatch):
    """The gate runs the real host canary (~7 s of fixed CPU work) at pin
    time; stub it for the unit tests — its behavior is not under test
    here and 10+ main() calls would cost minutes."""
    try:
        import host_canary
    except ImportError:
        import sys as _sys
        import os as _os

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..", "tools")
        )
        import host_canary
    monkeypatch.setattr(
        host_canary, "canary", lambda reps=5: {"total_sec": 1.0}
    )


def test_headline_line_fits_capture_window():
    # worst case: every headline query present with a wide timing value,
    # all failure slots used with the longest registered query names
    from cdmx_airquality_etl_spark.registry import QUERIES

    longest = sorted(QUERIES, key=len, reverse=True)
    result = {
        "metric": "total_wall_sec_all_queries",
        "value": 99999.999,
        "unit": "sec",
        "queries": {k: 99999.999 for k in bench.HEADLINE},
        "sf": 0.1,
        "n_queries": len(QUERIES),
        "n_failed": 10,
        "failed": longest[:10],
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(result, separators=(",", ":"))
    assert len(line) <= bench._MAX_LINE, (
        f"bench summary line would be {len(line)} chars; the recorder "
        f"keeps ~2000 — trim HEADLINE or the failure list"
    )


def test_headline_queries_are_registered():
    from cdmx_airquality_etl_spark.registry import QUERIES

    missing = [k for k in bench.HEADLINE if k not in QUERIES]
    assert not missing, f"HEADLINE references unregistered queries: {missing}"


def test_cross_round_gate_flags_unexplained_regression(tmp_path, monkeypatch, capsys):
    """VERDICT r8 #8: the closing ritual must fail on an unexplained ≥1.5×
    per-query regression vs the previous round's pinned closing artifact,
    and pass when the regression is declared in tools/bench_allowlist.json."""
    import json
    import sys as _sys
    import os as _os

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    import bench_gate
    import importlib

    importlib.reload(bench_gate)

    def seed(allowlist):
        prev = {
            "value": 10.0, "sf": 0.1, "n_queries": 2,
            "queries": {"q_a": 1.0, "q_b": 2.0},
            "warm_queries": {"q_a": 1.0},
        }
        fresh = {
            "value": 12.0, "sf": 0.1, "n_queries": 2,
            # q_a regressed 2x warm; q_b fine cold
            "queries": {"q_a": 2.5, "q_b": 2.1},
            "warm_queries": {"q_a": 2.0},
        }
        root = tmp_path / "repo"
        (root / "tools").mkdir(parents=True, exist_ok=True)
        (root / "BENCH_DETAIL.json").write_text(json.dumps(fresh))
        (root / "BENCH_CLOSING_r08.json").write_text(json.dumps(prev))
        (root / "tools" / "bench_allowlist.json").write_text(
            json.dumps(allowlist)
        )
        return root

    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(seed({"r09": {}})))
    monkeypatch.setattr(bench_gate.sys, "argv", ["bench_gate.py", "r09"])
    assert bench_gate.main() == 1
    assert "q_a" in capsys.readouterr().out

    root = seed({"r09": {"q_a": "stub became real implementation"}})
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(root))
    assert bench_gate.main() == 0
    out = capsys.readouterr().out
    assert "allowlisted" in out and "stub became real" in out

    # VERDICT r9 #1: a violation whose standalone re-time clears the
    # threshold is noise-adjudicated automatically and recorded in the
    # pinned closing artifact; the gate passes without an allowlist entry.
    root = seed({"r09": {}})
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(root))
    monkeypatch.setattr(
        bench_gate,
        "retime_verdicts",
        lambda names, sf: {
            "q_a": {"runs": [4.9, 1.1, 1.0, 1.0, 1.0],
                    "min": 1.0, "warm_min": 1.0}
        },
    )
    assert bench_gate.main() == 0
    out = capsys.readouterr().out
    assert "retime-adjudicated" in out
    pinned = json.loads((root / "BENCH_CLOSING_r09.json").read_text())
    assert pinned["retimed"]["q_a"]["verdict"] == "noise"
    assert pinned["retimed"]["q_a"]["prior"] == 1.0

    # ...and a re-time that CONFIRMS the regression still fails the gate
    monkeypatch.setattr(
        bench_gate,
        "retime_verdicts",
        lambda names, sf: {
            "q_a": {"runs": [4.9, 2.1, 2.0, 2.0, 2.0],
                    "min": 2.0, "warm_min": 2.0}
        },
    )
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(seed({"r09": {}})))
    assert bench_gate.main() == 1
    assert "re-time" in capsys.readouterr().out


def test_retime_cold_tier_uses_overall_min(tmp_path, monkeypatch, capsys):
    """Round-11 ADVICE closure: a COLD-tier violation must be adjudicated
    against the retime's overall 'min' (which includes the cold first
    run), not the post-JIT 'warm_min' — otherwise a genuine first-run
    regression is laundered as noise. And the pinned entry records the
    compared tier + basis."""
    import importlib
    import json
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    import bench_gate

    importlib.reload(bench_gate)

    def seed():
        # q_b regressed 2x COLD (no warm tier on either side)
        prev = {"value": 10.0, "sf": 0.1, "n_queries": 1,
                "queries": {"q_b": 2.0}, "warm_queries": {}}
        fresh = {"value": 12.0, "sf": 0.1, "n_queries": 1,
                 "queries": {"q_b": 4.5}, "warm_queries": {}}
        root = tmp_path / "repo_cold"
        (root / "tools").mkdir(parents=True, exist_ok=True)
        (root / "BENCH_DETAIL.json").write_text(json.dumps(fresh))
        (root / "BENCH_CLOSING_r08.json").write_text(json.dumps(prev))
        (root / "tools" / "bench_allowlist.json").write_text("{}")
        return root

    # warm_min clears the bar but the cold 'min' does NOT → still fails
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(seed()))
    monkeypatch.setattr(bench_gate.sys, "argv", ["bench_gate.py", "r09"])
    monkeypatch.setattr(
        bench_gate, "retime_verdicts",
        lambda names, sf: {"q_b": {"runs": [4.4, 1.0], "min": 4.4,
                                   "warm_min": 1.0}},
    )
    assert bench_gate.main() == 1
    capsys.readouterr()

    # a retime whose overall min clears it → noise, tier recorded
    root = seed()
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(root))
    monkeypatch.setattr(
        bench_gate, "retime_verdicts",
        lambda names, sf: {"q_b": {"runs": [2.1, 1.0], "min": 2.1,
                                   "warm_min": 1.0}},
    )
    assert bench_gate.main() == 0
    pinned = json.loads((root / "BENCH_CLOSING_r09.json").read_text())
    assert pinned["retimed"]["q_b"]["tier"] == "cold"
    assert pinned["retimed"]["q_b"]["basis"] == 2.1


def test_retime_verdict_is_three_way(tmp_path, monkeypatch, capsys):
    """VERDICT r11 #5: 'noise' only when the standalone re-time RECOVERS
    the prior number.  A re-time past the log-space midpoint √(old·new)
    REPRODUCES the change: with an allowlist entry it passes as
    'allowlisted' (reason pinned in the closing artifact); without one it
    is 'confirmed' and fails — even when the reproduced number slips
    under the loose 3× within-round threshold (r11's containment case:
    prior 2.69 s, sweep 14.3 s, retimes ~6.8 s < 3×·2.69 = 8.07 s, yet a
    real adjudicated change)."""
    import importlib
    import json
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    import bench_gate

    importlib.reload(bench_gate)

    def seed(allowlist):
        # q_c: within-round cold outlier 2.69 -> 14.3 (5.3x > 3x). No
        # cross-round artifact — isolates the within-round path.
        committed = {"value": 3.0, "sf": 0.1, "n_queries": 1,
                     "queries": {"q_c": 2.69}, "warm_queries": {}}
        fresh = {"value": 15.0, "sf": 0.1, "n_queries": 1,
                 "queries": {"q_c": 14.3}, "warm_queries": {}}
        root = tmp_path / "repo_3way"
        (root / "tools").mkdir(parents=True, exist_ok=True)
        (root / "BENCH_DETAIL.json").write_text(json.dumps(fresh))
        (root / "tools" / "bench_allowlist.json").write_text(
            json.dumps(allowlist)
        )
        monkeypatch.setattr(
            bench_gate.subprocess, "check_output",
            lambda *a, **k: json.dumps(committed),
        )
        return root

    monkeypatch.setattr(bench_gate.sys, "argv", ["bench_gate.py", "r12"])

    # retime 6.8 s: under 3x*2.69=8.07 (old rule: noise) but past
    # sqrt(2.69*14.3)=6.2 (reproduces the new number).  Allowlisted entry
    # present -> passes, verdict + reason pinned.
    root = seed({"r12": {"q_c": "pair-key prefix plan constant trade"}})
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(root))
    monkeypatch.setattr(
        bench_gate, "retime_verdicts",
        lambda names, sf: {"q_c": {"runs": [8.2, 6.8, 7.1], "min": 6.8,
                                   "warm_min": 6.8}},
    )
    assert bench_gate.main() == 0
    assert "allowlisted" in capsys.readouterr().out
    pinned = json.loads((root / "BENCH_CLOSING_r12.json").read_text())
    assert pinned["retimed"]["q_c"]["verdict"] == "allowlisted"
    assert pinned["retimed"]["q_c"]["reason"] == (
        "pair-key prefix plan constant trade"
    )

    # same reproduced retime WITHOUT an allowlist entry -> confirmed, fails
    root = seed({"r12": {}})
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(root))
    assert bench_gate.main() == 1
    capsys.readouterr()

    # a retime that RECOVERS the prior (2.9 s < midpoint) is still noise
    # without any allowlist entry
    root = seed({"r12": {}})
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(root))
    monkeypatch.setattr(
        bench_gate, "retime_verdicts",
        lambda names, sf: {"q_c": {"runs": [3.1, 2.9], "min": 2.9,
                                   "warm_min": 2.9}},
    )
    assert bench_gate.main() == 0
    pinned = json.loads((root / "BENCH_CLOSING_r12.json").read_text())
    assert pinned["retimed"]["q_c"]["verdict"] == "noise"
    assert "reason" not in pinned["retimed"]["q_c"]


def test_host_shift_attestation(tmp_path, monkeypatch, capsys):
    """Round-12 host-shift tier: when the previous closing carries the
    SAME package code-hash stamp and the per-query ratios are a tight
    uniform shift, flags the shift explains pin verdict 'host-shift'
    without a retime; with DIFFERENT stamps the same numbers take the
    normal retime path (and fail here, retimes stubbed empty)."""
    import importlib
    import json
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    import bench_gate

    importlib.reload(bench_gate)

    def seed(prev_code, fresh_code):
        # 24 queries all shifted exactly 1.6x — uniform, above the 1.5x
        # cross-round bar
        prev_q = {f"q_{i:02d}": 1.0 + i * 0.05 for i in range(24)}
        fresh_q = {k: round(v * 1.6, 3) for k, v in prev_q.items()}
        prev = {"value": sum(prev_q.values()), "sf": 0.1,
                "n_queries": 24, "queries": prev_q, "warm_queries": {},
                "code": prev_code}
        fresh = {"value": sum(fresh_q.values()), "sf": 0.1,
                 "n_queries": 24, "queries": fresh_q, "warm_queries": {}}
        root = tmp_path / f"repo_shift_{prev_code}_{fresh_code}"
        (root / "tools").mkdir(parents=True, exist_ok=True)
        (root / "BENCH_DETAIL.json").write_text(json.dumps(fresh))
        (root / "BENCH_CLOSING_r11.json").write_text(json.dumps(prev))
        (root / "tools" / "bench_allowlist.json").write_text("{}")
        monkeypatch.setattr(
            bench_gate.subprocess, "check_output",
            lambda *a, **k: json.dumps(fresh),  # within-round: no change
        )
        monkeypatch.setattr(
            bench_gate, "retime_verdicts", lambda names, sf: {}
        )
        import scaling_sweep
        monkeypatch.setattr(scaling_sweep, "code_hash", lambda: fresh_code)
        return root

    monkeypatch.setattr(bench_gate.sys, "argv", ["bench_gate.py", "r12"])

    # equal stamps + uniform 1.6x -> host-shift verdicts, exit 0, pinned
    root = seed("samecode", "samecode")
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(root))
    assert bench_gate.main() == 0
    out = capsys.readouterr().out
    assert "attested uniform host shift" in out
    pinned = json.loads((root / "BENCH_CLOSING_r12.json").read_text())
    assert pinned["host_shift"]["median"] == 1.6
    assert all(
        e["verdict"] == "host-shift"
        for e in pinned["host_shift"]["queries"].values()
    )
    assert len(pinned["host_shift"]["queries"]) > 0

    # different stamps: no attestation — flags stand (retime stubbed
    # empty), gate fails
    root = seed("oldcode", "newcode")
    monkeypatch.setattr(bench_gate, "REPO_ROOT", str(root))
    assert bench_gate.main() == 1
    assert "attested uniform host shift" not in capsys.readouterr().out


def test_retime_rejects_mismatched_sf_dir(monkeypatch, capsys):
    """Round-11 ADVICE closure: SPARK_GRAFT_SF_DIR pointing at a different
    scale factor than the flagged bench run must be discarded (a retime at
    a smaller sf trivially clears every threshold)."""
    import importlib
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    import bench_gate

    importlib.reload(bench_gate)
    seen = {}

    def fake_check_output(cmd, **kw):
        seen["sf_dir"] = cmd[cmd.index("--sf-dir") + 1]
        return '{"q_x": {"runs": [1.0], "min": 1.0, "warm_min": 1.0}}'

    monkeypatch.setattr(bench_gate.subprocess, "check_output", fake_check_output)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = bench_gate.retime_verdicts(["q_x"], 0.1)
    assert seen["sf_dir"] == "/root/testdata/sf0.1"
    assert "does not match" in capsys.readouterr().out
    assert out["q_x"]["min"] == 1.0

    # a MATCHING env override is honored
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/elsewhere/sf0.1")
    bench_gate.retime_verdicts(["q_x"], 0.1)
    assert seen["sf_dir"] == "/elsewhere/sf0.1"
