"""Pins for tools/scaling_sweep.py's merge provenance (round-11 ADVICE:
--merge-sf's soundness rested entirely on caller discipline — nothing in
SCALING.json distinguished merged points or their code version, so a
mixed-version merge would have fabricated a slope undetectably)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import scaling_sweep as ss  # noqa: E402


def test_code_hash_tracks_package_bytes(tmp_path, monkeypatch):
    pkg = tmp_path / "cdmx_airquality_etl_spark"
    pkg.mkdir()
    (pkg / "a.py").write_text("x = 1\n")
    (pkg / "notes.txt").write_text("ignored")
    monkeypatch.setattr(ss, "REPO_ROOT", str(tmp_path))
    h1 = ss.code_hash()
    assert h1 == ss.code_hash()  # deterministic
    (pkg / "notes.txt").write_text("still ignored")  # non-.py: no effect
    assert ss.code_hash() == h1
    (pkg / "a.py").write_text("x = 2\n")  # any .py edit changes the stamp
    assert ss.code_hash() != h1


def test_merge_refuses_mixed_code_versions(capsys):
    entry = {"per_sf": {"0.1": {"sec": 1.0, "rows": 10, "code": "aaa"}}}
    with pytest.raises(SystemExit, match="mix code versions"):
        ss.check_merge_provenance("q_x", entry, "bbb")
    # matching stamp passes silently
    ss.check_merge_provenance("q_x", entry, "aaa")
    # legacy point (no stamp): allowed, warning printed
    legacy = {"per_sf": {"0.1": {"sec": 1.0, "rows": 10}}}
    ss.check_merge_provenance("q_x", legacy, "bbb")
    assert "no provenance stamp" in capsys.readouterr().out
