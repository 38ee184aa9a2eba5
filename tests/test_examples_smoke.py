"""Smoke gate for the runnable examples: a user following README's
"Running" section must not hit an import error or a drifted API. Each
example exposes main() and reuses the session via getOrCreate, so the
smoke runs in-process against the test session."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str):
    path = os.path.join(REPO, "examples", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"examples_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


class _bare_argv:
    """The tours read optional overrides from sys.argv; under pytest that
    would be the test file path — run them as if invoked with no args."""

    def __enter__(self):
        self._saved, sys.argv = sys.argv, [sys.argv[0]]

    def __exit__(self, *exc):
        sys.argv = self._saved


def test_incremental_ingest_example_runs(spark):
    assert _load("incremental_ingest").main([]) == 0


def test_quickstart_example_runs(spark):
    with _bare_argv():
        _load("quickstart").main()


def test_analytics_tour_example_runs(spark):
    with _bare_argv():
        _load("analytics_tour").main()


def test_curation_pipeline_example_runs(spark):
    with _bare_argv():
        _load("curation_pipeline").main()


def test_contrastive_data_example_runs(spark):
    with _bare_argv():
        _load("contrastive_data").main()
