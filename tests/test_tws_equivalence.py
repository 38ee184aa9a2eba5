"""Batch-equivalence proof for the transformWithState operator whose
end-to-end streaming test is environment-gated (this container lacks the
protobuf package the tws Python↔JVM state protocol needs, and installs are
not allowed).

The gate skips only the *machinery* (RocksDB state server handshake); the
operator's SEMANTICS live entirely in RunningTotalsProcessor.handleInputRows,
which is plain Python over pandas batches. This file drives that exact
method through a faithful ValueState stub — exists/get/update, state kept
across simulated microbatches and a simulated restart — and asserts the
outputs equal (a) the batch ground truth and (b) the applyInPandasWithState
fallback's update function (_update_running) run over the identical batch
sequence via a GroupState stub. Both implementations are the same operator
contract (stateful_tws.py module docstring); here that claim is executable
instead of narrative."""

import pandas as pd

from cdmx_airquality_etl_spark.streaming.stateful_custom import _update_running
from cdmx_airquality_etl_spark.streaming.stateful_tws import (
    RunningTotalsProcessor,
)


class FakeValueState:
    """ValueState contract subset the processor uses: exists/get/update."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class FakeHandle:
    def __init__(self, store):
        self._store = store

    def getValueState(self, name, schema):
        return self._store.setdefault(name, FakeValueState())


class FakeGroupState:
    """GroupState contract subset _update_running uses (properties, not
    methods, on the real API)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


BATCHES = [
    [("a", 1.0), ("a", 1.0), ("b", 2.0)],
    [("a", 3.0), ("b", 1.0), ("b", 1.0), ("c", 5.0)],
    [("c", -5.0), ("a", 0.25)],
]


def _keyed_pdfs(batch):
    out = {}
    for k, v in batch:
        out.setdefault(k, []).append(v)
    return {k: pd.DataFrame({"value": vs}) for k, vs in out.items()}


def _drive_tws(batches):
    """Run handleInputRows per key per microbatch. ValueState is implicitly
    scoped to the grouping key in real transformWithState, so the stub
    stores are keyed the same way. A FRESH processor is built every
    microbatch and re-init'd on the key's persistent store — the
    restart-recovery path (checkpoint restore re-creates workers over the
    recovered state store), exercised here on every batch boundary."""
    stores: dict[str, dict] = {}
    latest = {}
    for batch in batches:
        for key, pdf in _keyed_pdfs(batch).items():
            proc = RunningTotalsProcessor()
            proc.init(FakeHandle(stores.setdefault(key, {})))
            for out in proc.handleInputRows((key,), iter([pdf]), None):
                latest[key] = (
                    int(out["n_events"].iloc[0]),
                    float(out["total_value"].iloc[0]),
                )
    return latest


def _drive_custom(batches):
    states = {}
    latest = {}
    for batch in batches:
        for key, pdf in _keyed_pdfs(batch).items():
            st = states.setdefault(key, FakeGroupState())
            for out in _update_running((key,), iter([pdf]), st):
                latest[key] = (
                    int(out["n_events"].iloc[0]),
                    float(out["total_value"].iloc[0]),
                )
    return latest


def _batch_truth(batches):
    want = {}
    for t, v in [r for b in batches for r in b]:
        n, tot = want.get(t, (0, 0.0))
        want[t] = (n + 1, tot + v)
    return want


def test_tws_processor_matches_batch_truth_across_restart():
    assert _drive_tws(BATCHES) == _batch_truth(BATCHES)


def test_tws_processor_equals_custom_stateful_fallback():
    assert _drive_tws(BATCHES) == _drive_custom(BATCHES)


def test_state_not_shared_across_keys():
    latest = _drive_tws([[("x", 1.0)], [("y", 10.0)], [("x", 2.0)]])
    assert latest == {"x": (2, 3.0), "y": (1, 10.0)}
