"""Wiring tests for the Delta Lake branches (environment-gated code).

delta-spark is absent in this container (and cannot be installed), so the
``HAVE_DELTA`` branches in session.py / io/sinks.py / io/sources.py never
execute in the normal suite. Same strategy as the fake-redis test in
test_api.py: inject a fake ``delta`` module / flip the flag and assert the
exact wiring — which configs reach the builder, which format string and
options reach the writer, which reader path a ``_delta_log`` directory
dispatches to. The live JVM Delta path (jar loading, actual ACID commit
protocol) remains untested here by necessity and is documented as such in
each branch's docstring; everything Python-side of the jar boundary is
covered below.
"""

from __future__ import annotations

import importlib
import sys
import types

import pytest


class _ChainRecorder:
    """Records every attribute-call chain; any method returns self."""

    def __init__(self, log: list):
        self._log = log

    def __getattr__(self, name):
        def call(*args, **kwargs):
            self._log.append((name, args, kwargs))
            return self

        return call


def test_session_builder_gets_delta_extensions_with_fake_module(monkeypatch):
    """With a ``delta`` module importable, get_spark must route the builder
    through configure_spark_with_delta_pip AFTER setting the Delta SQL
    extension + catalog configs (session.py:65-72)."""
    seen: dict = {}

    def fake_configure(builder):
        # capture the options set so far (pyspark Builder keeps _options)
        seen["options"] = dict(builder._options)
        rec = _ChainRecorder(seen.setdefault("post", []))
        return rec

    fake_delta = types.ModuleType("delta")
    fake_delta.configure_spark_with_delta_pip = fake_configure
    monkeypatch.setitem(sys.modules, "delta", fake_delta)

    import mini_feature_store_spark.session as session

    importlib.reload(session)
    try:
        assert session.HAVE_DELTA is True
        result = session.get_spark(app_name="delta-wiring-test")
        assert seen["options"]["spark.sql.extensions"] == (
            "io.delta.sql.DeltaSparkSessionExtension"
        )
        assert seen["options"]["spark.sql.catalog.spark_catalog"] == (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        )
        # the returned (fake) builder was driven to getOrCreate
        assert ("getOrCreate", (), {}) in seen["post"]
        assert isinstance(result, _ChainRecorder)
    finally:
        monkeypatch.delitem(sys.modules, "delta")
        importlib.reload(session)
        assert session.HAVE_DELTA is False
        # downstream modules captured HAVE_DELTA by value at import time
        import mini_feature_store_spark.io.sinks as sinks

        importlib.reload(sinks)


class _FakeWriter:
    def __init__(self):
        self.calls: list = []

    def format(self, fmt):
        self.calls.append(("format", fmt))
        return self

    def mode(self, m):
        self.calls.append(("mode", m))
        return self

    def partitionBy(self, *cols):
        self.calls.append(("partitionBy", cols))
        return self

    def option(self, k, v):
        self.calls.append(("option", k, v))
        return self

    def saveAsTable(self, name):
        self.calls.append(("saveAsTable", name))


class _FakeDF:
    def __init__(self, writer):
        self.write = writer


def test_insert_overwrite_uses_delta_format_and_replace_where(monkeypatch):
    """insert_overwrite_table (io/sinks.py:62-86): with HAVE_DELTA the
    writer must be format('delta') and replace_where must become the
    replaceWhere option instead of raising."""
    import mini_feature_store_spark.io.sinks as sinks

    monkeypatch.setattr(sinks, "HAVE_DELTA", True)
    w = _FakeWriter()
    sinks.insert_overwrite_table(
        _FakeDF(w),
        "feat_tbl",
        partition_by=("ds",),
        replace_where="ds = '2026-01-01'",
    )
    assert ("format", "delta") in w.calls
    assert ("mode", "overwrite") in w.calls
    assert ("partitionBy", ("ds",)) in w.calls
    assert ("option", "replaceWhere", "ds = '2026-01-01'") in w.calls
    assert ("saveAsTable", "feat_tbl") in w.calls


def test_insert_overwrite_without_delta_rejects_replace_where(monkeypatch):
    import mini_feature_store_spark.io.sinks as sinks

    monkeypatch.setattr(sinks, "HAVE_DELTA", False)
    w = _FakeWriter()
    with pytest.raises(NotImplementedError, match="replaceWhere"):
        sinks.insert_overwrite_table(
            _FakeDF(w), "t", replace_where="ds = '2026-01-01'"
        )
    # parquet fallback without replace_where still works
    sinks.insert_overwrite_table(_FakeDF(w), "t")
    assert ("format", "parquet") in w.calls


class _FakeCatalog:
    def tableExists(self, name):
        return False


class _FakeReader:
    def __init__(self, log):
        self.log = log

    def format(self, fmt):
        self.log.append(("format", fmt))
        return self

    def load(self, path):
        self.log.append(("load", path))
        return "DELTA_DF"

    def parquet(self, path):
        self.log.append(("parquet", path))
        return "PARQUET_DF"


class _FakeSpark:
    def __init__(self):
        self.catalog = _FakeCatalog()
        self.log: list = []

    @property
    def read(self):
        return _FakeReader(self.log)


def test_read_table_dispatches_on_delta_log_dir(tmp_path, monkeypatch):
    """read_table (io/sources.py:69-73): a directory containing _delta_log
    must be read via format('delta') when HAVE_DELTA, else as parquet."""
    import mini_feature_store_spark.session as session
    from mini_feature_store_spark.io.sources import read_table

    d = tmp_path / "tbl"
    (d / "_delta_log").mkdir(parents=True)

    monkeypatch.setattr(session, "HAVE_DELTA", True)
    fs = _FakeSpark()
    assert read_table(fs, str(d)) == "DELTA_DF"
    assert ("format", "delta") in fs.log and ("load", str(d)) in fs.log

    monkeypatch.setattr(session, "HAVE_DELTA", False)
    fs2 = _FakeSpark()
    assert read_table(fs2, str(d)) == "PARQUET_DF"
    assert ("parquet", str(d)) in fs2.log
