"""Interactive fixer TUI session logic (curses-free core): refresh,
staleness check, execute-and-advance, skip — parity with the reference's
Curses::UI fixer (connemara_fixer.pl)."""

from __future__ import annotations

import datetime as dt

import pytest

from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
from connemara_spark.events import BRONZE_SCHEMA
from connemara_spark.ops import Fixer
from connemara_spark.ops_tui import FixerTuiSession, StaleQueryError
from connemara_spark.pipeline import MemoryStore, Replayer
from connemara_spark.streaming.driver import LsnWatermark

DDL_EVENT = (
    '{"kind":"insert","schema":"public","table":"sql_ddl_statements",'
    '"columnnames":["id","current_query","search_path","command_tags"],'
    '"columnvalues":["1","%s","\\"$user\\", public","{DDL}"]}'
)


def _row(lsn, payload, db="db1", slot="slot1", ts="2026-01-02 03:00:00"):
    t = dt.datetime.fromisoformat(ts)
    return (t, db, slot, lsn, 100 + lsn, t, payload)


def _session(spark, tmp_path):
    spool = str(tmp_path / "spool")
    catalog = EngineCatalog()
    spec = TableSpec(
        database="db1", schema="public", table="t1",
        columns=[ColumnSpec("id", "integer"), ColumnSpec("v", "text")],
        pk_cols=["id"],
    )
    catalog.register(spec)
    store = MemoryStore(spark)
    store.create_table(catalog.get("db1", "public", "t1"))
    replayer = Replayer(spark, catalog, store)
    wm = LsnWatermark(str(tmp_path / "wm.json"))
    spark.createDataFrame(
        [
            _row(5, DDL_EVENT % "ALTER TABLE public.t1 ADD COLUMN extra text"),
            _row(7, DDL_EVENT % "ALTER TABLE public.t1 ADD COLUMN later int4"),
        ],
        BRONZE_SCHEMA,
    ).write.mode("append").parquet(spool)
    return FixerTuiSession(Fixer(spark, replayer, wm, spool)), catalog, spool


def test_refresh_execute_skip_flow(spark, tmp_path):
    session, catalog, _ = _session(spark, tmp_path)

    view = session.refresh()
    assert view is not None
    assert "ADD COLUMN extra" in view.original and "ADD COLUMN extra" in view.editable
    # original pane carries the remapped search_path prefix (D12), the
    # reference's display contract
    assert view.original.startswith("SET search_path TO ")
    assert "db1_public" in view.original
    assert "database: db1" in view.meta and "lsn: 5" in view.meta

    # edit before executing: the EDITED text runs, not the original
    tag = session.execute("ALTER TABLE public.t1 ADD COLUMN extra_fixed text")
    assert tag == "column-added"
    cols = [c.name for c in catalog.get("db1", "public", "t1").columns]
    assert "extra_fixed" in cols and "extra" not in cols

    # head advanced to lsn 7; skip it without executing
    view2 = session.refresh()
    assert view2 is not None and "later" in view2.editable
    session.skip()
    assert session.refresh() is None  # queue drained
    assert "later" not in [c.name for c in catalog.get("db1", "public", "t1").columns]


def test_execute_refuses_stale_head(spark, tmp_path):
    """The reference's 'something is fishy' contract: if the head record
    changed between display and execute, refuse instead of executing
    against the wrong event."""
    session, _, spool = _session(spark, tmp_path)
    view = session.refresh()
    assert view is not None

    # the spool moves under the session: an EARLIER event lands (a late
    # segment) so head() now returns a different record
    session.fixer.spark.createDataFrame(
        [_row(3, DDL_EVENT % "ALTER TABLE public.t1 ADD COLUMN sneaky text",
              ts="2026-01-02 02:00:00")],
        BRONZE_SCHEMA,
    ).write.mode("append").parquet(spool)

    with pytest.raises(StaleQueryError, match="changed in the spool"):
        session.execute("ALTER TABLE public.t1 ADD COLUMN whatever text")
    with pytest.raises(StaleQueryError):
        session.skip()
    # refresh resynchronizes on the new head
    view2 = session.refresh()
    assert view2 is not None and "sneaky" in view2.editable


def test_execute_without_refresh_raises(spark, tmp_path):
    session, _, _ = _session(spark, tmp_path)
    with pytest.raises(RuntimeError, match="refresh first"):
        session.execute("SELECT 1")
