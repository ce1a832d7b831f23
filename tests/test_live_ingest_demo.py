"""The deployment-wiring demo (tools/live_ingest_demo.py) stays runnable:
JDBC snapshot bootstrap -> watermark seed -> wal_spool drain -> restart."""

from __future__ import annotations

import importlib.util
import os


def test_live_ingest_demo_end_to_end(spark, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "live_ingest_demo",
        os.path.join(os.path.dirname(__file__), "..", "tools", "live_ingest_demo.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # run_demo asserts: overlap skipped, CDC applied, restart applies nothing
    mod.run_demo(spark, str(tmp_path / "demo"))
