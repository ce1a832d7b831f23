"""Round-1's costliest bug was queries that only ran under the builder's
configured session (events.parquet TIMESTAMP(NANOS) needed a session
conf). The driver harness uses a BARE SparkSession — this test replicates
that exactly: a subprocess with a default-config session runs the
risk-profile queries (every events reader + each python-stage family).

Subprocess, not newSession(): any in-process session would inherit the
test fixture's conf and defeat the point.
"""

from __future__ import annotations

import pytest
import subprocess
import sys

RISKY = [
    "cdc_apply_customer",       # flagship entry(); naive-micros timestamps
    "cdc_latest_wins",
    "events_sessionize",        # NTZ epoch math (extract_epoch)
    "asof_latest_order_per_event",
    "multimodal_bmp_resize",    # chained mapInPandas
    "multimodal_y4m_frame_sample",
    "embedding_dedup_pipeline",  # cogroup GEMM + localCheckpoint loop
    "doc_pack_sequences",       # window prefix-sum
    "embedding_ann_ivfpq",      # Arrow prep stage + cached-base join
    "embedding_ann_ivfpq_trained",  # driver k-means sample + rerank join
    "cdc_scd2_customer",        # versioned fold + array-state explode
    "cdc_incremental_rollup",   # apply_delta + decimal merge
    "events_zorder_keys",       # NTZ epoch math inside bit chains
    # r8: stateful STREAMING queries (applyInPandasWithState + file-stream
    # landing) — the state store, Arrow state serde, and memory sink must
    # all work under the driver's bare session (200 shuffle partitions)
    "doc_stream_dedup",
    "doc_stream_neardup_md5",
    # r8: Derby-backed sinks under a bare session (local-master guard,
    # staging index, reconcile transaction); the evolution query adds the
    # mid-batch DDL barrier + target ALTER path
    "cdc_rebucket_apply",
    "cdc_jdbc_schema_evolution",
    # r9: two-source consolidation with a maintained cross-source join view
    # (slot restriction + BucketStore + maintainer protocol, all under the
    # driver's bare session)
    "cdc_two_source_join_view",
    # r9: the ANN CDC stream (bootstrap build + tombstone/append commits +
    # fresh-checkpoint replay + compaction readback) and the maintained
    # MIN/MAX view's rescan legs under the bare session's 200 shuffle
    # partitions; rename/drop exercise the DDL barrier + versioned store
    # rewrite without a Derby target
    "ann_cdc_upserts",
    "cdc_maintained_minmax_view",
    "cdc_drop_column",
    "doc_weighted_sample",
    "cdc_maintained_topk_view",
    # r9: the COUNT DISTINCT maintainer's nested support BucketStore
    # (partial rewrites + zero-crossing summary patch) under the bare
    # session
    "cdc_maintained_distinct_view",
    # r9: stream-stream interval join (watermarked two-sided state) drained
    # under the bare session
    "events_stream_interval_join",
    # r9: streaming Misra-Gries candidate pass (array-state serde) + exact
    # batch recount under the bare session
    "doc_stream_heavy_bigrams",
]

SCRIPT = """
import importlib.util
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").appName("bare-gate").getOrCreate()
spec = importlib.util.spec_from_file_location("m", "__spark_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
assert len(m.entry(spark).collect()) >= 0
qs = m.queries()
for name in {names!r}:
    n = len(qs[name](spark, "/root/testdata/sf0.001").collect())
    print("OK", name, n, flush=True)
print("ALL-OK")
"""


@pytest.mark.slow  # endurance: see pytest.ini — run with -m 'slow or not slow'
def test_risky_queries_run_under_bare_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(names=RISKY)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"bare-session run failed:\n{proc.stderr[-3000:]}"
    assert "ALL-OK" in proc.stdout
    for name in RISKY:
        assert f"OK {name}" in proc.stdout
