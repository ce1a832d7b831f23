"""SCD2 history fold: versioned per-key reconstruction from CDC events.

Semantics under test (operators/scd2.py):
- every insert/update opens a version at its LSN; the previous open version
  closes at that LSN (half-open [from, to) intervals)
- deletes close the open version and open nothing
- partial-column updates (TOAST omission, replay.pl:186-194) inherit omitted
  columns from the PREVIOUS version — the case a plain LEAD() window can't do
- exactly one is_current version per live key; none for deleted keys
"""

from __future__ import annotations

from connemara_spark.catalog import ColumnSpec, TableSpec
from connemara_spark.events import BRONZE_SCHEMA, parse_events
from connemara_spark.operators.scd2 import scd2_history
from connemara_spark.plans import inspect as plans
from connemara_spark.testing import make_event

CUST = TableSpec(
    database="db1",
    schema="public",
    table="customer",
    columns=[
        ColumnSpec("c_custkey", "bigint"),
        ColumnSpec("c_name", "text"),
        ColumnSpec("c_acctbal", "double precision"),
    ],
    pk_cols=["c_custkey"],
)


def _history(spark, events):
    bronze = spark.createDataFrame(events, BRONZE_SCHEMA)
    df = scd2_history(parse_events(bronze), CUST)
    return df, sorted(
        (r.asDict() for r in df.collect()),
        key=lambda r: (r["c_custkey"], r["valid_from_lsn"]),
    )


def test_versions_intervals_and_current(spark):
    evs = [
        make_event(CUST, "insert", lsn=10, row={"c_custkey": 1, "c_name": "a", "c_acctbal": 1.0}),
        make_event(CUST, "update", lsn=20, row={"c_custkey": 1, "c_name": "b", "c_acctbal": 2.0}),
        make_event(CUST, "update", lsn=30, row={"c_custkey": 1, "c_name": "c", "c_acctbal": 3.0}),
    ]
    _, rows = _history(spark, evs)
    assert [(r["valid_from_lsn"], r["valid_to_lsn"], r["c_name"]) for r in rows] == [
        (10, 20, "a"),
        (20, 30, "b"),
        (30, None, "c"),
    ]
    assert [r["is_current"] for r in rows] == [False, False, True]


def test_delete_closes_without_reopening(spark):
    evs = [
        make_event(CUST, "insert", lsn=10, row={"c_custkey": 1, "c_name": "a", "c_acctbal": 1.0}),
        make_event(CUST, "delete", lsn=20, old_key={"c_custkey": 1}),
    ]
    _, rows = _history(spark, evs)
    assert len(rows) == 1
    assert (rows[0]["valid_from_lsn"], rows[0]["valid_to_lsn"], rows[0]["is_current"]) == (10, 20, False)


def test_reinsert_after_delete_opens_new_lineage(spark):
    evs = [
        make_event(CUST, "insert", lsn=10, row={"c_custkey": 1, "c_name": "a", "c_acctbal": 1.0}),
        make_event(CUST, "delete", lsn=20, old_key={"c_custkey": 1}),
        make_event(CUST, "insert", lsn=30, row={"c_custkey": 1, "c_name": "z", "c_acctbal": 9.0}),
    ]
    _, rows = _history(spark, evs)
    assert [(r["valid_from_lsn"], r["valid_to_lsn"]) for r in rows] == [(10, 20), (30, None)]
    assert rows[1]["c_name"] == "z" and rows[1]["is_current"]


def test_partial_update_inherits_omitted_columns(spark):
    evs = [
        make_event(CUST, "insert", lsn=10, row={"c_custkey": 1, "c_name": "keepme", "c_acctbal": 1.0}),
        # TOAST-style omission: only c_acctbal shipped; c_name absent
        make_event(
            CUST, "update", lsn=20,
            row={"c_custkey": 1, "c_acctbal": 5.0},
            present=["c_custkey", "c_acctbal"],
        ),
    ]
    _, rows = _history(spark, evs)
    assert len(rows) == 2
    v2 = rows[1]
    assert v2["c_acctbal"] == 5.0
    assert v2["c_name"] == "keepme"  # inherited across the version boundary
    assert v2["is_current"]


def test_update_on_unseen_key_opens_version(spark):
    # stream starts mid-history: an update for a never-inserted key still
    # opens a version (absent columns NULL) rather than vanishing
    evs = [
        make_event(
            CUST, "update", lsn=20,
            row={"c_custkey": 7, "c_acctbal": 5.0},
            present=["c_custkey", "c_acctbal"],
        ),
    ]
    _, rows = _history(spark, evs)
    assert len(rows) == 1
    assert rows[0]["c_name"] is None and rows[0]["c_acctbal"] == 5.0


def test_scd2_plan_single_shuffle_no_udf(spark):
    evs = [
        make_event(CUST, "insert", lsn=10, row={"c_custkey": 1, "c_name": "a", "c_acctbal": 1.0}),
    ]
    # assert on the un-executed plan: after a collect(), AQE's finalized plan
    # string repeats the exchange in the Initial Plan section
    bronze = spark.createDataFrame(evs, BRONZE_SCHEMA)
    df = scd2_history(parse_events(bronze), CUST)
    plans.assert_no_python_udf(df)
    plans.assert_no_cartesian(df)
    # one hash shuffle for the per-key groupBy (+ none for the explode)
    plans.assert_max_exchanges(df, 1)


def test_scd2_randomized_stream_matches_sequential_reference(spark):
    """The fold must equal a plain sequential replay on an arbitrary mixed
    stream — including partial-column updates and PK-change splits."""
    from connemara_spark.operators.apply import events_for_table
    from connemara_spark.testing import random_event_stream

    CUST5 = TableSpec(
        database="db1",
        schema="public",
        table="customer",
        columns=[
            ColumnSpec("c_custkey", "bigint"),
            ColumnSpec("c_name", "text"),
            ColumnSpec("c_acctbal", "double precision"),
        ],
        pk_cols=["c_custkey"],
    )
    base = [
        {"c_custkey": i, "c_name": f"c{i}", "c_acctbal": float(i)} for i in range(1, 21)
    ]
    # seed the stream with explicit inserts for the base rows so history
    # starts in-stream (scd2 is events-only), then run the random mix
    evs = [
        make_event(CUST5, "insert", lsn=i, row=r) for i, r in enumerate(base, start=1)
    ]
    evs += random_event_stream(CUST5, base, n_events=300, seed=31, start_lsn=100)

    bronze = spark.createDataFrame(evs, BRONZE_SCHEMA)
    events = parse_events(bronze)

    # ---- sequential reference over the SAME projected event parts ----
    parts = [
        r.asDict(recursive=True)
        for r in events_for_table(events, CUST5)
        .orderBy("insert_timestamp", "lsn_start", "sub_ord")
        .collect()
    ]
    cols = ["c_custkey", "c_name", "c_acctbal"]
    state: dict = {}
    versions: list = []

    def close(key, lsn):
        st = state.get(key)
        if st and st["exists"]:
            versions.append((key, st["from"], lsn, tuple(st["vals"][c] for c in cols)))

    for p in parts:
        key = tuple(p["__pk"].values())
        lsn = p["lsn_start"]
        close(key, lsn)
        if p["op"] == "delete":
            state[key] = {"exists": False, "vals": {c: None for c in cols}, "from": None}
        elif p["op"] == "insert":
            state[key] = {"exists": True, "vals": dict(p["vals"]), "from": lsn}
        else:  # update: overlay present columns over current values
            cur = state.get(key, {"vals": {c: None for c in cols}})["vals"]
            vals = {c: (p["vals"][c] if p["has"][c] else cur[c]) for c in cols}
            state[key] = {"exists": True, "vals": vals, "from": lsn}
    for key, st in state.items():
        if st["exists"]:
            versions.append((key, st["from"], None, tuple(st["vals"][c] for c in cols)))

    expected = sorted(
        ((k[0], f, t) + v for k, f, t, v in versions),
        key=lambda r: (r[0], r[1]),
    )

    got = sorted(
        (
            (r["c_custkey"], r["valid_from_lsn"], r["valid_to_lsn"],
             r["c_custkey"], r["c_name"], r["c_acctbal"])
            for r in scd2_history(events, CUST5).collect()
        ),
        key=lambda r: (r[0], r[1]),
    )
    expect_rows = [
        (k, f, t, k, name, bal) for (k, f, t, k2, name, bal) in
        [(r[0], r[1], r[2], r[0], r[4], r[5]) for r in expected]
    ]
    assert len(got) == len(expect_rows)
    for g, e in zip(got, expect_rows):
        assert g == e, (g, e)
