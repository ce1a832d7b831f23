"""Adversarial testdata generator — one divergence CLASS per run.

The r9 driver reds came from a data regeneration that happened to land on
a latent cross-engine gate divergence (double→DECIMAL near-tie shortest
reprs). This tool regenerates the sf tables with each such class turned
up to maximum so the full oracle-parity suite can prove every gate either
immune or hardened BEFORE a regeneration finds it:

  money      double money columns onto the decimal-cast divergence grid:
             exact .xx5 ties plus 17-digit near-ties like 1.7249999999999999
             (Spark shortest-string HALF_UP vs DuckDB ~15-sig-digit — the
             r9 class, killed by functions/money.py)
  timestamp  events.ts onto microsecond boundary near-ties: ±1µs around
             second/half-second/hour/day edges — stresses date_trunc /
             window assignment / epoch rounding ties
  floatsum   money/value doubles scaled by cycling POWERS OF TWO across
             12 orders of magnitude. Each row's value stays bit-identical
             cross-engine (×2^k is exact), but any gate emitting a raw
             double SUM becomes addition-order-sensitive and diverges
             (Spark partial aggregation order vs DuckDB's)
  collation  string columns get suffix cycling through trailing space /
             case flips / non-ASCII / control chars — stresses ORDER BY
             tie-breaks and LIMIT-after-sort gates on binary-vs-locale
             collation

Usage: python tools/make_adversarial_testdata.py [SRC] [DST] [--cls money]
Then:  SPARK_GRAFT_SF_DIR_TEST=DST python -m pytest tests/test_oracle_parity.py
"""

import argparse
import os
import shutil

import duckdb


def money_expr(col, key):
    # keep magnitude/sign of the original but put it on an adversarial grid:
    # cents/100 + cycling offsets {0 (on-grid), exact .005 tie, .001 (3-dec),
    # near-tie just below .005, near-tie just above .0049...}
    return f"""CAST(
      CAST(CAST(round({col} * 100) AS BIGINT) AS DOUBLE) / 100
      + CASE CAST({key} AS BIGINT) % 5
          WHEN 0 THEN 0.0
          WHEN 1 THEN 0.005
          WHEN 2 THEN 0.001
          WHEN 3 THEN 0.0049999999999998
          ELSE 0.0050000000000002
        END AS DOUBLE) AS {col}"""


def floatsum_expr(col, key):
    # cycling power-of-two scale: each multiply is EXACT in IEEE-754, so
    # per-row values agree bit-for-bit across engines — only aggregation
    # ORDER effects can diverge downstream. 2^±20 spans ~12 decimal orders.
    # FINDING (r11): this UP-scaling variant drives money columns out of
    # their DECIMAL domain and every affected gate fails LOUDLY in both
    # engines (Spark ANSI NUMERIC_VALUE_OUT_OF_RANGE) — no silent
    # divergence. Use --cls floatsum_down for the in-domain order probe.
    return f"""CAST({col} * CASE CAST({key} AS BIGINT) % 5
          WHEN 0 THEN 1.0
          WHEN 1 THEN 1024.0
          WHEN 2 THEN 0.0009765625
          WHEN 3 THEN 1048576.0
          ELSE 0.00000095367431640625
        END AS DOUBLE) AS {col}"""


def floatsum_down_expr(col, key):
    # the IN-DOMAIN order probe: downscale ONLY (2^0 .. 2^-20), so money
    # stays inside its DECIMAL(12,2)-ish domain and ratios/discounts stay
    # in [0,1], but sums mix magnitudes across ~6 decimal orders — a raw
    # double SUM gate would now be addition-order-sensitive while every
    # per-row value remains bit-identical cross-engine
    return f"""CAST({col} * CASE CAST({key} AS BIGINT) % 5
          WHEN 0 THEN 1.0
          WHEN 1 THEN 0.03125
          WHEN 2 THEN 0.0009765625
          WHEN 3 THEN 0.000030517578125
          ELSE 0.00000095367431640625
        END AS DOUBLE) AS {col}"""


def timestamp_expr(col, key):
    # re-seat every event timestamp at a boundary near-tie inside its own
    # original hour: exact hour edge, ±1µs around it, exact half-second,
    # 1µs below .5s, and 1µs before the NEXT hour — the tie points where
    # a truncation/window/rounding disagreement would show
    return f"""CAST(date_trunc('hour', {col}) + to_microseconds(
        CASE CAST({key} AS BIGINT) % 6
          WHEN 0 THEN 0
          WHEN 1 THEN 1
          WHEN 2 THEN 500000
          WHEN 3 THEN 499999
          WHEN 4 THEN 3599999999
          ELSE 1800000001
        END) AS TIMESTAMP) AS {col}"""


def collation_expr(col, key):
    # ORDER BY tie-bait: clone groups of rows onto the same prefix and
    # differentiate only by a suffix whose relative order depends on the
    # collation — trailing space (0x20), upper vs lower case, a non-ASCII
    # 2-byte codepoint, a control char, and '~' (0x7E, top of ASCII)
    return f"""CAST({col} || CASE CAST({key} AS BIGINT) % 6
          WHEN 0 THEN ''
          WHEN 1 THEN ' '
          WHEN 2 THEN 'a'
          WHEN 3 THEN 'A'
          WHEN 4 THEN 'ä'
          ELSE '~'
        END AS VARCHAR) AS {col}"""


MONEY_JOBS = {
    "events":   [("value", "event_id")],
    "customer": [("c_acctbal", "c_custkey")],
    "supplier": [("s_acctbal", "s_suppkey")],
    "part":     [("p_retailprice", "p_partkey")],
    "orders":   [("o_totalprice", "o_orderkey")],
    "lineitem": [("l_extendedprice", "l_orderkey * 10 + l_linenumber"),
                 ("l_discount", "l_orderkey * 10 + l_linenumber + 1"),
                 ("l_tax", "l_orderkey * 10 + l_linenumber + 2")],
}

CLASSES = {
    "money": (money_expr, MONEY_JOBS),
    "floatsum": (floatsum_expr, MONEY_JOBS),
    "floatsum_down": (floatsum_down_expr, MONEY_JOBS),
    "timestamp": (timestamp_expr, {"events": [("ts", "event_id")]}),
    "collation": (collation_expr, {
        # string columns that act as sort keys / tiebreakers / group keys
        # in gated queries; never the *semantic* discriminators the CDC
        # mapping reads (event_type) or join keys
        "customer": [("c_name", "c_custkey")],
        "supplier": [("s_name", "s_suppkey")],
        "part":     [("p_name", "p_partkey")],
        "orders":   [("o_orderpriority", "o_orderkey")],
    }),
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("dst", nargs="?", default="/tmp/advdata")
    ap.add_argument("--cls", default="money", choices=sorted(CLASSES))
    args = ap.parse_args()

    expr, jobs = CLASSES[args.cls]
    shutil.rmtree(args.dst, ignore_errors=True)
    os.makedirs(args.dst)
    con = duckdb.connect()
    for t in TABLES:
        cols = jobs.get(t)
        if not cols:
            shutil.copy(f"{args.src}/{t}.parquet", f"{args.dst}/{t}.parquet")
            continue
        repl = ", ".join(expr(c, k) for c, k in cols)
        con.execute(
            f"COPY (SELECT * REPLACE ({repl}) FROM '{args.src}/{t}.parquet') "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"wrote {args.dst} [class={args.cls}]")
    probe = {"money": ("events", "value"), "floatsum": ("events", "value"),
             "floatsum_down": ("events", "value"),
             "timestamp": ("events", "ts"), "collation": ("customer", "c_name")}
    t, c = probe[args.cls]
    print(t, con.execute(
        f"SELECT {c} FROM '{args.dst}/{t}.parquet' LIMIT 5").fetchall())


if __name__ == "__main__":
    main()
