"""Adversarial testdata: every money/double column perturbed onto the
decimal-cast divergence grid — exact .xx5 shortest reprs (engines' casts
agree per experiment) AND near-tie 17-digit reprs like 1.7249999999999999
(engines DIVERGE: Spark shortest-string HALF_UP vs DuckDB ~15-sig-digit).
Used to smoke the whole oracle-parity suite for rounding-class fragility."""
import duckdb, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/advdata"
shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
con = duckdb.connect()

def adv(col, key):
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

jobs = {
    "region": None, "nation": None, "documents": None, "embeddings": None,
    "events":   [("value", "event_id")],
    "customer": [("c_acctbal", "c_custkey")],
    "supplier": [("s_acctbal", "s_suppkey")],
    "part":     [("p_retailprice", "p_partkey")],
    "orders":   [("o_totalprice", "o_orderkey")],
    "lineitem": [("l_extendedprice", "l_orderkey * 10 + l_linenumber"),
                 ("l_discount", "l_orderkey * 10 + l_linenumber + 1"),
                 ("l_tax", "l_orderkey * 10 + l_linenumber + 2")],
}
for t, cols in jobs.items():
    if not cols:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        continue
    repl = ", ".join(adv(c, k) for c, k in cols)
    con.execute(f"COPY (SELECT * REPLACE ({repl}) FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
print("wrote", dst)
for t in ["events", "lineitem"]:
    print(t, con.execute(f"select * from (select {jobs[t][0][0]} from '{dst}/{t}.parquet') limit 5").fetchall())
