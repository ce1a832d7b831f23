"""ANN CDC endurance probe (SCALE.md): the persisted IVF-PQ index under a
CONTINUOUS change stream — every batch lands brand-new vectors, re-embeds
(upserts) a slice of the live set, and deletes another slice, through the
production StreamingAnnCdc face (landing dir -> availableNow drain ->
apply_cdc_to_ann_index's atomic META commits). Periodic compaction folds
the accumulated tombstones/append roots into one generation, exactly the
maintenance cadence a deployment runs.

Per batch it records: apply wall seconds, visible entry count, raw entry
rows across roots (read amplification before subtraction), outstanding
append/delete roots, and — every few batches — the wall time of a fixed
1k-query top-k probe against the index as it stands (the read-side cost
curve as roots accumulate and compaction resets them). At the end the
visible set is checked against the driver-side model (count + id-sum),
so the probe is also a correctness soak at volume.

Usage: python tools/ann_cdc_probe.py [n_batches] [per_batch] [compact_every]
                                     [centroid_mode]
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DIM = 64


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    centroid_mode = sys.argv[4] if len(sys.argv) > 4 else "lit"

    import pandas as pd
    from pyspark.sql import functions as F

    from connemara_spark.operators.annindex import (
        compact_ann_index, ivfpq_topk_indexed, load_ann_index,
    )
    from connemara_spark.session import get_spark
    from connemara_spark.streaming.ingest import StreamingAnnCdc

    spark = get_spark("ann-cdc-probe")
    spark.range(1).collect()

    rng = random.Random(11)
    new_n = int(per_batch * 0.6)
    ups_n = int(per_batch * 0.3)
    del_n = per_batch - new_n - ups_n

    def with_vectors(pdf: pd.DataFrame):
        """(vec_id, version, op) rows -> (vec_id, embedding, op): the
        vector is a pure function of (id, version), so a re-embed really
        changes the served vector and replays are deterministic."""
        df = spark.createDataFrame(pdf)
        emb = F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("vec_id") * DIM + j, F.col("version")), F.lit(997))
                / F.lit(997.0)
            ).cast("float"),
        )
        return df.select(
            "vec_id",
            F.when(F.col("op") == "upsert", emb).alias("embedding"),
            "op",
        )

    root = tempfile.mkdtemp(prefix="anncdc-probe-")
    live: list[int] = []  # swap-remove list; model of the live id set
    live_pos: dict[int, int] = {}
    next_id = 0
    try:
        land = os.path.join(root, "in")
        os.makedirs(land)
        index_dir = os.path.join(root, "index")
        cdc = StreamingAnnCdc(
            spark,
            landing_dir=land,
            index_dir=index_dir,
            checkpoint_dir=os.path.join(root, "ckpt"),
            bootstrap=True,
            max_files_per_trigger=1,
            build_params={
                "n_cells": 64, "m": 8, "k_cb": 16,
                "centroid_mode": centroid_mode,
            },
            dim=DIM,
        )
        base = time.time()
        probe_queries = None
        for b in range(n_batches):
            rows = []
            # brand-new ids
            fresh = list(range(next_id, next_id + new_n))
            next_id += new_n
            rows += [(i, b, "upsert") for i in fresh]
            # churn: disjoint upsert/delete samples from the live set
            churn = ups_n + del_n
            if b > 0 and len(live) > churn:
                picked = rng.sample(range(len(live)), churn)
                ups_ids = [live[p] for p in picked[:ups_n]]
                del_ids = [live[p] for p in picked[ups_n:]]
                rows += [(i, b, "upsert") for i in ups_ids]
                rows += [(i, 0, "delete") for i in del_ids]
                for i in del_ids:  # swap-remove keeps sampling O(1)
                    p = live_pos.pop(i)
                    last = live[-1]
                    live[p] = last
                    live_pos[last] = p
                    live.pop()
            for i in fresh:
                live_pos[i] = len(live)
                live.append(i)

            pdf = pd.DataFrame(rows, columns=["vec_id", "version", "op"])
            seg_tmp = os.path.join(root, f"st{b}")
            with_vectors(pdf).coalesce(1).write.parquet(seg_tmp)
            import glob

            part = glob.glob(os.path.join(seg_tmp, "part-*.parquet"))[0]
            dst = os.path.join(land, f"seg-{b:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (base + b, base + b))

            t0 = time.monotonic()
            cdc.run_until_drained(timeout_sec=1800)
            apply_sec = time.monotonic() - t0

            meta, _books, entries = load_ann_index(spark, index_dir)
            visible = entries.count()
            raw = sum(
                spark.read.parquet(p).count()
                for p in _entry_roots(index_dir, meta)
            )
            rec = {
                "batch": b,
                "apply_sec": round(apply_sec, 2),
                "visible": visible,
                "raw_rows": raw,
                "append_roots": len(meta.get("appends", [])),
                "delete_roots": len(meta.get("deletes", [])),
            }
            if b % compact_every == compact_every - 1:
                t0 = time.monotonic()
                compact_ann_index(spark, index_dir)
                rec["compact_sec"] = round(time.monotonic() - t0, 2)
            if b % compact_every in (compact_every - 2, compact_every - 1) or b == 0:
                if probe_queries is None:
                    probe_queries = with_vectors(
                        pd.DataFrame(
                            [(i, 0, "upsert") for i in range(1000)],
                            columns=["vec_id", "version", "op"],
                        )
                    ).select("vec_id", "embedding").localCheckpoint()
                t0 = time.monotonic()
                ivfpq_topk_indexed(probe_queries, index_dir, k=5, n_probe=4).count()
                rec["query_sec"] = round(time.monotonic() - t0, 2)
            print(json.dumps(rec), flush=True)

        # correctness soak: the visible set must equal the driver model
        _meta, _books, entries = load_ann_index(spark, index_dir)
        got = entries.agg(
            F.count(F.lit(1)).alias("n"), F.sum("vec_id").alias("s")
        ).collect()[0]
        want_n, want_s = len(live), sum(live)
        ok = got["n"] == want_n and got["s"] == want_s
        print(
            json.dumps(
                {
                    "summary": True,
                    "batches": n_batches,
                    "per_batch": per_batch,
                    "visible_final": got["n"],
                    "model_live": want_n,
                    "id_sum_match": bool(got["s"] == want_s),
                    "model_ok": bool(ok),
                }
            ),
            flush=True,
        )
        if not ok:
            raise SystemExit("MODEL MISMATCH — tombstone/upsert leak at volume")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _entry_roots(index_dir: str, meta: dict) -> list[str]:
    from connemara_spark.operators.annindex import _append_dir

    roots = [os.path.join(index_dir, meta.get("entries_dir", "entries.parquet"))]
    roots += [_append_dir(index_dir, b) for b in meta.get("appends", [])]
    return roots


if __name__ == "__main__":
    main()
