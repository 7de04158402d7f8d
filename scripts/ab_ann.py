"""Attribute the r3->r4 bench swings on similarity_ann_lsh + profile_collection.

Round-4 verdict (What's wrong #2): `similarity_ann_lsh` went 0.584 -> 1.225 s
and `profile_collection` 0.261 -> 0.403 s between BENCH_r03 and BENCH_r04 with
ZERO code changes on either path (loadavg_start was 16.89 for the r4 run).
The repo standard (BENCH/AB_DEDUP.md) is that deltas get attributed by an
interleaved same-process measurement, not assumed.  With identical code on
both sides there is no A/B pair to alternate; the valid experiment is the
variance profile of the same two queries repeated in ONE process: if the
run-to-run spread covers both rounds' numbers, the swing is host noise.

Usage: python scripts/ab_ann.py [sf_dir] [reps]
Prints one JSON line with per-query min/median/max plus the r3/r4 values.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from docling_core_spark.operators import profile, similarity  # noqa: E402
from docling_core_spark.session import get_spark  # noqa: E402

R3 = {"similarity_ann_lsh": 0.584, "profile_collection": 0.261}
R4 = {"similarity_ann_lsh": 1.225, "profile_collection": 0.403}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark(app_name="ab-ann")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32).cache()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(32).cache()
    docs.count(), emb.count()  # materialize + warm every worker

    queries = {
        "similarity_ann_lsh": lambda: similarity.ann_lsh_topk(emb).collect(),
        "profile_collection": lambda: profile.collection_stats(docs).collect(),
    }
    # one throwaway warm pass (codegen + python worker startup)
    for fn in queries.values():
        fn()

    times: dict[str, list[float]] = {k: [] for k in queries}
    for _ in range(reps):
        for name, fn in queries.items():  # interleaved
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in times.items():
        lo, med, hi = min(ts), statistics.median(ts), max(ts)
        out[name] = {
            "min": round(lo, 3),
            "median": round(med, 3),
            "max": round(hi, 3),
            "r3": R3[name],
            "r4": R4[name],
            "spread_covers_r3_r4": lo <= R3[name] * 1.15 and R4[name] <= hi * 1.15,
            "all": [round(x, 3) for x in ts],
        }
    out["_loadavg"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
