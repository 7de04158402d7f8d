"""Same-code spread A/B for the r6->r7 dedup_exact bench delta (r7 VERDICT
"What's wrong" #2).

`exact_duplicates` (and `rel_pricing_summary`) did not change between rounds
6 and 7 (verified: no diff), so the committed-bench delta (0.64 -> 1.03 s,
0.32 -> 0.44 s) measures the HOST, not the code.  On this machine only
interleaved same-process timings are valid (CLAUDE.md): this script warms
the workers, then interleaves N repetitions of both queries and prints every
timing plus the spread — if the same-code spread covers the committed delta,
the regression is attributed to noise.

Usage: python scripts/ab_exact.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from docling_core_spark.operators import relational  # noqa: E402
from docling_core_spark.operators.dedup import (  # noqa: E402
    exact_duplicates,
    with_synthetic_duplicates,
)
from docling_core_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()  # warm the cache + workers

    def run_exact() -> float:
        t0 = time.perf_counter()
        exact_duplicates(with_synthetic_duplicates(docs)).count()
        return time.perf_counter() - t0

    def run_rel() -> float:
        t0 = time.perf_counter()
        relational.pricing_summary(spark, sf_dir).count()
        return time.perf_counter() - t0

    run_exact(), run_rel()  # one warm pass each (plan compile + codegen)
    exact_t, rel_t = [], []
    for _ in range(rounds):
        exact_t.append(round(run_exact(), 3))
        rel_t.append(round(run_rel(), 3))
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "dedup_exact": exact_t,
        "dedup_exact_best": min(exact_t),
        "dedup_exact_worst": max(exact_t),
        "rel_pricing_summary": rel_t,
        "rel_pricing_summary_best": min(rel_t),
        "rel_pricing_summary_worst": max(rel_t),
        "loadavg": os.getloadavg(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
