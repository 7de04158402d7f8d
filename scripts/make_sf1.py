"""Synthesize an sf1-scale dataset (10x sf0.1 ~= 50k docs) under /tmp for the
round-8 scale rehearsal (r7 VERDICT #7).

/root/testdata ships sf{0.001,0.01,0.1} and is read-only, so sf1 is derived
deterministically from sf0.1: ten re-keyed clones per table, with per-clone
content variation so the corpus does not degenerate into a 10x exact-dup
pathology (documents get a per-clone suffix token; embeddings get a
per-clone cyclic rotation, which preserves norms but changes neighbors;
relational keys shift by clone * 1e9 so joins stay 1:1).

Idempotent via a _complete marker. Usage:
    python scripts/make_sf1.py [out_dir]   # default /tmp/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

OFFSET = 1_000_000_000


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = "/root/testdata/sf0.1"
    marker = os.path.join(out_dir, "_complete")
    if os.path.exists(marker):
        print(f"{out_dir} already built")
        return

    from pyspark.sql import functions as F

    from docling_core_spark.session import get_spark

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))

    def clones(df, build):
        out = None
        for k in range(10):
            c = build(df, k)
            out = c if out is None else out.unionByName(c)
        return out

    docs = spark.read.parquet(f"{src}/documents.parquet")
    docs_sf1 = clones(
        docs,
        lambda d, k: d.select(
            (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
            # per-clone tail token: keeps length/quality distributions, breaks
            # exact-dup degeneracy (fingerprints differ across clones)
            F.concat(
                F.col("text"), F.lit(f" clonemark{k} v"), F.col("doc_id").cast("string")
            ).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + F.lit(14)).alias("n_chars"),
        ),
    )
    docs_sf1.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    dim = dim_row["d"]

    def emb_clone(d, k):
        rot = (
            F.col("embedding")
            if k == 0
            else F.concat(
                F.slice(F.col("embedding"), k + 1, dim - k),
                F.slice(F.col("embedding"), 1, k),
            )
        )
        return d.select(
            (F.col("vec_id") + F.lit(k * OFFSET)).alias("vec_id"),
            rot.alias("embedding"),
            "label",
        )

    clones(emb, emb_clone).repartition(16).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    key_shift = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
    }
    for table, keys in key_shift.items():
        t = spark.read.parquet(f"{src}/{table}.parquet")

        def shift(d, k, keys=keys):
            for c in keys:
                d = d.withColumn(c, F.col(c) + F.lit(k * OFFSET))
            return d

        clones(t, shift).repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )

    with open(marker, "w") as f:
        f.write("ok")
    print(f"built {out_dir}")


if __name__ == "__main__":
    main()
