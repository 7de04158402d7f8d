"""Pure-python XXH64 must match Spark's xxhash64 exactly (the single-process
oracle builder depends on it for MinHash/SRP bucket parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_core_spark.functions.xxhash import spark_xxhash64


def test_spark_xxhash64_parity(spark):
    cases = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "hello world",
        "x" * 7,
        "y" * 8,
        "q" * 15,
        "z" * 31,
        "w" * 32,
        "v" * 33,
        "long string " * 10,
        "naïve café 東京 données",
        "tab\tnewline\n",
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h0"),
        F.xxhash64("s", F.lit(5)).alias("h_int"),
        F.xxhash64("s", F.lit(2**40)).alias("h_long"),
    ).collect()
    for r in rows:
        assert r["h0"] == spark_xxhash64(r["s"]), r["s"]
        assert r["h_int"] == spark_xxhash64(r["s"], 5), r["s"]
        assert r["h_long"] == spark_xxhash64(r["s"], 2**40), r["s"]


def test_known_vector():
    # XXH64("" , seed=0) is the published empty-input value 0xEF46DB3751D8E999
    from docling_core_spark.functions.xxhash import xxh64_bytes

    assert xxh64_bytes(b"", 0) == 0xEF46DB3751D8E999
