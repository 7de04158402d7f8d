"""Iceberg-first source helpers (parquet fallback path in this sandbox)."""

from __future__ import annotations

import os

import pytest

from docling_core_spark.sources.iceberg import iceberg_available, prune_scan, read_pages

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not available")


def test_read_pages_fallback(spark, tmp_path):
    from docling_core_spark.sources.web_pages import web_pages_df

    src = str(tmp_path / "pages")
    web_pages_df(spark, SF_DIR).limit(30).write.parquet(src)
    df = read_pages(spark, src)
    assert df.count() == 30
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_prune_scan_pushdown(spark, tmp_path):
    from docling_core_spark.sources.web_pages import web_pages_df

    src = str(tmp_path / "pages")
    web_pages_df(spark, SF_DIR).write.parquet(src)
    pruned = prune_scan(read_pages(spark, src), langs=["en"], ts_from="2024-01-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan  # filters reach the scan
    assert pruned.count() > 0
    assert pruned.filter("lang <> 'en'").count() == 0


def test_iceberg_probe_is_safe(spark):
    assert iceberg_available(spark) in (True, False)
