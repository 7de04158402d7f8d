"""Link-graph operator tests (operators/linkgraph.py): href extraction
vs the DuckDB oracle, integer PageRank vs the python twin, partitioning
independence, scheme filtering."""

from __future__ import annotations

import duckdb
import pytest

from docling_core_spark.operators.linkgraph import (
    extract_outlinks,
    host_edges,
    host_pagerank,
    link_demo_pages,
    link_demo_pages_sql,
    outlink_edges_sql,
    py_host_pagerank,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def demo(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    pages = link_demo_pages(docs)
    ol = extract_outlinks(pages)
    edges = host_edges(ol)
    return pages, ol, edges


class TestOutlinks:
    def test_matches_duckdb_oracle(self, demo):
        _, ol, _ = demo
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        exp = sorted(
            map(tuple, con.sql(outlink_edges_sql(link_demo_pages_sql())).fetchall())
        )
        got = sorted(
            (r.url, r.src_host, r.out_url, r.dst_host, r.is_internal)
            for r in ol.collect()
        )
        assert got == exp and len(got) > 0

    def test_scheme_and_fragment_filtering(self, spark):
        pages = spark.createDataFrame(
            [
                (
                    "https://a.com/x",
                    '<a href="mailto:x@y">m</a><a href="#top">f</a>'
                    '<a href="javascript:void(0)">j</a><a href="tel:+1">t</a>'
                    '<a href="data:text/plain,x">d</a>'
                    '<a href="/keep">k</a><a href="https://b.com/p">a</a>'
                    '<a href="relative/path">rel</a>',
                )
            ],
            "url string, html string",
        )
        got = sorted(r.out_url for r in extract_outlinks(pages).collect())
        assert got == ["https://a.com/keep", "https://b.com/p"]

    def test_binary_html_column(self, spark):
        pages = spark.createDataFrame(
            [("https://a.com/", bytearray(b'<a href="https://b.com/">l</a>'))],
            "url string, html binary",
        )
        rows = extract_outlinks(pages).collect()
        assert [r.dst_host for r in rows] == ["b.com"]
        assert rows[0].is_internal is False

    def test_internal_flag_and_host_edges(self, spark):
        pages = spark.createDataFrame(
            [("https://a.com/x", '<a href="/in">i</a><a href="https://b.com/">o</a>')],
            "url string, html string",
        )
        ol = extract_outlinks(pages)
        assert {(r.dst_host, r.is_internal) for r in ol.collect()} == {
            ("a.com", True),
            ("b.com", False),
        }
        # host_edges drops self-loops by default
        e = {(r.src_host, r.dst_host) for r in host_edges(ol).collect()}
        assert e == {("a.com", "b.com")}


class TestPageRank:
    def test_matches_python_twin(self, demo):
        _, _, edges = demo
        got = sorted(
            (r.host, r.rank_units, r.rank)
            for r in host_pagerank(edges, iterations=10).collect()
        )
        py_edges = sorted(
            (r.src_host, r.dst_host, r.n_links) for r in edges.collect()
        )
        exp = sorted(
            (d["host"], d["rank_units"], d["rank"])
            for d in py_host_pagerank(py_edges, iterations=10)
        )
        assert got == exp

    def test_partitioning_independence(self, demo):
        _, _, edges = demo
        a = sorted(
            (r.host, r.rank_units)
            for r in host_pagerank(edges, iterations=6).collect()
        )
        b = sorted(
            (r.host, r.rank_units)
            for r in host_pagerank(edges.repartition(13), iterations=6).collect()
        )
        assert a == b

    def test_hub_ranks_first_non_vacuous(self, demo):
        """The demo graph must differentiate ranks (vacuous-green rule):
        the site0 hub gets every third page's extra link."""
        _, _, edges = demo
        ranks = {
            r.host: r.rank_units
            for r in host_pagerank(edges, iterations=10).collect()
        }
        top = max(ranks, key=ranks.get)
        assert top == "site0.example.com"
        assert len(set(ranks.values())) > 1

    def test_dangling_mass_conserved(self, spark):
        """A sink host (no outlinks) must not leak rank mass: totals stay
        ~n*scale (floor-division remainders only)."""
        edges = spark.createDataFrame(
            [("a.com", "b.com", 1), ("c.com", "b.com", 2)],
            "src_host string, dst_host string, n_links long",
        )
        rows = host_pagerank(edges, iterations=8).collect()
        total = sum(r.rank_units for r in rows)
        n, scale = 3, 10**9
        assert abs(total - n * scale) < n * 100  # bounded floor drift

    def test_empty_graph(self, spark):
        edges = spark.createDataFrame(
            [], "src_host string, dst_host string, n_links long"
        )
        assert host_pagerank(edges, iterations=3).count() == 0


class TestReviewRegressions:
    """Round-8 review findings over the link graph."""

    def test_protocol_relative_and_uppercase_scheme(self, spark):
        pages = spark.createDataFrame(
            [
                (
                    "http://a.com/x",
                    '<a href="//cdn.b.com/lib.js">p</a>'
                    '<a href="HTTP://c.com/P">u</a>'
                    '<a href="/rel">r</a>',
                )
            ],
            "url string, html string",
        )
        rows = {r.out_url: r for r in extract_outlinks(pages).collect()}
        # protocol-relative resolves with the PAGE scheme, external host
        assert "http://cdn.b.com/lib.js" in rows
        assert rows["http://cdn.b.com/lib.js"].dst_host == "cdn.b.com"
        assert rows["http://cdn.b.com/lib.js"].is_internal is False
        # uppercase scheme still parses a (lowered) host
        assert rows["HTTP://c.com/P"].dst_host == "c.com"
        # root-relative keeps the page's own scheme (no https fabrication)
        assert "http://a.com/rel" in rows

    def test_ws_class_matches_oracle(self, spark):
        """\\x0B in the href value must behave identically in both engines
        (the WS-constant rule: Java \\s has \\x0B, RE2's does not)."""
        import duckdb

        html = '<a href="/a\x0bb">v</a><a href="/ok">k</a>'
        pages = spark.createDataFrame(
            [("https://a.com/", html)], "url string, html string"
        )
        got = sorted(r.out_url for r in extract_outlinks(pages).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE pages AS SELECT 'https://a.com/' AS url, ? AS html", [html])
        exp = sorted(
            r[2] for r in con.sql(outlink_edges_sql("SELECT * FROM pages")).fetchall()
        )
        assert got == exp

    def test_contrib_decomposition_no_overflow(self, spark):
        """Hub-scale ranks: rank*w would overflow int64; the decomposed
        contrib must still equal the python twin's bigint math."""
        big = 3 * 10**17  # plausible total-mass-scale rank
        edges = spark.createDataFrame(
            [("hub.com", "a.com", 40), ("hub.com", "b.com", 60)],
            "src_host string, dst_host string, n_links long",
        )
        from pyspark.sql import functions as F

        # seed the loop at 'big' by scaling: run 1 iteration with scale=big
        got = {
            r.host: r.rank_units
            for r in host_pagerank(edges, iterations=1, scale=big).collect()
        }
        exp = {
            d["host"]: d["rank_units"]
            for d in py_host_pagerank(
                [("hub.com", "a.com", 40), ("hub.com", "b.com", 60)],
                iterations=1,
                scale=big,
            )
        }
        assert got == exp
        assert all(v > 0 for v in got.values())
        _ = F
