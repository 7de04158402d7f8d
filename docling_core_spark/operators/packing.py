"""Sequence packing: chunks -> training sequences under a token budget.

The last mile between this engine's chunk table (operators/extract.py
explode_chunks) and a training dataloader: greedy next-fit packs each
document's chunks, in chunk order, into sequences of at most ``max_tokens``
tokens, emitting one manifest row per packed sequence.

Scale design:
- Packing is stateful-sequential WITHIN a document but embarrassingly
  parallel ACROSS documents, so the operator is one shuffle on url followed
  by an Arrow-batched applyInPandas — groups are document-sized (tens of
  chunks), never unbounded, so no group can hot-spot a task the way a
  corpus-wide key could.
- The packing core is pure python shared verbatim with the single-process
  expected oracle (oracle_expected pattern): distributed == single-process
  per url is the checked invariant.
- Cross-document packing (filling the tail of one doc's last sequence with
  the next doc's chunks) is deliberately NOT done: it would impose a global
  order — a total sort at 100 TB — for a small fill win; the per-doc
  fill_frac column lets a pipeline measure that loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from docling_core_spark.operators.canon import canonical_order

PACK_MAX_TOKENS = 512


def pack_doc_chunks(
    url: str, chunks: list[tuple[int, int]], max_tokens: int = PACK_MAX_TOKENS
) -> list[dict]:
    """Greedy next-fit over (chunk_idx, n_tokens) pairs IN ORDER.

    A sequence closes when the next chunk would overflow ``max_tokens``;
    a single chunk larger than the budget becomes its own sequence with
    ``oversize`` set (callers split or drop those downstream).  Pure python,
    shared by the Spark UDF and the expected-oracle builder.
    """
    seqs: list[dict] = []
    cur: list[int] = []
    cur_tokens = 0
    for idx, tok in chunks:
        tok = int(tok)
        if cur and cur_tokens + tok > max_tokens:
            seqs.append((cur, cur_tokens))
            cur, cur_tokens = [], 0
        cur.append(int(idx))
        cur_tokens += tok
    if cur:
        seqs.append((cur, cur_tokens))
    return [
        {
            "url": url,
            "seq_idx": k,
            "seq_id": f"{url}#{k}",
            "chunk_idxs": "|".join(str(i) for i in idxs),
            "n_chunks": len(idxs),
            "total_tokens": total,
            "fill_frac": round(total / max_tokens, 6),
            "oversize": total > max_tokens,
        }
        for k, (idxs, total) in enumerate(seqs)
    ]


PACK_SCHEMA = (
    "url string, seq_idx int, seq_id string, chunk_idxs string, "
    "n_chunks long, total_tokens long, fill_frac double, oversize boolean"
)
_PACK_COLS = [
    "url", "seq_idx", "seq_id", "chunk_idxs",
    "n_chunks", "total_tokens", "fill_frac", "oversize",
]


def pack_sequences(
    chunks: DataFrame, max_tokens: int = PACK_MAX_TOKENS, canonical=None
) -> DataFrame:
    """Pack an explode_chunks output into per-document training sequences:
    (url, seq_idx, seq_id, chunk_idxs, n_chunks, total_tokens, fill_frac,
    oversize).  Input needs (url, chunk_idx, n_tokens); everything else is
    pruned before the shuffle."""
    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("chunk_idx")
        rows = pack_doc_chunks(
            str(pdf["url"].iloc[0]),
            list(zip(pdf["chunk_idx"], pdf["n_tokens"])),
            max_tokens,
        )
        return pd.DataFrame(rows, columns=_PACK_COLS)

    return (
        chunks.select("url", "chunk_idx", "n_tokens")
        .groupBy("url")
        .applyInPandas(pack, PACK_SCHEMA)
        .transform(lambda d: canonical_order(d, "url", "seq_idx", canonical=canonical))
    )
