"""Distributed BPE tokenizer training + tokenization (Sennrich 2016).

From-scratch byte-pair-encoding on Spark, built for the 100 TB shape:

- The corpus collapses to a distinct ``(word, freq)`` table with ONE
  hash-aggregate scan; the iterative merge loop then runs entirely over that
  (comparatively tiny) word table — the corpus is never touched again.
- Each merge round is (a) an exploded adjacent-pair count with map-side
  partial aggregation, (b) a one-row global ``min(struct(-cnt, a, b))`` for
  the best pair (max count, then lexicographically smallest pair — the
  deterministic tie-break the oracle mirrors), (c) a pure-Catalyst
  ``F.aggregate`` fold that rewrites each word's symbol array left-to-right
  greedily (identical to re.sub non-overlapping replacement in the original
  subword-nmt).  The only driver traffic per round is the single best-pair
  row — the same bounded-loop-state pattern as duplicate_clusters and the
  k-means IVF refiner.
- The word table is ``localCheckpoint``ed every round: the merge fold wraps
  the symbols column, so without a lineage cut N rounds would nest N
  aggregate expressions (the round-6 kmeans lesson, applied from day one).

Tokenization re-derives the word→tokens mapping by replaying the merge list
over the DISTINCT words of the target corpus and broadcast-joins it back —
per-word work happens once per distinct word, not once per occurrence.

Oracle: the same algorithm in pure python (oracle_expected._build_bpe),
single-process, byte-identical by construction (ASCII symbols, so Spark's
UTF8 binary ordering == python tuple ordering).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from docling_core_spark.operators.canon import canonical_order
from docling_core_spark.operators.dedup import norm_words

END_OF_WORD = "</w>"  # separate terminal symbol, Sennrich-style


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) over the normalized corpus — the one corpus-wide scan.

    At 10^12 documents this is a single shuffle keyed on the word string;
    everything downstream operates on the distinct-word table.
    """
    return (
        docs.select(F.explode(norm_words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word_col):
    """Characters plus the terminal END_OF_WORD symbol."""
    return F.concat(
        F.split(word_col, ""),  # one-char symbols
        F.array(F.lit(END_OF_WORD)),
    )


def _merge_fold(a: str, b: str):
    """Factory for the greedy left-to-right merge fold (bind a/b by value —
    HOF lambdas must take exactly the engine-passed args, no closures with
    defaults).  Appends each symbol, collapsing a trailing [.., a] + b into
    [.., a+b]; F.get returns NULL on the empty accumulator so the predicate
    is safely false at the start (never an ANSI index error)."""
    merged = a + b

    def fold(acc, x):
        last = F.get(acc, F.size(acc) - 1)
        return F.when(
            (last == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return fold


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(a, b, cnt): frequency-weighted adjacent symbol pair counts.

    zip_with over shifted slices (the repo-standard n-gram window; never
    element_at-per-index), exploded, then a hash-agg with map-side partials
    — a hot pair ("th","e</w>" at English scale) combines locally before the
    shuffle.
    """
    n = F.size(F.col("symbols"))
    pairs = words.filter(n >= 2).select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice(F.col("symbols"), 1, n - 1),
                F.slice(F.col("symbols"), 2, n - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").alias("cnt")
    )


def _select_disjoint_batch(
    cands: list, k: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    """Greedy symbol-disjoint prefix of the (−cnt, a, b)-ordered candidate
    list: a pair joins the batch only if neither side collides with a
    symbol or merged output already claimed this round, so the K folds
    commute with each other (application order within the round cannot
    matter)."""
    used: set = set()
    batch: list[tuple[str, str, int]] = []
    for row in cands:
        cnt = -row["nc"]
        if cnt < min_pair_count:
            break
        a, b = row["a"], row["b"]
        if a in used or b in used:
            continue
        batch.append((a, b, cnt))
        used.update((a, b, a + b))
        if len(batch) >= k:
            break
    return batch


def bpe_train(
    docs: DataFrame,
    num_merges: int = 60,
    min_pair_count: int = 2,
    words: Optional[DataFrame] = None,
    merges_per_round: int = 1,
    checkpoint_dir: Optional[str] = None,
    _fault_after_round: Optional[int] = None,
) -> DataFrame:
    """Train a BPE merge list over the corpus.

    Returns (rank, left, right, merged, pair_count) — one row per learned
    merge in application order.  Stops early when the best remaining pair
    falls below ``min_pair_count`` (mirrored in the oracle).

    ``merges_per_round``: the vocab-size scale knob.  Sequential BPE is one
    driver round per merge — exact, but a 32k-subword vocabulary means 32k
    small jobs.  With K>1, each round takes the top-K SYMBOL-DISJOINT pairs
    from one pair count (greedy by the same (−cnt, a, b) order) and applies
    them together, cutting rounds by ~K.  This is the standard fast-trainer
    approximation: disjointness makes the K folds commute, but a pair
    created by an earlier merge in the same round could in principle
    outrank a later selection, so the result can differ from strictly
    sequential training (it is still a valid, deterministic BPE vocab).
    The oracle-checked default K=1 is exactly sequential.

    ``checkpoint_dir``: opt-in round-level resume.  The complete driver
    state of a round is the merge list itself, so each round commits it to
    the ``_rounds`` log (sources/checkpoint.py); a restarted job reloads
    the committed merges and rebuilds the symbol state by REPLAYING them
    over a fresh word table (training folds and replay folds are the same
    deterministic greedy fold, so the rebuilt state is exactly what the
    killed run held), then continues from the next round — training a 32k
    vocab survives driver failure without restarting from merge zero.
    ``_fault_after_round`` is the test chaos hook: raise after committing
    round k, the window a real crash leaves behind.
    """
    from docling_core_spark.sources.checkpoint import commit_round, committed_rounds

    spark = docs.sparkSession
    if words is None:
        words = word_freqs(docs)

    def _as_df(ms):
        return spark.createDataFrame(
            ms, "rank int, left string, right string, merged string, pair_count bigint"
        ).transform(lambda d: canonical_order(d, "rank"))

    # delta log: each round commits ONLY its new merges (the full-list form
    # was quadratic in num_merges — ~30 GB of driver JSON at a 32k vocab);
    # resume concatenates the committed deltas in round order.  params pins
    # the knobs that change the merge SEQUENCE (a different batch size
    # selects different disjoint batches); num_merges itself is NOT a param
    # because BPE merges are prefix-stable — the first k merges of a longer
    # run are exactly a k-merge run, so a shorter request slices and a
    # longer request keeps training.
    ckpt_params = {
        "op": "bpe",
        "merges_per_round": merges_per_round,
        "min_pair_count": min_pair_count,
    }
    merges: list[tuple[int, str, str, str, int]] = []
    round_no = 0
    exhausted = False
    if checkpoint_dir is not None:
        recs = committed_rounds(checkpoint_dir, params=ckpt_params)
        if recs:
            for rec in recs:
                merges.extend(tuple(m) for m in rec["delta"])
            round_no = recs[-1]["round"]
            exhausted = bool(recs[-1].get("exhausted"))
        if len(merges) >= num_merges:
            return _as_df(merges[:num_merges])
        if exhausted:
            return _as_df(merges)  # corpus has no more mergeable pairs
    if merges:
        words = (
            apply_merges(words, [(a, b) for _, a, b, _, _ in merges])
            .select("freq", F.col("tokens").alias("symbols"))
            .localCheckpoint(eager=False)
        )
    else:
        words = words.select(
            "freq", _initial_symbols(F.col("word")).alias("symbols")
        ).localCheckpoint(eager=False)

    superseded: Optional[DataFrame] = None
    while len(merges) < num_merges:
        k = min(merges_per_round, num_merges - len(merges))
        pairs = _adjacent_pairs(words)
        if k == 1:
            row = (
                pairs.agg(
                    F.min(
                        F.struct(
                            (-F.col("cnt")).alias("nc"), F.col("a"), F.col("b")
                        )
                    ).alias("m")
                )
                .select("m.*")
                .first()
            )
            cands = [] if row is None or row["nc"] is None else [row]
        else:
            # top slice by the same deterministic order; 8x headroom so the
            # disjointness filter rarely exhausts the slice
            cands = (
                pairs.select(
                    (-F.col("cnt")).alias("nc"), F.col("a"), F.col("b")
                )
                .orderBy("nc", "a", "b")
                .limit(8 * k)
                .collect()
            )
        # the pair-count action above just materialized the CURRENT words
        # checkpoint, so the previous round's blocks can never be read again
        # (a lost-block recompute would fail regardless — truncated lineage);
        # freeing them here bounds block-manager storage to ~2 copies of the
        # word table instead of one per round (32k-vocab scale would
        # otherwise pin thousands)
        if superseded is not None:
            _unpersist_checkpoint(superseded)
            superseded = None
        batch = _select_disjoint_batch(cands, k, min_pair_count)
        if not batch:
            if checkpoint_dir is not None:
                commit_round(
                    checkpoint_dir,
                    round_no + 1,
                    {"delta": [], "exhausted": True},
                    params=ckpt_params,
                )
            break
        col = F.col("symbols")
        round_delta_from = len(merges)
        for a, b, cnt in batch:
            merges.append((len(merges), a, b, a + b, cnt))
            if k == 1:
                # guarded fold: skip words without the pair (the when/
                # otherwise doubles the expression tree, safe at depth 1)
                col = F.when(
                    F.array_contains(F.col("symbols"), a)
                    & F.array_contains(F.col("symbols"), b),
                    F.aggregate(
                        F.col("symbols"),
                        F.array().cast("array<string>"),
                        _merge_fold(a, b),
                    ),
                ).otherwise(F.col("symbols"))
            else:
                # batched: unguarded nested folds reference the previous
                # expression ONCE each (linear tree depth K; a when-guard
                # here would double the tree per merge -> 2^K blowup)
                col = F.aggregate(
                    col, F.array().cast("array<string>"), _merge_fold(a, b)
                )
        superseded = words
        words = words.withColumn("symbols", col).localCheckpoint(eager=False)
        # lazy localCheckpoint still truncates the LOGICAL plan immediately
        # (the returned frame is RDD-backed), so each round compiles exactly
        # K folds deep; materialization rides the next round's action —
        # one job per ROUND, not per merge
        round_no += 1
        if checkpoint_dir is not None:
            commit_round(
                checkpoint_dir,
                round_no,
                {"delta": merges[round_delta_from:]},
                params=ckpt_params,
            )
        if _fault_after_round is not None and round_no >= _fault_after_round:
            raise RuntimeError(
                f"injected fault after committed round {round_no} (chaos hook)"
            )
    return _as_df(merges)


class BPETokenizer:
    """Pluggable chunker tokenizer backed by a trained BPE merge list.

    Duck-types the chunker tokenizer protocol (count_tokens /
    get_max_tokens — see functions/chunkers.py), so a vocabulary trained by
    ``bpe_train`` on the target corpus replaces the default regex proxy in
    HybridChunker / semchunk without touching either.  Pure python row code
    (runs inside the same executor batch as the chunkers); per-word memo
    because merge replay dominates and word frequency is Zipfian.

    Construct with ``BPETokenizer.from_merges_df(bpe_train(docs).collect())``
    or any [(left, right), ...] list.  Counting normalizes like training
    (lowercase alnum words) — punctuation carries no subword mass.
    """

    _MEMO_MAX = 65536

    def __init__(self, merges: list[tuple[str, str]], max_tokens: int = 512):
        self.merges = [(a, b, a + b) for a, b in merges]
        self.max_tokens = max_tokens
        self._memo: dict[str, int] = {}

    @classmethod
    def from_merges_df(cls, merges_df: DataFrame, max_tokens: int = 512):
        rows = merges_df.orderBy("rank").collect()
        return cls([(r["left"], r["right"]) for r in rows], max_tokens)

    def encode_word(self, word: str) -> list[str]:
        """Replay the merge list in rank order — the exact pure-python
        mirror of the distributed fold (oracle_expected._bpe_fold)."""
        sym = list(word) + [END_OF_WORD]
        for a, b, m in self.merges:
            if a in sym and b in sym:
                out: list[str] = []
                for x in sym:
                    if out and out[-1] == a and x == b:
                        out[-1] = m
                    else:
                        out.append(x)
                sym = out
        return sym

    def _word_len(self, word: str) -> int:
        n = self._memo.get(word)
        if n is None:
            n = len(self.encode_word(word))
            if len(self._memo) >= self._MEMO_MAX:
                self._memo.clear()
            self._memo[word] = n
        return n

    def count_tokens(self, text: str) -> int:
        import re

        words = re.sub(r"[^a-z0-9 ]", "", (text or "").lower()).split()
        return sum(self._word_len(w) for w in words)

    def get_max_tokens(self) -> int:
        return self.max_tokens


def apply_merges(
    words: DataFrame, merges: list[tuple[str, str]], merges_per_checkpoint: int = 16
) -> DataFrame:
    """Replay a trained merge list over a (word, ...) frame; adds ``tokens``.

    Folds are UNGUARDED: each round's fold references the previous tokens
    expression exactly once, so the plan grows linearly within a window (a
    ``when(has_pair)`` pre-filter would reference it 4x and grow the tree
    4^K between cuts — the round-7 batching rule; a no-match fold is the
    identity, so results are unchanged).  Every ``merges_per_checkpoint``
    folds the plan is cut with an EAGER localCheckpoint and the superseded
    window's blocks are unpersisted as the loop advances — at most two
    copies of the frame live in block-manager storage at any time, instead
    of one pinned copy per merge (a 32k-vocab replay would otherwise pin
    ~2k copies of the distinct-word table for the whole job).  Cost: one
    Spark job per window (ceil(len(merges)/K)); a local-checkpointed RDD
    cannot be recomputed, so the predecessor is only dropped AFTER its
    successor has materialized.
    """
    out = words.withColumn("tokens", _initial_symbols(F.col("word")))
    prev_ck = None
    for i, (a, b) in enumerate(merges):
        out = out.withColumn(
            "tokens",
            F.aggregate(
                F.col("tokens"),
                F.array().cast("array<string>"),
                _merge_fold(a, b),
            ),
        )
        if (i + 1) % merges_per_checkpoint == 0 and (i + 1) < len(merges):
            out = out.localCheckpoint(eager=True)
            if prev_ck is not None:
                _unpersist_checkpoint(prev_ck)
            prev_ck = out
    return out


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Free a superseded local checkpoint's block-manager storage.

    DataFrame.localCheckpoint exposes no unpersist handle; the backing RDD
    sits inside the LogicalRDD node of the checkpointed frame's analyzed
    plan.  Only call this once every downstream consumer has materialized —
    a local checkpoint's lineage is truncated, so its blocks cannot be
    recomputed.  Best-effort: storage cleanup must never fail a query.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — py4j surface may shift across versions
        pass


def bpe_tokenize(
    docs: DataFrame,
    merges_df: Optional[DataFrame] = None,
    num_merges: int = 60,
    preview_tokens: int = 12,
) -> DataFrame:
    """Tokenize the corpus with a trained BPE vocabulary.

    Scale shape: the merge replay runs over DISTINCT words only; the
    word→tokens dictionary is then broadcast-joined back to the exploded
    corpus (per-word cost paid once, not per occurrence — at crawl scale the
    distinct-word table is orders of magnitude smaller than the token
    stream).  Returns (doc_id, n_words, n_bpe_tokens, token_preview) with
    the preview JSON-stringified for the scalar-only driver boundary.
    """
    if merges_df is None:
        merges_df = bpe_train(docs, num_merges=num_merges)
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()  # tiny: the merge list
    ]
    doc_words = docs.select(
        "doc_id", F.posexplode(norm_words(F.col("text"))).alias("pos", "word")
    ).filter(F.col("word") != "")
    vocab = apply_merges(
        doc_words.select("word").distinct(), merges
    )
    tokenized = doc_words.join(F.broadcast(vocab), "word")
    return (
        tokenized.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("tokens")).alias("n_bpe_tokens"),
            F.min_by(F.col("tokens"), F.col("pos")).alias("first_word_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            F.to_json(F.slice("first_word_tokens", 1, preview_tokens)).alias(
                "token_preview"
            ),
        )
        .transform(lambda d: canonical_order(d, "doc_id"))
    )
