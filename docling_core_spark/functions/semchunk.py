"""Exact reimplementation of the public semchunk recursive splitting algorithm.

The reference HybridChunker delegates plain-text splitting to the semchunk
package (reference hybrid_chunker.py:320-326: ``semchunk.chunkerify(
tokenizer, chunk_size=available_length)(text)``); the package itself is not
installable in this environment, so the algorithm is reimplemented here from
its published specification:

1. Split the text with the most semantically meaningful splitter present:
   a. the largest sequence of newlines and/or carriage returns,
   b. the largest sequence of tabs,
   c. the largest sequence of whitespace characters,
   d. sentence terminators   . ? ! *
   e. clause separators      ; , ( ) [ ] " " ' ' ' " `
   f. sentence interrupters  : — …
   g. word joiners           / \\ – & -
   h. any character (character-level split) as a last resort.
2. Recursively split any piece still exceeding ``chunk_size`` tokens.
3. Merge consecutive under-sized pieces back together while the merged text
   stays within ``chunk_size`` tokens.
4. Reattach non-whitespace splitters to the end of the preceding chunk when
   that does not push it over ``chunk_size``; otherwise emit the splitter as
   its own chunk. Whitespace splitters are dropped at the merge boundaries.
5. At the top level of the recursion, drop empty chunks.

Canonical behavior pin (semchunk's published usage example): splitting
"The quick brown fox jumps over the lazy dog." at 4 whitespace-counted
tokens yields ['The quick brown fox', 'jumps over the', 'lazy dog.'].
"""

from __future__ import annotations

import re
from typing import Callable, Sequence

_NON_WHITESPACE_SEMANTIC_SPLITTERS = (
    ".", "?", "!", "*",  # sentence terminators
    ";", ",", "(", ")", "[", "]", "“", "”", "‘", "’",
    "'", '"', "`",  # clause separators
    ":", "—", "…",  # sentence interrupters
    "/", "\\", "–", "&", "-",  # word joiners
)

_NEWLINE_RUNS = re.compile(r"[\r\n]+")
_TAB_RUNS = re.compile(r"\t+")
_WS_RUNS = re.compile(r"\s+")
# single whitespace immediately preceded by a semantic splitter: the preferred
# split point within a single-spaced text run (punctuation stays on the left
# piece, the whitespace is the splitter and rejoins merged pieces). Behavior
# pinned against the reference chunker goldens (test/data/chunker/2*_out_
# chunks.json), where every plain-text split boundary lands right after
# . , ; ] " etc. with no leading space on the following chunk.
_SEMANTIC_WS = re.compile(
    "(?<=[" + re.escape("".join(_NON_WHITESPACE_SEMANTIC_SPLITTERS)) + r"])\s"
)


def _split_text(text: str) -> tuple[str, bool, list[str]]:
    """Pick the most semantic splitter present and split on it.

    Returns (splitter, splitter_is_whitespace, splits)."""
    if "\n" in text or "\r" in text:
        splitter = max(_NEWLINE_RUNS.findall(text))
        return splitter, True, text.split(splitter)
    if "\t" in text:
        splitter = max(_TAB_RUNS.findall(text))
        return splitter, True, text.split(splitter)
    if _WS_RUNS.search(text):
        splitter = max(_WS_RUNS.findall(text))
        if len(splitter) == 1 and _SEMANTIC_WS.search(text):
            return splitter, True, _SEMANTIC_WS.split(text)
        return splitter, True, text.split(splitter)
    for splitter in _NON_WHITESPACE_SEMANTIC_SPLITTERS:
        if splitter in text:
            return splitter, False, text.split(splitter)
    # no semantic splitter at all: character-level split
    return "", True, list(text)


def _merge_count(
    splits: Sequence[str],
    chunk_size: int,
    splitter: str,
    token_counter: Callable[[str], int],
) -> int:
    """Largest n >= 1 such that joining splits[:n] stays within chunk_size
    (binary search over the monotone join length)."""
    low, high = 1, len(splits)

    def fits(n: int) -> bool:
        return token_counter(splitter.join(splits[:n])) <= chunk_size

    if fits(high):
        return high
    while low < high:
        mid = (low + high + 1) // 2
        if fits(mid):
            low = mid
        else:
            high = mid - 1
    return max(low, 1)


def semchunk_split(
    text: str,
    chunk_size: int,
    token_counter: Callable[[str], int],
    _depth: int = 0,
) -> list[str]:
    """Split ``text`` into chunks of at most ``chunk_size`` tokens."""
    splitter, splitter_is_whitespace, splits = _split_text(text)
    chunks: list[str] = []
    skips: set[int] = set()
    n = len(splits)
    for i, split in enumerate(splits):
        if i in skips:
            continue
        if token_counter(split) > chunk_size:
            chunks.extend(semchunk_split(split, chunk_size, token_counter, _depth + 1))
        else:
            merged_n = _merge_count(splits[i:], chunk_size, splitter, token_counter)
            skips.update(range(i + 1, i + merged_n))
            chunks.append(splitter.join(splits[i : i + merged_n]))

        # reattach a non-whitespace splitter unless this was the last split
        is_last = i == n - 1 or all(j in skips for j in range(i + 1, n))
        if splitter and not splitter_is_whitespace and not is_last:
            candidate = chunks[-1] + splitter
            if token_counter(candidate) <= chunk_size:
                chunks[-1] = candidate
            else:
                chunks.append(splitter)

    if not _depth:
        chunks = [c for c in chunks if c]
    return chunks
