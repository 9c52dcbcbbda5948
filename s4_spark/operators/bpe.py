"""BPE merge induction on a sampled word-frequency substrate.

Completes the tokenizer-prep story started by q177 (vocab/OOV audit):
q177 builds the corpus word-frequency table; here the top-V words of
that table become the merge-learning sample and a driver-side loop
(k iterations, one best-pair reduction each — the same bounded-state
shape as q162's k-means centroids) learns the merge sequence that a
tokenizer's ``merges.txt`` ships.

Reference scope note: the reference (findcoo/S4) has no tokenizer; this
family exists for the LLM-training-data surface (SURVEY.md §2-B12).

SEMANTICS — single-scan merge application. A merge (l, r) is applied to
a segmentation by one left-to-right, non-overlapping scan: the padded
string ``' '+seg+' '`` has every ``' l r '`` occurrence replaced by
``' lr '`` exactly as ``str.replace`` / SQL ``replace()`` do. This is
deliberately the contract because Python, Spark (``F.replace``) and
DuckDB (``replace()``) share it bit-for-bit, which is what makes the
learned sequence ORACLE-CHECKABLE (the DuckDB oracle re-learns the
merges with an unrolled k-stage CTE chain using the same primitives).
It differs from textbook BPE in ONE corner: back-to-back occurrences of
the same pair sharing a boundary ('a b a b') merge one site per round
instead of all sites — the remaining site still holds the pair and is
picked up by a later round, so the learned vocabulary converges the
same way while every engine agrees on every intermediate state.

Pair counting weights each adjacent symbol position by the word's
corpus frequency (all positions, overlapping included — the standard
Sennrich counting). Ties break on the lexicographically smallest pair
string; Python code-point order, Spark UTF-8 binary order and DuckDB's
default binary collation coincide on UTF-8, so the tie-break is also
cross-engine stable.

Scale shape: learning touches only the top-V substrate (V×avg_len
driver bytes, V=256 default — within the repo's ≤256-row driver-state
budget); the corpus-wide APPLICATION of learned merges is a chain of k
``replace`` expressions over the distinct-word table — codegen'd,
shuffle-free, never touching the token stream row count.
"""

from __future__ import annotations


def char_seg(word: str) -> str:
    """Initial segmentation: one space between adjacent codepoints."""
    return " ".join(word)


def apply_merge(seg: str, left: str, right: str) -> str:
    """One single-scan application of merge (left, right) to ``seg``."""
    padded = f" {seg} ".replace(f" {left} {right} ", f" {left}{right} ")
    return padded[1:-1]


def pair_counts(segs: list[tuple[str, int]]) -> dict[str, int]:
    """Frequency-weighted adjacent-pair counts over (seg, n) rows.

    Keys are the pair as ``'l r'`` (the same string the SQL oracle
    groups on), so the tie-break comparison is on identical values.
    """
    counts: dict[str, int] = {}
    for seg, n in segs:
        sy = seg.split(" ")
        for a, b in zip(sy, sy[1:]):
            key = f"{a} {b}"
            counts[key] = counts.get(key, 0) + n
    return counts


def learn_merges(
    words: list[tuple[str, int]], k: int
) -> list[tuple[str, str, str]]:
    """Learn up to ``k`` merges from (word, freq) rows.

    Returns [(left, right, merged), ...] in merge order. Stops early if
    no pair remains (every word fully merged to one symbol).
    """
    segs = [(char_seg(w), n) for w, n in words]
    merges: list[tuple[str, str, str]] = []
    for _ in range(k):
        counts = pair_counts(segs)
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        left, right = best.split(" ")
        merges.append((left, right, left + right))
        segs = [(apply_merge(s, left, right), n) for s, n in segs]
    return merges


def segment(word: str, merges: list[tuple[str, str, str]]) -> str:
    """Apply a learned merge sequence to one word (single-scan rule)."""
    seg = char_seg(word)
    for left, right, _ in merges:
        seg = apply_merge(seg, left, right)
    return seg
