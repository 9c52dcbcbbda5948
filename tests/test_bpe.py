"""Property tests for the BPE merge-induction operator family
(s4_spark/operators/bpe.py, q186/q187) — pure-Python, no Spark session.

The cross-engine bit-identity of the learned sequence is covered by the
q186/q187 oracle rows (tests/test_correctness.py); here we pin the
algorithmic properties the docstrings claim: determinism, monotone
compression (each merge round can only shrink the weighted symbol
count — the 'merges monotonically reduce OOV/compression' property from
VERDICT r4 item 6), character conservation, and the single-scan
application contract's agreement with plain str.replace.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from s4_spark.operators.bpe import (
    apply_merge,
    char_seg,
    learn_merges,
    pair_counts,
    segment,
)

WORDS = st.lists(
    st.tuples(st.text(alphabet="abcde", min_size=0, max_size=8), st.integers(1, 50)),
    min_size=1,
    max_size=30,
)


def total_symbols(words, merges):
    return sum(
        n * len(segment(w, merges).split(" ")) for w, n in words
    )


@given(WORDS)
@settings(max_examples=200, deadline=None)
def test_merges_monotonically_reduce_symbol_count(words):
    merges = learn_merges(words, 6)
    counts = [total_symbols(words, merges[:i]) for i in range(len(merges) + 1)]
    assert all(a > b for a, b in zip(counts, counts[1:])), counts
    # each learned merge must have applied at least once on the sample
    # (a merge that never fires would not have been the argmax pair)


@given(WORDS)
@settings(max_examples=200, deadline=None)
def test_characters_are_conserved(words):
    merges = learn_merges(words, 6)
    for w, _ in words:
        assert segment(w, merges).replace(" ", "") == w


@given(WORDS)
@settings(max_examples=100, deadline=None)
def test_learning_is_deterministic(words):
    assert learn_merges(words, 5) == learn_merges(sorted(words), 5) == learn_merges(
        list(reversed(words)), 5
    )


def test_single_scan_contract_back_to_back():
    """The documented corner: back-to-back occurrences sharing a
    boundary merge ONE site per scan (replace semantics), and the
    remaining site merges on a later application."""
    seg = char_seg("abab")  # 'a b a b'
    once = apply_merge(seg, "a", "b")
    assert once == "ab a b"
    assert apply_merge(once, "a", "b") == "ab ab"


def test_tie_break_is_lexicographic_smallest():
    # 'ba' and 'ab' pairs both appear twice; 'a b' < 'b a'
    words = [("ab", 1), ("ab", 1), ("ba", 2)]
    [(left, right, merged)] = learn_merges(words, 1)
    assert (left, right, merged) == ("a", "b", "ab")


def test_pair_counts_weight_by_frequency_and_count_overlaps():
    counts = pair_counts([("a a a", 3)])
    assert counts == {"a a": 6}  # two positions x freq 3


def test_learning_stops_when_fully_merged():
    merges = learn_merges([("ab", 5)], 10)
    assert merges == [("a", "b", "ab")]  # nothing left to merge after 1
