"""BPE trainer/encoder: independent-Python differential + invariants."""

from __future__ import annotations

from collections import Counter

import pytest

from rdf_knowledge_extractor_spark.operators.bpe import (
    bpe_encode,
    bpe_merges_df,
    train_bpe,
)

TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "low new low new lowest newest",
    "the the the the",
]


def _reference_train(texts, n_merges, min_pair_count=2):
    """Independent plain-Python Sennrich-style trainer (no operator
    code reused): word-frequency table, weighted adjacent-pair counts,
    argmax with (count desc, left, right) tie-break, leftmost
    non-overlapping merge."""
    words = Counter()
    for t in texts:
        words.update(t.lower().split())
    segs = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


def _docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), ["doc_id", "text"]
    )


def test_train_matches_independent_reference(spark):
    got = train_bpe(_docs(spark), n_merges=12)
    want = _reference_train(TEXTS, n_merges=12)
    assert got == want
    assert len(got) >= 6  # corpus genuinely supports several merges


def test_merges_df_shape(spark):
    df = bpe_merges_df(_docs(spark), n_merges=5)
    rows = df.collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.merged == r.left + r.right for r in rows)
    # counts are non-increasing: each merge takes the current argmax
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_encode_round_trip_and_compression(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=12)
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        toks = out[i].tokens
        # lossless: concatenating tokens reproduces the words
        assert "".join(toks) == "".join(t.lower().split())
        assert out[i].n_tokens == len(toks)
        # trained merges compress below character count
        assert len(toks) < sum(len(w) for w in t.split())
    # frequent whole words become single tokens
    assert "low" in set(out[0].tokens)


def test_encode_with_no_merges_is_chars(spark):
    docs = spark.createDataFrame([(1, "ab cd")], ["doc_id", "text"])
    row = bpe_encode(docs, []).collect()[0]
    assert row.tokens == ["a", "b", "c", "d"]


def test_train_validates_and_stops_early(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        train_bpe(docs, 0)
    # all words are single chars: nothing to merge
    assert train_bpe(docs, 5) == []
