"""BPE merge learning + encode pass (operators/vocab.py).

The merge loop is verified against an independent step-by-step reference
on a corpus small enough to check by hand; the encode pass is verified by
re-applying the learned merges with a plain-python tokenizer.
"""

import pytest


def _ref_bpe(word_freqs, n_merges, eow="</w>"):
    """Independent reference learner (textbook Sennrich formulation)."""
    vocab = {tuple(w) + (eow,): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        nv = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(l + r); i += 2
                else:
                    out.append(syms[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + cnt
        vocab = nv
    return merges


def _ref_encode(text, merges, eow="</w>"):
    rank = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    n = 0
    for w in text.split():
        syms = list(w) + [eow]
        while len(syms) > 1:
            cands = [(rank[p], i) for i, p in enumerate(zip(syms, syms[1:]))
                     if p in rank]
            if not cands:
                break
            _, i = min(cands)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        n += len(syms)
    return n


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, ""),
]


def test_learned_merges_match_reference(spark):
    from collections import Counter

    from pgferry_spark.operators.vocab import learn_bpe_merges

    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    got = learn_bpe_merges(df, "text", n_merges=12)

    wf = Counter(w for _, t in CORPUS for w in t.split())
    exp = _ref_bpe(wf, 12)
    assert got == exp
    # the classic first merges on this corpus: 'est' assembles early
    assert ("e", "s") in [(l, r) for l, r, _ in got[:3]]


def test_word_frequency_cap_keeps_most_frequent(spark):
    from pgferry_spark.operators.vocab import word_frequencies

    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    full = word_frequencies(df, "text")
    assert full[0] == ("newest", 6)  # 2 + 4
    capped = word_frequencies(df, "text", max_words=2)
    assert capped == full[:2]


def test_word_frequency_cap_is_required(spark):
    # VERDICT r5 Next #8: the driver-side collect must always be
    # bounded — an uncapped call is an explicit error, not a 100 TB OOM
    import pytest as _pytest

    from pgferry_spark.operators.vocab import word_frequencies

    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    with _pytest.raises(ValueError, match="max_words"):
        word_frequencies(df, "text", max_words=None)
    with _pytest.raises(ValueError, match="max_words"):
        word_frequencies(df, "text", max_words=0)


def test_encode_counts_match_reference(spark):
    from pgferry_spark.operators.vocab import bpe_encode_counts, learn_bpe_merges

    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    merges = learn_bpe_merges(df, "text", n_merges=8)
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_encode_counts(df, "text", "doc_id", merges).collect()}
    for i, t in CORPUS:
        assert got[i] == _ref_encode(t, merges), f"doc {i}"
    assert got[4] == 0  # empty doc


def test_merges_df_shape(spark):
    from pgferry_spark.operators.vocab import bpe_merges_df, learn_bpe_merges

    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    merges = learn_bpe_merges(df, "text", n_merges=5)
    out = bpe_merges_df(spark, merges)
    rows = out.collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    counts = [r["pair_count"] for r in rows]
    assert all(c > 0 for c in counts)


def test_bpe_roundtrip_identity_any_merge_count(spark):
    """decode(encode(w)) == w for every word, whatever segmentation the
    merge list induces — including 0 merges (pure chars) and enough
    merges to fuse whole words. Unicode words included."""
    from pgferry_spark.operators.vocab import (
        bpe_roundtrip_texts,
        learn_bpe_merges,
    )

    rows = [(1, "the thesis then theme the the then"),
            (2, "café déjà café vu"),
            (3, "a"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    for n in (0, 3, 50):
        merges = learn_bpe_merges(df, "text", n_merges=n)
        got = {r["doc_id"]: r["text"]
               for r in bpe_roundtrip_texts(
                   df, "text", "doc_id", merges).collect()}
        assert got == dict(rows), f"n_merges={n}"
