"""Vocabulary learning over a distributed corpus: BPE merge learning and
the matching encode pass.

The industry-standard shape (SentencePiece / HF tokenizers learn exactly
this way): the CORPUS-sized work — word counting and, later, encoding — is
distributed; the merge loop itself runs driver-side over the word-frequency
table, which is vocabulary-bounded (≈ millions of rows at 100 TB, and
cappable to the top-V words, which is what production tokenizer trainers do
anyway). Learning never iterates over the corpus: one aggregation shuffle
in, ``n_merges`` pure-Python iterations over the compact vocab, done.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..utils import fan_out


def word_frequencies(
    df: DataFrame, text_col: str, max_words: int = 100_000
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, collected driver-side.

    One tokenize+explode scan and one aggregation shuffle with map-side
    combine; the result is vocab-sized, not corpus-sized. ``max_words``
    caps the table to the most frequent words (ties -> lexicographic) —
    at 100 TB you always cap: rare-word tails add nothing to merge
    statistics but dominate the vocab row count.  The cap is REQUIRED
    (``None`` raises): an uncapped collect over an open-vocabulary
    corpus is a driver OOM at scale, so the bound must be explicit."""
    if max_words is None or max_words <= 0:
        raise ValueError(
            "word_frequencies requires a positive max_words cap: the "
            "frequency table is collected driver-side, and an uncapped "
            "collect over an open vocabulary is a driver OOM at scale"
        )
    wf = (
        fan_out(df, text_col)
        .select(F.explode_outer(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = (
        wf.orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return sorted(((r["w"], r["cnt"]) for r in rows), key=lambda t: (-t[1], t[0]))


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    max_words: int = 10_000,
    end_of_word: str = "</w>",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus (Sennrich et al. 2016).

    Words split into characters + an end-of-word marker; each round merges
    the most frequent adjacent symbol pair (ties -> lexicographically
    smallest pair, so learning is deterministic and engine-independent).
    Returns ``[(left, right, pair_count), ...]`` in merge order.

    The corpus contributes exactly ONE distributed job (the word count);
    the merge loop is O(n_merges × vocab) driver-side python over the
    bounded frequency table — the same division of labor as every
    production tokenizer trainer."""
    vocab = {
        tuple(w) + (end_of_word,): c
        for w, c in word_frequencies(df, text_col, max_words)
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((left, right, cnt))
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right, pair_count)
    — the audit/export artifact."""
    rows = [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count long"
    )


def bpe_encode_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str, int]],
    end_of_word: str = "</w>",
) -> DataFrame:
    """Distributed encode pass with a learned merge list: (id, n_tokens)
    per document under the trained BPE vocabulary.

    Arrow-batched ``pandas_udf`` — the merge list broadcasts with the
    closure (n_merges ranks, driver-bounded) and each batch applies the
    ranked merges greedily per word with a per-batch word cache (corpora
    repeat words heavily, so the cache collapses most of the work). This
    is the corpus-sized half of tokenizer training: one scan, no shuffle.
    """
    from pyspark.sql.types import LongType

    rank_of = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    # no inline type hints: this module uses `from __future__ import
    # annotations`, which stringifies them and breaks pandas_udf's
    # signature inference — the explicit returnType carries the contract
    @F.pandas_udf(LongType())
    def _count(texts):
        cache: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w) + [end_of_word]
            while len(syms) > 1:
                ranked = [
                    (rank_of[p], i)
                    for i, p in enumerate(zip(syms, syms[1:]))
                    if p in rank_of
                ]
                if not ranked:
                    break
                rk, i = min(ranked)
                syms[i : i + 2] = [syms[i] + syms[i + 1]]
            cache[w] = len(syms)
            return len(syms)

        def doc_tokens(t) -> int:
            if t is None:
                return 0
            return sum(word_tokens(w) for w in t.split())

        return texts.map(doc_tokens)

    return df.select(F.col(id_col), _count(F.col(text_col)).alias("n_tokens"))


def bpe_roundtrip_texts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str, int]],
    end_of_word: str = "</w>",
) -> DataFrame:
    """Losslessness proof for the encode pass: encode every word to its
    BPE symbol sequence, then DECODE (concatenate symbols, strip the
    end-of-word marker, rejoin on single spaces) — the result must be
    the original text, whatever segmentation the merges chose.  This is
    the property a tokenizer regression breaks first (a slice bug in
    the merge-apply loop corrupts symbols silently while token COUNTS
    still look plausible).

    Boundary: whitespace-normalized round-trip — words rejoin on single
    spaces, so byte identity holds on single-spaced text (the synthetic
    corpus; a production pipeline normalizes whitespace upstream in
    html_extract anyway).  Same Arrow-batched one-scan shape as
    :func:`bpe_encode_counts`; returns ``(id, text)``."""
    from pyspark.sql.types import StringType

    rank_of = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    @F.pandas_udf(StringType())
    def _roundtrip(texts):
        cache: dict[str, str] = {}

        def word_roundtrip(w: str) -> str:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w) + [end_of_word]
            while len(syms) > 1:
                ranked = [
                    (rank_of[p], i)
                    for i, p in enumerate(zip(syms, syms[1:]))
                    if p in rank_of
                ]
                if not ranked:
                    break
                rk, i = min(ranked)
                syms[i : i + 2] = [syms[i] + syms[i + 1]]
            dec = "".join(syms)
            if dec.endswith(end_of_word):
                dec = dec[: -len(end_of_word)]
            cache[w] = dec
            return dec

        def doc_roundtrip(t):
            if t is None:
                return None
            return " ".join(word_roundtrip(w) for w in t.split())

        return texts.map(doc_roundtrip)

    return df.select(
        F.col(id_col), _roundtrip(F.col(text_col)).alias("text")
    )
