"""Pandas-UDF surface — the sanctioned Python escape hatch.

The engine's rule is built-in expressions first (everything in
functions/transforms.py is JVM-side); when Python is genuinely needed
(bespoke libraries, codecs), it enters ONLY as an Arrow-batched pandas UDF —
never a row-at-a-time Python UDF (10-100x slower: per-row pickling vs
columnar Arrow transfer). These are reference implementations of the
pattern; multimodal/ops.py applies the same idea with mapInPandas.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType


@pandas_udf(StringType())
def normalize_unicode(s: pd.Series) -> pd.Series:
    """NFKC-normalize and strip combining marks (accent folding) — a
    transform with no built-in Spark equivalent, vectorized per Arrow batch."""
    def fold(v):
        if v is None:
            return None
        decomposed = unicodedata.normalize("NFKD", v)
        stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
        return unicodedata.normalize("NFKC", stripped)

    return s.map(fold)


@pandas_udf(DoubleType())
def shannon_entropy(s: pd.Series) -> pd.Series:
    """Character-level Shannon entropy per value (a common quality signal
    for detecting binary junk / repeated-character spam in text corpora)."""
    import math

    def entropy(v):
        if v is None or len(v) == 0:
            return 0.0
        counts: dict[str, int] = {}
        for ch in v:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(v)
        return -sum((c / n) * math.log2(c / n) for c in counts.values())

    return s.map(entropy)
