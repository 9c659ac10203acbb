"""Small shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, key_col: str, force: bool = False) -> DataFrame:
    """Hash-repartition on ``key_col`` ahead of a row-exploding or
    per-row-expensive stage.

    Two reasons to do this *before* the expensive stage:

    * an explode→groupBy(key) pipeline shuffles post-explode rows (often
      100× the corpus) unless the input is already hash-partitioned on the
      group key — repartitioning first moves the shuffle to the 1× corpus
      rows and the groupBy reuses the partitioning (``force=True`` path:
      strictly fewer bytes shuffled at any scale);
    * a single parquet file arrives as one partition, serializing the stage
      onto one core.

    Without ``force``, only repartitions when the scan has fewer input
    files than the default parallelism (cheap metadata check; avoids a
    gratuitous shuffle for already-wide inputs feeding shuffle-free stages).
    """
    default = df.sparkSession.sparkContext.defaultParallelism
    if force:
        return df.repartition(default, key_col)
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        return df
    if 0 < nfiles < default:
        return df.repartition(default, key_col)
    return df
