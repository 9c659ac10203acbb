"""Regenerate docs/PLANS.md — executed physical plans for representative
queries, with the plan properties we engineered for called out.

Run: python tools/dump_plans.py [sf_dir]

Plans are captured AFTER an action so AQE has re-planned (isFinalPlan=true):
the doc shows what actually ran, not the static guess.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from pgferry_spark.session import get_spark

# query -> (what to look for, why the plan is shaped that way)
ANNOTATED = {
    "q1_pricing_summary": (
        "single scan, partial+final HashAggregate, no join",
        "The shipdate filter and 9-column projection reach the parquet scan "
        "(PushedFilters/ReadSchema); partial aggregation combines map-side so "
        "the single shuffle carries one row per (returnflag, linestatus) "
        "per task, not 600k rows.",
    ),
    "q3_shipping_priority": (
        "dim broadcast + one fact shuffle + TakeOrderedAndProject",
        "customer (filtered to one segment) broadcasts; lineitem joins orders "
        "on the shuffled order key; the top-10 is TakeOrderedAndProject — "
        "a per-partition heap then a driver merge, never a full sort.",
    ),
    "q5_local_supplier_volume": (
        "all four dims broadcast, single fact pass",
        "region→nation collapses driver-side into one small dim; customer/"
        "supplier/nation broadcast so the only shuffle is lineitem⋈orders; "
        "the same-nation predicate applies as a post-join filter before "
        "aggregation.",
    ),
    "q10_returned_revenue": (
        "fact-side filters precede joins",
        "returnflag and the quarter window shrink both fact inputs before "
        "any join; customer and nation broadcast; top-20 via "
        "TakeOrderedAndProject.",
    ),
    "corpus_filter": (
        "one scoring projection, one shuffle",
        "All text metrics derive from a single tokenization; the dedup "
        "keeper is a window-min over the fingerprint — one hash-partition "
        "shuffle, no self-join, scoring computed exactly once.",
    ),
    "minhash_buckets": (
        "explode→groupBy with map-side MIN combine, xxhash64 leaf hashes",
        "Docs hash-repartition BEFORE the shingle explode, so the shuffle "
        "moves 1× corpus rows, not 50× exploded shingles; the 12 MIN "
        "aggregates combine map-side; two xxhash64 intrinsics per shingle "
        "feed all 12 hash functions (Kirsch–Mitzenmacher double hashing) — "
        "the md5 oracle twin (minhash_buckets_md5) runs the identical plan "
        "with portable leaf hashes.",
    ),
    "ivf_topk": (
        "one filtered map-only scan + TakeOrderedAndProject",
        "Cell membership is a per-row argmax against broadcast centroid "
        "literals (struct array_max), so the probe touches the corpus "
        "exactly once: no ivf_assign stage, no window, no join, zero "
        "Exchanges. At scale the same probe reads one cell of a bucketed "
        "assignment table instead.",
    ),
    "embedding_near_dup": (
        "blocked GEMM via mapInPandas",
        "Vectors group into ~1k-row blocks; each block pair is one Arrow "
        "batch into numpy A@B.T; only above-threshold pairs return. The "
        "O(N²) pair stream never crosses the Python boundary row-wise.",
    ),
    "embedding_near_dup_lsh": (
        "bucket-GEMM: one shuffle, no pair join",
        "Hyperplane signatures come from one vectorized pandas UDF (an "
        "ArrowEvalPython node — computed once however many band structs "
        "reference it); the band explode groups by bucket and a per-bucket "
        "applyInPandas matmul verifies candidates. Pairs never exist as "
        "JVM rows before the threshold filter.",
    ),
    "sessionize": (
        "single shuffle by user, window over ordered events",
        "Gap detection is lag() + running SUM over (user, ts) — one "
        "hash-partition by user_id with in-partition sort, no self-join.",
    ),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    out = [
        "# PLANS — executed physical plans (post-AQE) at sf0.01",
        "",
        "Regenerate with `python tools/dump_plans.py`. Each plan is captured",
        "after execution so AQE's runtime re-planning (broadcast conversion,",
        "partition coalescing) is visible — this is what actually ran.",
        "",
    ]
    for name, (headline, why) in ANNOTATED.items():
        df = qs[name](spark, sf_dir)
        df.count()  # force execution -> final AQE plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = re.sub(r"#\d+L?", "", plan)  # strip expr ids for stable diffs
        lines = plan.splitlines()
        if len(lines) > 40:
            lines = lines[:40] + [f"... ({len(lines) - 40} more lines)"]
        out += [
            f"## {name} — {headline}",
            "",
            why,
            "",
            "```",
            *lines,
            "```",
            "",
        ]
    with open("/root/repo/docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(ANNOTATED)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
