"""Distributed heavy hitters: Misra-Gries summaries + exact recount.

The φ-frequent-items question ("which tokens exceed 0.5% of the corpus?")
at 100 TB has a shuffle problem, not a compute problem: the naive
``groupBy(item).count()`` map-side-combines within a partition but still
shuffles ONE ROW PER DISTINCT ITEM PER PARTITION — for long-tailed
vocabularies (tokens, URLs, user-ids) that is nearly the input size.
The classic fix (Misra–Gries '82; mergeability per Agarwal, Cormode,
Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS '12) bounds the
shuffle at k rows per partition, k = ⌈1/φ⌉:

1. each partition folds its rows through a k-counter Misra-Gries summary
   (``mapInPandas`` — Arrow-batched; per batch the vectorized
   ``value_counts`` merges into the running dict, then one
   subtract-the-(k+1)-th-largest compaction restores ``|state| <= k``);
2. the per-partition candidate sets union into one tiny relation
   (<= k x n_partitions rows) — any item with global count > n/k MUST
   appear in at least one partition's summary (if it were dropped
   everywhere, its total count would be <= Σ n_p/k = n/k);
3. the EXACT recount re-scans the fact once, counting ONLY candidate
   items (broadcast hash-set membership, map-side combined to
   <= candidates rows of shuffle), and the integer threshold
   ``cnt * phi_den > n * phi_num`` keeps exactly the true φ-heavy items.

The output is therefore EXACT and deterministic — independent of
partitioning, row order, and batch boundaries, all of which change the
intermediate candidate set but never the final filter — which is what
makes the operator oracle-checkable (queries/llm.q_freq_tokens) despite
the approximate middle stage.

No analogue in the reference (main.py is single-collection ETL); this is
the scale path for frequency-threshold curation rules (stopword mining,
boilerplate detection, hot-key discovery for skew handling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(batches: Iterator[pd.DataFrame], k: int) -> Iterator[pd.DataFrame]:
    state: dict = {}
    for pdf in batches:
        for item, c in pdf.iloc[:, 0].value_counts().items():
            state[item] = state.get(item, 0) + int(c)
        if len(state) > k:
            # subtract the (k+1)-th largest count from everything and drop
            # the non-positive — one compaction per Arrow batch, the
            # batch-level form of MG's decrement step (Mergeable
            # Summaries, thm 1: error adds, stays <= n_p/k).
            cut = sorted(state.values(), reverse=True)[k]
            state = {i: c - cut for i, c in state.items() if c > cut}
    yield pd.DataFrame({"item": list(state.keys()), "lb": list(state.values())})


def frequent_items(
    df: DataFrame,
    col: str,
    phi_num: int = 1,
    phi_den: int = 100,
) -> DataFrame:
    """Items of ``df[col]`` with count > n·phi_num/phi_den, exactly.

    Returns ``(item, cnt, n)`` — the exact global count and total row
    count attached, so callers can derive shares without a second scan.
    The threshold compare is INTEGER (cnt·phi_den > n·phi_num): no float
    share is ever computed, so the boundary cannot drift between engines.
    """
    k = -(-phi_den // phi_num)  # ceil(1/phi) counters
    src = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    cand = (
        src.mapInPandas(lambda it: _mg_fold(it, k), "item string, lb long")
        .select("item")
        .distinct()
    )
    n_df = src.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    counted = (
        src.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(n_df))
        .filter(F.col("cnt") * phi_den > F.col("n") * phi_num)
        .select("item", "cnt", "n")
    )
