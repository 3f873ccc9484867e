"""Misra–Gries heavy-hitter summaries (the deterministic counter
sketch beside count-min's q8h and HLL's q8l).

Guarantee (k counters): every key with true frequency > N/k is
present in the summary, and estimates only UNDERCOUNT, by at most
N/k. Unlike count-min the summary stores actual keys, so it answers
"which keys are heavy" without a candidate set.

Distributed form (mergeable-summaries, Agarwal et al., PODS 2012):
each partition maintains its own k-counter summary — per Arrow batch
the exact value_counts are merged in, and whenever the summary
exceeds k counters the (k+1)-th largest value is subtracted from all
(the batch generalization of the classic decrement step; an exact
count vector is itself a valid MG summary, and MERGE of two MG
summaries is again one). Per-partition error is ≤ N_p/k; summing the
partition summaries key-wise gives total error ≤ Σ N_p/k = N/k, so
the global guarantee survives WITHOUT re-truncation — the merged
relation has at most #partitions·k rows, KB-scale at any corpus
size, and the merge is a plain groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def mg_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: (key, cnt) with at most
    k rows per input partition; estimates never overcount."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                # subtract the (k+1)-th largest from everyone; drop <= 0
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - cut for key, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "cnt": list(counters.values())}
        )

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} string, cnt long"
    )


def mg_merged(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Key-wise sum of the per-partition summaries — the global MG
    estimate table (≤ #partitions·k rows; error ≤ N/k)."""
    from pyspark.sql import functions as F

    return (
        mg_summaries(df, key_col, k)
        .groupBy(key_col)
        .agg(F.sum("cnt").alias("mg_est"))
    )
