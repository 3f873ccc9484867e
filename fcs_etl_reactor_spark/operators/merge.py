"""Upsert/merge maintenance operator (the MERGE INTO shape, table-
format-agnostic): apply a batch of keyed updates to a base relation.

Scale: the only shuffle is the anti-join on the merge key; when the
update batch is bounded (the normal CDC case) Spark broadcasts it and
the base table never shuffles at all. With a lakehouse table format
you'd push this to the format's MERGE; this operator is the engine-
level semantics those formats implement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(base: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows of `updates` win on key collision; unmatched base rows pass
    through; new keys in `updates` append. Column sets must match."""
    assert set(base.columns) == set(updates.columns), "schema mismatch"
    survivors = base.join(updates.select(*key_cols), key_cols, "left_anti")
    return updates.unionByName(survivors)
