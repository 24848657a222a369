"""Shared operator utilities."""

from __future__ import annotations


def small_sort(df, *cols):
    """Deterministic order for small result sets WITHOUT a range sort.

    ``orderBy`` range-partitions: the partitioner SAMPLES the input,
    re-running the (often expensive) parent stage a second time. For
    operator outputs that are small by construction (near-dup pairs,
    top-k lists, per-group aggregates), shuffling to one partition and
    sorting within it is one pass and exact.
    """
    return df.repartition(1).sortWithinPartitions(*cols)
