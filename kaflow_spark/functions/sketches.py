"""Probabilistic sketches for approximate analytics at scale.

All engine-native (Apache DataSketches / Spark stat functions) — the
mergeable-sketch property is what matters at 100 TB: partial sketches
combine associatively across partitions and across time (e.g. daily
HLLs union into monthly distincts without rescanning).

- HLL (hll_sketch_agg / hll_union_agg): mergeable distinct counts
- approx_count_distinct: HyperLogLog++ scalar form
- approx_percentile: quantile sketch
- Count-Min (df.stat.countMinSketch): heavy-hitter frequency estimates
- Bloom filter (df.stat.bloomFilter): membership pre-filtering (e.g.
  broadcast a bloom of the dim keys to pre-prune a huge fact scan)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch(col: Column | str, lg_k: int = 12) -> Column:
    """Mergeable HLL sketch aggregate (binary); estimate with
    ``hll_estimate``, union across groups with ``hll_union``."""
    return F.hll_sketch_agg(col, lgConfigK=lg_k)


def hll_union(col: Column | str) -> Column:
    return F.hll_union_agg(col)


def hll_estimate(col: Column | str) -> Column:
    return F.hll_sketch_estimate(col)


def distinct_approx(col: Column | str, rsd: float = 0.05) -> Column:
    return F.approx_count_distinct(col, rsd=rsd)


def percentile_approx(
    col: Column | str, q: float | list[float], accuracy: int = 10_000
) -> Column:
    return F.percentile_approx(col, q, accuracy)


class CountMinSketch:
    """Thin adapter over the JVM CountMinSketch (built distributed,
    merged on the driver). PySpark 4 removed the python wrapper; the
    JVM stat function is still public API."""

    def __init__(self, jsketch) -> None:
        self._j = jsketch

    def estimateCount(self, item) -> int:
        return int(self._j.estimateCount(item))

    @property
    def total_count(self) -> int:
        return int(self._j.totalCount())


class BloomFilter:
    def __init__(self, jbloom) -> None:
        self._j = jbloom

    def mightContain(self, item) -> bool:
        return bool(self._j.mightContain(item))


def count_min(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99
) -> CountMinSketch:
    """Count-Min sketch over a column: heavy-hitter frequency
    estimates with one-sided error (never undercounts)."""
    return CountMinSketch(
        df._jdf.stat().countMinSketch(col, float(eps), float(confidence), 42)
    )


def bloom_filter(
    df: DataFrame, col: str, expected: int, fpp: float = 0.01
) -> BloomFilter:
    """Bloom filter of a column — broadcast it to pre-filter a bigger
    scan (no false negatives)."""
    return BloomFilter(df._jdf.stat().bloomFilter(col, int(expected), float(fpp)))
