"""Source/sink integration: partitioned shard layout pruning."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shuffle_shards_partitioned_write_prunes(spark, tmp_path):
    """The 100 TB continuation of shuffle_shards: write.partitionBy
    ("shard") lays out one directory per shard and a single-shard read
    plans a partition-pruned scan (PartitionFilters, no full-table
    read) — the data-loader reads exactly its shard's files."""
    from kaflow_spark.operators.curation import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id bigint")
    out = str(tmp_path / "shards")
    shuffle_shards(df, "doc_id", n_shards=4).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(out)

    back = spark.read.parquet(out)
    one = back.filter(F.col("shard") == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or "PartitionFilters: [(shard" in plan
    # shard 2's rows only, positions still contiguous
    rows = one.collect()
    assert rows and sorted(r["pos"] for r in rows) == list(
        range(1, len(rows) + 1)
    )
    # full corpus round-trips exactly
    assert back.count() == 400 and back.select("doc_id").distinct().count() == 400
