"""Bucketed-table co-located join: both sides bucketed by the join key
=> the join runs with NO shuffle Exchange — the storage-layout lever
for repeated large-scale joins (SURVEY §4.2 / sources.write_bucketed_table).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from kaflow_spark.plans.explain import count_exchanges
from kaflow_spark.sources.files import write_bucketed_table


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    fact_t, dim_t = f"fact_{suffix}", f"dim_{suffix}"

    fact = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    )
    dim = spark.range(0, 1_000).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    write_bucketed_table(fact, fact_t, ["k"], 8, sort_by=["k"])
    write_bucketed_table(dim, dim_t, ["k"], 8, sort_by=["k"])
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(fact_t).join(spark.table(dim_t), "k")
        assert count_exchanges(joined) == 0  # co-located: no Exchange
        assert joined.count() == 1_000

        # control: the same join over non-bucketed frames DOES shuffle
        plain = fact.join(dim, "k")
        assert count_exchanges(plain) > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql(f"DROP TABLE IF EXISTS {fact_t}")
        spark.sql(f"DROP TABLE IF EXISTS {dim_t}")
