"""Throughput probe for the kaflow-parity app surface.

The reference processes one record fully (including an acked produce)
before consuming the next — O(10^2-10^3) rec/s per instance (SURVEY
§6). This probe pushes N synthetic envelope records through the
engine's three handler shapes and reports rec/s. Appends results to
SCALING.md.

    python tools/throughput_probe.py [n_records]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pydantic import BaseModel

from pyspark.sql import functions as F

from kaflow_spark import App, FromValue, Json, Message, get_spark
from kaflow_spark.message import ENVELOPE_DDL


class Click(BaseModel):
    user_id: int
    url: str
    n: int


def build_envelope(spark, n: int):
    payload = F.to_json(
        F.struct(
            F.col("id").alias("user_id"),
            F.concat(F.lit("https://x/"), F.col("id")).alias("url"),
            (F.col("id") % 97).alias("n"),
        )
    ).cast("binary")
    return (
        spark.range(n)
        .select(
            F.lit("clicks").alias("topic"),
            F.lit(0).alias("partition"),
            F.col("id").alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(0).alias("timestamp_type"),
            F.lit(None).cast("binary").alias("key"),
            payload.alias("value"),
            F.lit(None).cast("array<struct<key: string, value: binary>>").alias(
                "headers"
            ),
        )
        .repartition(32)
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("throughput-probe")
    spark.sparkContext.setLogLevel("ERROR")
    env = build_envelope(spark, n).persist()
    env.count()  # materialize input so probes measure processing only

    results: dict[str, float] = {}

    def run(name: str, app: App) -> None:
        out, dlq = app.process_batch(env)
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[name] = n / dt
        print(f"{name}: {n / dt:,.0f} rec/s ({dt:.1f}s)", flush=True)

    # 1) per-record python handler (the reference's model, batched)
    app1 = App()

    @app1.consume(topic="clicks", sink_topics=("out",))
    def handler(click: FromValue[Json[Click]]) -> Message:
        return Message(value=json.dumps({"u": click.user_id, "n2": click.n * 2}).encode())

    run("record_handler (mapInPandas, pydantic-validated)", app1)

    # 2) vectorized batch handler
    app2 = App()

    @app2.consume_batches(topic="clicks", sink_topics=("out",), value=Json)
    def vhandler(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["value"].map(lambda v: {"u": v["user_id"], "n2": v["n"] * 2})
        return pd.DataFrame({"value": vals})

    run("batch_handler (consume_batches)", app2)

    # 3) declarative JVM transform (the 100 TB-preferred surface)
    app3 = App()

    @app3.transform(topic="clicks", sink_topics=("out",), value=Json[Click])
    def t(df):
        return df.select(
            F.struct(
                F.col("value.user_id").alias("u"), (F.col("value.n") * 2).alias("n2")
            ).alias("value")
        )

    run("jvm_transform (from_json/to_json, zero python)", app3)

    with open("SCALING.md", "a") as f:
        f.write(
            "\n## App-surface throughput (single node, local[32], "
            f"{n:,} records)\n\n"
            "Reference architectural ceiling: one record fully processed "
            "(incl. acked produce) before the next — O(10^2-10^3) rec/s "
            "(SURVEY §6).\n\n| handler shape | rec/s |\n|---|---|\n"
        )
        for k, v in results.items():
            f.write(f"| {k} | {v:,.0f} |\n")
    print("appended to SCALING.md")
    spark.stop()


if __name__ == "__main__":
    main()
