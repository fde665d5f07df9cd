"""Side-by-side migration guide: the reference's README application
(gabrielmbmb/kaflow README.md:50-90) rewritten on kaflow_spark.

Reference (kaflow):

    from kaflow import FromHeader, FromKey, FromValue, Json, Kaflow, Message
    from pydantic import BaseModel

    class UserClick(BaseModel):
        user_id: int
        url: str
        timestamp: int

    class Key(BaseModel):
        environment: str

    app = Kaflow(name="AwesomeKafkaApp", brokers="localhost:9092")

    @app.consume(topic="user_clicks", sink_topics=["user_clicks_json"])
    async def consume_user_clicks(
        message: FromValue[Json[UserClick]],
        key: FromKey[Json[Key]],
        x_correlation_id: FromHeader[str],
    ) -> Message:
        return Message(value=b"...")

    app.run()

Engine (kaflow_spark) — this file, runnable:
    PYTHONPATH=/root/repo python examples/kaflow_migration.py

Differences a migrating user sees:
- ``Kaflow(...)`` -> ``App(...)``; ``app.run()`` -> ``app.run_stream(
  spark, checkpoint)`` (needs the spark-sql-kafka package) or the
  batch/test path below.
- handlers may be sync or async; same Message/None contract.
- deserialization failures dead-letter instead of raising (the raw
  record is preserved); header decode failures included (the
  reference's _consumer.py:188 bug is fixed here).
- at 100 TB, prefer ``@app.transform`` (pure JVM) or
  ``@app.consume_batches`` (vectorized) over per-record handlers.
"""

from __future__ import annotations

import json

from pydantic import BaseModel

from kaflow_spark import (
    FromKey,
    FromValue,
    Header,
    Json,
    Kaflow,
    Message,
    TestClient,
    get_spark,
)


class UserClick(BaseModel):
    user_id: int
    url: str
    timestamp: int


class Key(BaseModel):
    environment: str


app = Kaflow(name="AwesomeKafkaApp", brokers=None)  # brokers="host:9092" for Kafka


@app.consume(topic="user_clicks", sink_topics=("user_clicks_json",))
async def consume_user_clicks(
    message: FromValue[Json[UserClick]],
    key: FromKey[Json[Key]],
    x_correlation_id: Header(alias="x-correlation-id"),
) -> Message:
    out = {
        "user": message.user_id,
        "url": message.url,
        "env": key.environment,
        "corr": x_correlation_id,
    }
    return Message(value=json.dumps(out).encode())


def main() -> None:
    spark = get_spark("kaflow-migration-demo", master="local[4]")
    client = TestClient(app, spark)  # same role as kaflow's TestClient
    msg = client.publish(
        topic="user_clicks",
        value=json.dumps(
            {"user_id": 7, "url": "https://spark.apache.org", "timestamp": 1}
        ).encode(),
        key=json.dumps({"environment": "prod"}).encode(),
        headers={"x-correlation-id": b"abc-123"},
    )
    print("produced:", msg.value.decode())
    bad = client.publish("user_clicks", value=b"{broken json")
    print("malformed record -> dead letter:", bad is None, client.last_dlq[0]["error"])

    # --- typed security surface (reference constructor kwarg parity):
    # the same flat kwargs, compiled to Kafka Java-client options
    secure = Kaflow(
        name="AwesomeKafkaApp",
        brokers="broker:9093",
        security_protocol="SASL_SSL",
        cafile="/etc/pki/ca.pem",
        sasl_mechanism="SCRAM-SHA-512",
        sasl_plain_username="svc",
        sasl_plain_password="secret",
    )
    opts = secure._client_options()
    print("SASL_SSL options:", {k: opts[k] for k in sorted(opts) if "jaas" not in k})

    # --- AsyncAPI document (the reference's builder is dead code
    # behind NotImplementedError; here it works)
    doc = app.asyncapi()
    print("asyncapi channels:", sorted(doc["channels"]))

    # --- broker-less archive replay off Kafka-style segment files:
    # write an archive with the segment writer, run the FULL pipeline
    # over it as a checkpointed stream (exactly-once per record)
    import tempfile

    from kaflow_spark.sources.segments import write_segment

    workdir = tempfile.mkdtemp(prefix="kseg-")
    write_segment(
        f"{workdir}/user_clicks-0-000.seg",
        "user_clicks",
        0,
        [
            {
                "offset": i,
                "ts_ms": 1_700_000_000_000 + i,
                "key": json.dumps({"environment": "prod"}).encode(),
                "value": json.dumps(
                    {"user_id": i, "url": "https://spark.apache.org", "timestamp": i}
                ).encode(),
                "headers": [("x-correlation-id", f"c{i}".encode())],
            }
            for i in range(3)
        ],
    )
    app.run_replay(
        spark,
        workdir,
        f"{workdir}/replayed",
        f"{workdir}/ckpt",
        fmt="segments",
    )
    replayed = spark.read.parquet(f"{workdir}/replayed/out")
    print("segment replay produced:", replayed.count(), "records")
    spark.stop()


if __name__ == "__main__":
    main()
