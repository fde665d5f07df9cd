"""File sources and sinks.

The reference's only I/O is Kafka (kaflow/applications.py:278-343);
an analytics engine needs the batch/file surface too. Everything here
is a thin declarative layer over Spark's native readers/writers, with
the scale-relevant options surfaced:

- partitioned writes: partition pruning on read (`WHERE part = x`
  skips files entirely) — the single biggest lever at 100 TB
- bucketed writes: co-located joins without a shuffle (both sides
  bucketed by the join key, Exchange elided)
- binaryFile source: the multimodal ingest path (payload bytes +
  path/length metadata, combine with operators.multimodal)
- file streams: the same reader as a streaming source (used by the
  tests; in production Kafka or cloud-storage notifications)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Parquet scan; ``columns``/``predicate`` are conveniences — the
    same pruning happens when callers select/filter declaratively."""
    df = spark.read.parquet(path)
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def read_json(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON lines; an explicit schema skips the inference scan (at
    100 TB, schema inference is a full extra pass — always pass one)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower()).option(
        "delimiter", delimiter
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """ORC scan (built-in, no extra jars): same pushdown/pruning story
    as parquet — filters and projections reach the stripe reader."""
    df = spark.read.orc(path)
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def read_text(
    spark: SparkSession, path: str, whole_text: bool = False
) -> DataFrame:
    """Raw-text corpus ingest: one row per LINE (``value: string``),
    or one row per FILE with ``whole_text=True`` — the entry point for
    unstructured corpora before the text operators. Pair with
    ``input_file_name()`` for provenance."""
    # NB: must be the .text() kwarg — the python reader passes its own
    # wholetext default, which overrides a .option() of the same name
    return spark.read.text(path, wholetext=whole_text)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Multimodal ingest: one row per file with (path, modificationTime,
    length, content binary). Pair with operators.multimodal decode."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def stream_files(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned write: output laid out as part=value directories so
    downstream reads prune partitions. ``max_records_per_file`` guards
    against giant files from skewed partitions."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on the bucket key
    skip the shuffle entirely when both sides share the bucketing."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
