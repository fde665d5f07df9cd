from kaflow_spark.sources.files import (
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    stream_files,
    write_partitioned,
)

__all__ = [
    "read_parquet",
    "read_json",
    "read_csv",
    "read_orc",
    "read_text",
    "read_binary_files",
    "stream_files",
    "write_partitioned",
]
