"""kaflow_spark — a PySpark-native analytics & stream-processing engine.

A ground-up re-expression of the capabilities of the reference framework
(gabrielmbmb/kaflow — a Kafka topic-processing library; see SURVEY.md) on
top of Apache Spark:

- batch relational core: DataFrame/SQL with Catalyst doing pushdown,
  pruning, join selection, AQE (SURVEY §2B, queries Q1-Q33)
- kaflow-parity app surface: ``App`` with ``@app.consume`` /
  ``@app.produce`` decorators, typed value/key/header deserialization,
  dead-letter channel, in-process ``TestClient``  (SURVEY §2A)
- streaming: Structured Streaming + Kafka source/sink, watermarks,
  windows, stateful dedup (SURVEY §2B streaming surface)
- LLM-data-pipeline operators: dedup (exact/MinHash/SimHash/ngram),
  similarity search, text analysis, multimodal binary columns

Everything is designed for multi-executor scale: built-in JVM-side
expressions first, Arrow-vectorized pandas UDFs only where semantics
require, broadcast hints for dimension joins, AQE for skew.
"""

from kaflow_spark.app import App
from kaflow_spark.exceptions import DeserializationError, KaflowSparkException
from kaflow_spark.message import Message, ReadMessage
from kaflow_spark.params import (
    Avro,
    Depends,
    FromHeader,
    FromKey,
    FromValue,
    Header,
    Json,
    MessageOffset,
    MessagePartition,
    MessageTimestamp,
    Protobuf,
    Str,
)
from kaflow_spark.session import get_spark, stop_spark
from kaflow_spark.testclient import TestClient

#: drop-in import parity with the reference: ``from kaflow import Kaflow``
#: becomes ``from kaflow_spark import Kaflow``
Kaflow = App

__version__ = "0.1.0"

__all__ = [
    "App",
    "Kaflow",
    "Message",
    "ReadMessage",
    "TestClient",
    "FromValue",
    "FromKey",
    "FromHeader",
    "Header",
    "Json",
    "Str",
    "Avro",
    "Protobuf",
    "Depends",
    "MessageOffset",
    "MessagePartition",
    "MessageTimestamp",
    "DeserializationError",
    "KaflowSparkException",
    "get_spark",
    "stop_spark",
    "__version__",
]
