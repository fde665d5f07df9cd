from kaflow_spark.serde.serializers import (
    AvroSerde,
    BytesSerde,
    JsonSerde,
    ProtobufSerde,
    Serde,
    StringSerde,
)

__all__ = [
    "Serde",
    "BytesSerde",
    "StringSerde",
    "JsonSerde",
    "AvroSerde",
    "ProtobufSerde",
]
