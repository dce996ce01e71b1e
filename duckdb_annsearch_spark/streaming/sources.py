"""Message-stream adapters for continuous ANN search.

A production query feed arrives as opaque message bytes — kafka's schema is
``(key BINARY, value BINARY, topic, partition, offset, timestamp, ...)`` —
while :func:`duckdb_annsearch_spark.streaming.ann_search_stream` wants
``(id_col, query_col ARRAY<FLOAT>)``.  This module is the bridge: pure
Catalyst expressions (``from_json`` + casts), so it attaches to ANY source
that delivers a binary/string value column — kafka
(``spark.readStream.format("kafka")...``), files, sockets, rate+transform.
The kafka connector jar isn't bundled in this environment, so tests drive
it with a file stream carrying the same payload shape; the parsing plan is
identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_vector_messages(
    stream: DataFrame,
    dim: int,
    value_col: str = "value",
    id_field: str = "qid",
    vec_field: str = "qvec",
    drop_malformed: bool = True,
) -> DataFrame:
    """JSON query messages -> ``(qid LONG, qvec ARRAY<FLOAT>)``.

    Expected payload: ``{"qid": <int>, "qvec": [<float>, ...]}`` in
    ``value_col`` (BINARY or STRING).  Malformed JSON, missing fields, and
    wrong-dimension vectors are dropped when ``drop_malformed`` (the
    downstream probe would emit no hits for them anyway —
    ``test/sql/edge_cases.test`` semantics); pass ``False`` to keep them
    (``qvec`` NULL) for dead-letter routing.
    """
    schema = T.StructType(
        [
            T.StructField(id_field, T.LongType()),
            T.StructField(vec_field, T.ArrayType(T.DoubleType())),
        ]
    )
    parsed = stream.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("__m")
    ).select(
        F.col(f"__m.{id_field}").alias(id_field),
        F.col(f"__m.{vec_field}").cast("array<float>").alias(vec_field),
    )
    if drop_malformed:
        # Element-level nulls (e.g. {"qvec": [1.0, null, ...]}) survive the
        # size check but become NaN in the Arrow->pandas probe and would emit
        # k arbitrary rows with NaN distances — drop them too.
        parsed = parsed.where(
            F.col(id_field).isNotNull()
            & F.col(vec_field).isNotNull()
            & (F.size(vec_field) == int(dim))
            & ~F.exists(F.col(vec_field), lambda x: x.isNull())
        )
    return parsed
