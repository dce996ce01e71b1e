"""Distance function goldens from the reference test corpus (FIXTURES F1/F6).

Reference facts:
* ``array_distance`` is TRUE L2: array_distance([1,0,0],[0.5,0.5,0]) =
  0.70710677 (test/sql/diskann_optimizer.test:26-34)
* index/_distance L2 is SQUARED: orthogonal unit vectors -> 2.0
  (test/sql/diskann_basic.test:28-32)
* IP is negated internally (rust_lib/src/distance.rs:20-24)
"""

import math

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.functions.distance import (
    array_cosine_similarity,
    array_distance,
    array_inner_product,
    metric_distance,
    vector_lit,
)
from duckdb_annsearch_spark.operators.distances import vector_distances
from tests.conftest import make_vectors_df


def _scalar(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_array_distance_true_l2(spark):
    v = _scalar(spark, array_distance(vector_lit([1, 0, 0]), vector_lit([0.5, 0.5, 0])))
    assert v == pytest.approx(0.70710677, abs=1e-7)


def test_metric_distance_l2_is_squared(spark):
    v = _scalar(spark, metric_distance(vector_lit([1, 0, 0]), vector_lit([0, 1, 0]), "l2"))
    assert v == 2.0


def test_inner_product_raw_and_negated(spark):
    raw = _scalar(spark, array_inner_product(vector_lit([1, 2, 3]), vector_lit([4, 5, 6])))
    assert raw == 32.0
    neg = _scalar(spark, metric_distance(vector_lit([1, 2, 3]), vector_lit([4, 5, 6]), "ip"))
    assert neg == -32.0


def test_cosine_similarity(spark):
    v = _scalar(spark, array_cosine_similarity(vector_lit([1, 0]), vector_lit([1, 1])))
    assert v == pytest.approx(1 / math.sqrt(2), abs=1e-6)
    d = _scalar(spark, metric_distance(vector_lit([1, 0]), vector_lit([1, 1]), "cosine"))
    assert d == pytest.approx(1 - 1 / math.sqrt(2), abs=1e-6)


def test_vector_distances_l2_and_ip(spark):
    df = make_vectors_df(
        spark, [(1, [1, 0, 0]), (2, [0, 1, 0]), (3, [0, 0, 1]), (4, [0.5, 0.5, 0])]
    )
    got = {
        r["id"]: r["_distance"]
        for r in vector_distances(df, [1.0, 0.0, 0.0]).collect()
    }
    assert got[1] == 0.0
    assert got[2] == 2.0
    assert got[4] == pytest.approx(0.5, abs=1e-7)

    got_ip = {
        r["id"]: r["_distance"]
        for r in vector_distances(df, [1.0, 0.0, 0.0], metric="ip").collect()
    }
    assert got_ip[1] == -1.0
    assert got_ip[2] == -0.0


def test_vector_distances_null_and_wrong_dim_are_zero_vector(spark):
    df = make_vectors_df(spark, [(1, [1, 0, 0]), (2, None), (3, [1.0, 0.0])])
    got = {r["id"]: r["_distance"] for r in vector_distances(df, [1.0, 0.0, 0.0]).collect()}
    # reference leaves the gather buffer zeroed -> distance == ||q||^2
    assert got[2] == 1.0
    assert got[3] == 1.0


def test_vector_distances_autodetect_requires_numeric_array(spark):
    df = spark.createDataFrame([(1, "x")], "id int, data string")
    with pytest.raises(ValueError, match="numeric LIST or ARRAY"):
        vector_distances(df, [1.0])
