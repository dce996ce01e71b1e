"""SQL-registered distance functions match the Column API and the
reference goldens (diskann_optimizer.test:26-34, diskann_basic.test:28-32)."""

import pytest

from duckdb_annsearch_spark.functions.sql import register_sql_functions


@pytest.fixture(scope="module")
def sqlfns(spark):
    return register_sql_functions(spark)


def test_registers_all_six(sqlfns):
    assert sorted(sqlfns) == sorted(
        ["array_distance", "list_distance", "array_inner_product",
         "list_inner_product", "array_cosine_similarity", "list_cosine_similarity"]
    )


def test_array_distance_golden(spark, sqlfns):
    # true L2: array_distance([1,0,0],[0.5,0.5,0]) = 0.70710677
    got = spark.sql(
        "SELECT array_distance(CAST(array(1.0,0.0,0.0) AS ARRAY<FLOAT>), "
        "CAST(array(0.5,0.5,0.0) AS ARRAY<FLOAT>)) AS d"
    ).first()["d"]
    assert abs(got - 0.70710677) < 1e-6


def test_sql_matches_column_api(spark, sqlfns):
    from duckdb_annsearch_spark.functions import distance as D
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
    )
    df.createOrReplaceTempView("v")
    via_sql = spark.sql(
        "SELECT array_distance(a,b) d, array_inner_product(a,b) ip, "
        "array_cosine_similarity(a,b) cs, list_distance(a,b) ld FROM v"
    ).first()
    via_col = df.select(
        D.array_distance("a", "b").alias("d"),
        D.array_inner_product("a", "b").alias("ip"),
        D.array_cosine_similarity("a", "b").alias("cs"),
    ).first()
    assert via_sql["d"] == via_col["d"] == via_sql["ld"]
    assert via_sql["ip"] == via_col["ip"]
    assert via_sql["cs"] == via_col["cs"]


def test_sql_topk_shape(spark, sqlfns):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)], "id long, v array<float>"
    )
    df.createOrReplaceTempView("pts")
    # SQL UDFs cannot sit directly in ORDER BY (UNSUPPORTED_SQL_UDF_USAGE);
    # project the distance first — same shape the reference optimizer sees
    got = spark.sql(
        "SELECT id FROM (SELECT id, array_distance(v, "
        "CAST(array(7.2, 0.0) AS ARRAY<FLOAT>)) AS d FROM pts) "
        "ORDER BY d LIMIT 3"
    ).collect()
    assert [r["id"] for r in got] == [7, 8, 6]
