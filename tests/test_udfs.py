"""U1 scalar-UDF surface: works, and the expression twin matches."""

import pytest
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.udfs import decade_label, decade_label_expr
from fcs_etl_reactor_spark.io import load
from tests.conftest import SF_SMALL


def test_scalar_udf_matches_expression_twin(spark):
    e = load(spark, SF_SMALL, "events")
    both = e.select(
        decade_label(F.col("value")).alias("via_udf"),
        decade_label_expr("value").alias("via_expr"),
    )
    assert both.filter(F.col("via_udf") != F.col("via_expr")).count() == 0


def test_scalar_udf_registered_for_sql(spark):
    spark.udf.register("decade_label", decade_label)
    load(spark, SF_SMALL, "events").createOrReplaceTempView("udf_events")
    out = spark.sql(
        "SELECT decade_label(value) AS d FROM udf_events WHERE value > 0 LIMIT 5"
    ).collect()
    assert all(r["d"].startswith("1e") for r in out)


class TestMapInArrow:
    def test_l2_normalize_matches_expression_twin(self, spark):
        from pyspark.sql import functions as F

        from fcs_etl_reactor_spark.functions.arrow_ops import l2_normalize_arrow
        from fcs_etl_reactor_spark.io import load
        from tests.conftest import SF_SMALL

        e = load(spark, SF_SMALL, "embeddings").limit(50)
        got = l2_normalize_arrow(e, "embedding")
        # expression twin: aggregate-fold norm, transform-divide
        norm = F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        twin = e.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double") / norm).alias("unit"),
        )
        g = {r["vec_id"]: r["unit"] for r in got.select("vec_id", "unit").collect()}
        t = {r["vec_id"]: r["unit"] for r in twin.collect()}
        assert g.keys() == t.keys()
        for k in g:
            assert g[k] == pytest.approx(t[k], rel=1e-12)
        # unit-length invariant
        for v in g.values():
            assert sum(x * x for x in v) == pytest.approx(1.0, rel=1e-9)


def test_sql_udf_is_inlined_into_codegen(spark):
    # U-family: a SQL UDF must leave NO Python evaluation node — the
    # body inlines at analysis time and runs in whole-stage codegen
    from fcs_etl_reactor_spark.queries import QUERIES
    from tests.conftest import SF_SMALL

    df = QUERIES["q5d_sql_udf"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the body is inlined: the discount arithmetic appears directly in
    # the partial aggregate (AQE hides codegen stars pre-execution)
    assert "partial_sum(FLOOR" in plan, plan


class TestJaroWinkler:
    def test_reference_values(self):
        from fcs_etl_reactor_spark.functions.strsim import jaro_winkler

        assert abs(jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-15
        assert jaro_winkler("same", "same") == 1.0
        assert jaro_winkler("abc", "xyz") == 0.0
        assert jaro_winkler("", "x") == 0.0
        # boost applies only above 0.7 Jaro
        assert jaro_winkler("a", "ab") > 0.7

    def test_matches_duckdb_exactly(self):
        import duckdb

        from fcs_etl_reactor_spark.functions.strsim import jaro_winkler

        con = duckdb.connect()
        pairs = [
            ("dwayne", "duane"),
            ("dixon", "dicksonx"),
            ("goldenrod lace", "goldenrod lavender"),
            ("STANDARD POLISHED TIN", "SMALL PLATED COPPER"),
            ("aaaa", "aaaa aaaa"),
        ]
        for a, b in pairs:
            d = con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert jaro_winkler(a, b) == d, (a, b)

    def test_udf_null_passthrough(self, spark):
        from pyspark.sql import functions as F

        from fcs_etl_reactor_spark.functions.strsim import jaro_winkler_udf

        jw = jaro_winkler_udf()
        df = spark.createDataFrame(
            [("abc", "abd"), (None, "x"), ("y", None)], "a string, b string"
        )
        rows = df.select(jw("a", "b").alias("s")).collect()
        assert rows[0]["s"] is not None
        assert rows[1]["s"] is None and rows[2]["s"] is None
