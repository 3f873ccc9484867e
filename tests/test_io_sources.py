"""IO surface tests: CSV/JSON sources (S2/S3), bucketed co-located
joins (SURVEY.md §4 partitioning strategy), Python UDTFs (U5)."""

from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.udtfs import NGramExpander, TextSegmentParser
from fcs_etl_reactor_spark.io import (
    load,
    read_csv,
    read_json,
    read_orc,
    read_text,
    write_bucketed,
    write_csv,
    write_orc,
)
from tests.conftest import SF_SMALL


class TestCsvJson:
    def test_csv_roundtrip(self, spark, tmp_path):
        orig = load(spark, SF_SMALL, "nation")
        write_csv(orig, str(tmp_path / "nation_csv"))
        back = read_csv(
            spark, str(tmp_path / "nation_csv"),
            schema="n_nationkey INT, n_name STRING, n_regionkey INT",
        )
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))

    def test_json_manifest(self, spark, tmp_path):
        manifest = tmp_path / "manifest.json"
        manifest.write_text(
            '{"sample": "a.fcs", "role": "bead", "channels": ["FSC", "FL1"]}\n'
            '{"sample": "b.fcs", "role": "experiment", "channels": ["FSC"]}\n'
        )
        df = read_json(spark, str(manifest))
        rows = {r["sample"]: r for r in df.collect()}
        assert rows["a.fcs"]["role"] == "bead"
        assert list(rows["a.fcs"]["channels"]) == ["FSC", "FL1"]


class TestOrcText:
    def test_orc_roundtrip_with_pruning(self, spark, tmp_path):
        orig = load(spark, SF_SMALL, "orders")
        write_orc(orig, str(tmp_path / "orders_orc"), partition_by=["o_orderpriority"])
        back = read_orc(spark, str(tmp_path / "orders_orc"))
        assert back.count() == orig.count()
        # partition pruning: a filter on the partition column must cut
        # the scanned files to that partition's directory only
        one = back.filter(F.col("o_orderpriority") == "1-URGENT")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert one.count() == orig.filter(F.col("o_orderpriority") == "1-URGENT").count()
        assert "PartitionFilters" in plan or "1-URGENT" in plan
        # value-level parity on a stable projection
        a = sorted(r["o_orderkey"] for r in one.collect())
        b = sorted(
            r["o_orderkey"]
            for r in orig.filter(F.col("o_orderpriority") == "1-URGENT").collect()
        )
        assert a == b

    def test_text_lines_and_wholefile(self, spark, tmp_path):
        doc = tmp_path / "doc.txt"
        doc.write_text("alpha\nbeta\ngamma\n")
        lines = read_text(spark, str(doc))
        assert sorted(r["value"] for r in lines.collect()) == ["alpha", "beta", "gamma"]
        whole = read_text(spark, str(doc), whole=True)
        assert whole.count() == 1
        assert whole.collect()[0]["value"].startswith("alpha\n")


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            orders = load(spark, SF_SMALL, "orders")
            lineitem = load(spark, SF_SMALL, "lineitem")
            write_bucketed(orders, "b_orders", ["o_orderkey"], 4,
                           path=str(tmp_path / "b_orders"))
            write_bucketed(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
                "b_lineitem", ["o_orderkey"], 4, path=str(tmp_path / "b_lineitem"),
            )
            joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: no shuffle at all
            assert joined.count() == lineitem.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestUdtfs:
    def test_ngram_expander(self, spark):
        spark.udtf.register("ngrams", NGramExpander)
        out = spark.sql(
            "SELECT * FROM ngrams('a b c', 1, 2) ORDER BY n, start_pos"
        ).collect()
        got = [(r["gram"], r["start_pos"], r["n"]) for r in out]
        assert got == [
            ("a", 0, 1), ("b", 1, 1), ("c", 2, 1),
            ("a b", 0, 2), ("b c", 1, 2),
        ]

    def test_lateral_join_with_udtf(self, spark):
        spark.udtf.register("ngrams", NGramExpander)
        docs = spark.createDataFrame([(1, "x y z")], "doc_id INT, text STRING")
        docs.createOrReplaceTempView("udtf_docs")
        out = spark.sql(
            "SELECT d.doc_id, g.gram FROM udtf_docs d, "
            "LATERAL ngrams(d.text, 2, 2) g"
        ).collect()
        assert sorted(r["gram"] for r in out) == ["x y", "y z"]

    def test_text_segment_parser(self, spark):
        spark.udtf.register("parse_text_segment", TextSegmentParser)
        out = spark.sql(
            "SELECT * FROM parse_text_segment('/$PAR/3/$TOT/100/$CYT/Foo//Bar/')"
        ).collect()
        kv = {r["key"]: r["value"] for r in out}
        assert kv == {"$PAR": "3", "$TOT": "100", "$CYT": "Foo/Bar"}


class TestPartitionPruning:
    def test_partitioned_write_prunes_scans(self, spark, tmp_path):
        """S5 payoff: a filter on the partition column must become a
        PartitionFilter (directory pruning), not a data Filter."""
        from fcs_etl_reactor_spark.io import write_parquet

        e = load(spark, SF_SMALL, "events")
        dest = str(tmp_path / "events_by_type")
        write_parquet(e, dest, partition_by=["event_type"])
        back = spark.read.parquet(dest).filter(F.col("event_type") == "click")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "click" in plan
        n_click = e.filter("event_type = 'click'").count()
        assert back.count() == n_click


class TestSinkOptions:
    def test_json_sink_roundtrip(self, spark, tmp_path):
        from fcs_etl_reactor_spark.io import write_json

        orig = load(spark, SF_SMALL, "nation")
        write_json(orig, str(tmp_path / "nation_json"))
        back = spark.read.schema(
            "n_nationkey INT, n_name STRING, n_regionkey INT"
        ).json(str(tmp_path / "nation_json"))
        assert sorted(map(tuple, back.select(*orig.columns).collect())) == sorted(
            map(tuple, orig.collect())
        )

    def test_zstd_compression_applied(self, spark, tmp_path):
        import os

        from fcs_etl_reactor_spark.io import write_parquet

        orig = load(spark, SF_SMALL, "orders")
        write_parquet(orig, str(tmp_path / "zstd"), compression="zstd")
        files = os.listdir(tmp_path / "zstd")
        assert any(".zstd.parquet" in f for f in files), files
        assert spark.read.parquet(str(tmp_path / "zstd")).count() == orig.count()

    def test_merge_schema_read(self, spark, tmp_path):
        from fcs_etl_reactor_spark.io import read_parquet_evolving, write_parquet

        v1 = spark.createDataFrame([(1, "a")], "id INT, name STRING")
        v2 = spark.createDataFrame([(2, "b", 9.5)], "id INT, name STRING, score DOUBLE")
        write_parquet(v1, str(tmp_path / "v1"))
        write_parquet(v2, str(tmp_path / "v2"))
        got = read_parquet_evolving(spark, str(tmp_path / "v1"), str(tmp_path / "v2"))
        rows = {r["id"]: (r["name"], r["score"]) for r in got.collect()}
        assert rows == {1: ("a", None), 2: ("b", 9.5)}


class TestXml:
    def test_xml_roundtrip(self, spark, tmp_path):
        from fcs_etl_reactor_spark.io import read_xml, write_xml

        df = spark.range(7).selectExpr(
            "id", "concat('name_', id) AS name", "id * 1.5 AS score"
        )
        path = str(tmp_path / "xml_out")
        write_xml(df, path, row_tag="rec", root_tag="recs")
        back = read_xml(spark, path, row_tag="rec")
        got = {(r["id"], r["name"], r["score"]) for r in back.collect()}
        want = {(r["id"], r["name"], r["score"]) for r in df.collect()}
        assert got == want

    def test_avro_is_env_gated(self, spark, tmp_path):
        import pytest as _pytest

        from fcs_etl_reactor_spark.io import read_avro

        try:
            spark.range(1).write.mode("overwrite").format("avro").save(
                str(tmp_path / "avro_out")
            )
        except Exception:
            # module absent here: the reader must raise the documented
            # NotImplementedError, not a raw AnalysisException
            with _pytest.raises(NotImplementedError):
                read_avro(spark, str(tmp_path / "avro_out"))
        else:  # pragma: no cover - runs only where spark-avro is deployed
            assert read_avro(spark, str(tmp_path / "avro_out")).count() == 1


class TestInterchangeRoundtrip:
    def test_all_formats_preserve_values(self, spark, tmp_path):
        # one DF through every sink/source pair this engine exposes —
        # parquet, ORC, CSV, JSON, XML — must reproduce identical
        # values (CSV/JSON/XML go through text, so compare on a
        # schema-pinned reread)
        from fcs_etl_reactor_spark.io import (
            read_csv, read_json, read_orc, read_xml,
            write_csv, write_json, write_orc, write_xml,
        )

        df = spark.range(20).selectExpr(
            "id",
            "concat('name_', id) AS name",
            "CAST(id AS DOUBLE) / 8 AS score",   # exact binary fractions
        )
        want = {(r["id"], r["name"], r["score"]) for r in df.collect()}
        ddl = "id BIGINT, name STRING, score DOUBLE"

        p = str(tmp_path / "p"); df.write.parquet(p)
        o = str(tmp_path / "o"); write_orc(df, o)
        c = str(tmp_path / "c"); write_csv(df, c)
        j = str(tmp_path / "j"); write_json(df, j)
        x = str(tmp_path / "x"); write_xml(df, x)

        reread = {
            "parquet": spark.read.parquet(p),
            "orc": read_orc(spark, o),
            "csv": read_csv(spark, c, schema=ddl),
            "json": read_json(spark, j, schema=ddl),
            "xml": read_xml(spark, x, schema=ddl),
        }
        for fmt, back in reread.items():
            got = {(r["id"], r["name"], r["score"]) for r in back.collect()}
            assert got == want, fmt


class TestSchemaEvolution:
    def test_merged_read_unions_epochs_with_nulls(self, spark):
        from pyspark.sql import functions as F

        from fcs_etl_reactor_spark.io import load
        from fcs_etl_reactor_spark.queries.storage import (
            _EVO_CUTOFF,
            _evolved_orders,
        )

        sf = "/root/testdata/sf0.001"
        merged = _evolved_orders(spark, sf)
        assert "o_orderpriority" in merged.columns
        o = load(spark, sf, "orders")
        n_total = o.count()
        n_early = o.filter(F.col("o_orderdate") < F.lit(_EVO_CUTOFF)).count()
        assert merged.count() == n_total
        # every pre-evolution row surfaces the added column as NULL
        assert (
            merged.filter(F.col("o_orderpriority").isNull()).count() == n_early
        )


class TestPartialLayoutGuards:
    """Regression tests for the round-5 review fixes: a crashed build
    that left a partial (no _SUCCESS) layout directory must NEVER be
    served — the loaders fall back to the exact source-derived scan."""

    def test_partitioned_events_partial_layout_falls_back(self, spark):
        import os
        import shutil

        from fcs_etl_reactor_spark.io import source_fingerprint
        from fcs_etl_reactor_spark.queries.storage import (
            _LAYOUT_ROOT,
            partitioned_events,
        )
        from tests.conftest import SF_SMALL

        fp = source_fingerprint(SF_SMALL, "events")
        path = os.path.join(_LAYOUT_ROOT, "partitioned", f"events_{fp}")
        shutil.rmtree(path, ignore_errors=True)
        try:
            # simulate a crashed pre-atomic build: partial dir, no _SUCCESS
            os.makedirs(os.path.join(path, "event_date=2024-01-01"))
            with open(
                os.path.join(path, "event_date=2024-01-01", "part-0.parquet"), "wb"
            ) as f:
                f.write(b"not parquet")
            df = partitioned_events(spark, SF_SMALL)
            # fallback path: full source row count, not the partial dir
            from fcs_etl_reactor_spark.io import load

            assert df.count() == load(spark, SF_SMALL, "events").count()
        finally:
            shutil.rmtree(path, ignore_errors=True)

    def test_relayout_partial_dest_serves_source(self, spark, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from fcs_etl_reactor_spark import io as io_mod

        # one BIG single-row-group file so _relayout wants to re-chunk
        n = io_mod._LAYOUT_MIN_ROWS + 1
        src = str(tmp_path / "big.parquet")
        pq.write_table(
            pa.table({"x": pa.array(range(n), type=pa.int64())}),
            src,
            row_group_size=n,
        )
        st = os.stat(src)
        dest = os.path.join(
            io_mod._LAYOUT_ROOT,
            os.path.dirname(src).strip("/").replace("/", "_"),
            f"{os.path.basename(src)}_{int(st.st_mtime)}_{st.st_size}",
        )
        # partial dest from a crashed build: exists, no _SUCCESS
        os.makedirs(dest, exist_ok=True)
        with open(os.path.join(dest, "part-0.parquet"), "wb") as f:
            f.write(b"junk")
        try:
            df = io_mod._relayout(spark, src, spark.read.parquet(src))
            assert df.count() == n  # source served, partial dir ignored
        finally:
            import shutil

            shutil.rmtree(dest, ignore_errors=True)
