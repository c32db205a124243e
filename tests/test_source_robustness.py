"""Source-layer robustness at scale: schemas evolve across partitions
and malformed records arrive — the reader must widen and quarantine,
not crash the job."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Old files lack a column added later; mergeSchema widens, the
    missing column reads as NULL for old rows."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)

    df = spark.read.option("mergeSchema", True).parquet(p)
    assert set(df.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_json_corrupt_records_are_quarantined(spark, tmp_path):
    """PERMISSIVE mode: bad lines land in _corrupt_record instead of
    failing the read; good rows parse normally."""
    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"id": 1, "v": "ok"}\n'
        "{not json at all\n"
        '{"id": 2, "v": "also ok"}\n'
    )
    schema = "id long, v string, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(src))
        # Spark requires materializing the parsed rows before the
        # corrupt-record column can be filtered on its own
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert {r.id for r in good.collect()} == {1, 2}
    assert bad.count() == 1


def test_csv_malformed_rows_dropped_in_dropmalformed(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,ok\nnot_a_number,broken,extra\n2,fine\n")
    df = (
        spark.read.schema("id long, v string")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(src))
    )
    assert {r.id for r in df.collect()} == {1, 2}
