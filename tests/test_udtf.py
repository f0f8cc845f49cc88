"""Python UDTF surface: the SQL-callable lateral twin of the F.*
chunking operator must produce IDENTICAL rows (the UDTF is API-surface
parity, never the hot path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.catalog import read_table
from census_asc5_data_pipeline_spark.functions.udtfs import register_udtfs
from census_asc5_data_pipeline_spark.operators.text import chunk_documents

SF = "/root/testdata/sf0.001"


def test_text_chunks_udtf_matches_operator(spark):
    register_udtfs(spark)
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    docs.limit(50).createOrReplaceTempView("udtf_docs")
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_text "
            "FROM udtf_docs d, LATERAL text_chunks(d.text, 16, 8) c"
        ).collect()
    }
    want = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(
            docs.limit(50), chunk_tokens=16, stride=8
        ).collect()
    }
    assert got == want
    assert len(got) > 50  # multi-chunk docs actually exercised


def test_text_chunks_udtf_short_and_empty_docs(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, None), (4, "solo")],
        ["doc_id", "text"],
    ).createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_text "
        "FROM udtf_edge d, LATERAL text_chunks(d.text, 4, 2) c"
    ).collect()
    got = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text) for r in rows}
    # short docs yield ONE partial chunk; empty/null docs yield none
    assert got == {
        (1, 0): (3, "one two three"),
        (4, 0): (1, "solo"),
    }


def test_json_fields_udtf_matches_fstar_twin_on_scalars(spark):
    """The SQL-callable json_fields lateral must agree row-for-row
    with the pure-F.* twin (posexplode over from_json map entries) on
    scalar payloads — the events.props corpus is exactly that shape."""
    register_udtfs(spark)
    ev = read_table(spark, SF, "events").select("event_id", "props").limit(
        200
    )
    ev.createOrReplaceTempView("udtf_ev")
    got = {
        (r.event_id, r.pos): (r.key, r.value)
        for r in spark.sql(
            "SELECT e.event_id, j.pos, j.key, j.value "
            "FROM udtf_ev e, LATERAL json_fields(e.props) j"
        ).collect()
    }
    want = {
        (r.event_id, r.pos): (r.key, r.value)
        for r in ev.select(
            "event_id",
            F.posexplode(
                F.map_entries(F.from_json("props", "map<string,string>"))
            ).alias("pos", "kv"),
        )
        .select(
            "event_id",
            "pos",
            F.col("kv.key").alias("key"),
            F.col("kv.value").alias("value"),
        )
        .collect()
    }
    assert got == want and len(got) >= 200


def test_json_fields_udtf_types_and_malformed(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [
            (1, '{"s":"x","n":3,"f":1.5,"b":true,"z":null,'
                '"o":{"a":1},"l":[1,2]}'),
            (2, "not json"),
            (3, None),
            (4, "[1,2,3]"),
        ],
        ["id", "js"],
    ).createOrReplaceTempView("udtf_js")
    rows = spark.sql(
        "SELECT d.id, j.pos, j.key, j.value, j.vtype "
        "FROM udtf_js d, LATERAL json_fields(d.js) j"
    ).collect()
    assert {r.id for r in rows} == {1}  # malformed/null/non-object drop
    got = {r.key: (r.pos, r.value, r.vtype) for r in rows}
    assert got == {
        "s": (0, "x", "string"),
        "n": (1, "3", "number"),
        "f": (2, "1.5", "number"),
        "b": (3, "true", "boolean"),
        "z": (4, None, "null"),
        "o": (5, '{"a":1}', "object"),
        "l": (6, "[1,2]", "array"),
    }
