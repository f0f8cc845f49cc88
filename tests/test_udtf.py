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
