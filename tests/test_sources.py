from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from census_asc5_data_pipeline_spark.sources.api_source import extract_api
from census_asc5_data_pipeline_spark.sources.csv_source import read_csv
from census_asc5_data_pipeline_spark.sources.json_source import read_jsonl, write_jsonl
from census_asc5_data_pipeline_spark.sources.sinks import write_csv, write_parquet


def fake_census_fetcher(columns: str, year: str) -> list[list[str]]:
    """Census-API-shaped response: row 0 is the header."""
    base = [[columns, "state"], ["Alpha", "1"], ["Beta", "2"]]
    if year == "2018":
        base.append(["Gamma", "3"])
    return base


def test_extract_api_multi_year(spark):
    df = extract_api(
        spark,
        "NAME",
        ["2017", "2018"],
        fetcher=fake_census_fetcher,
        rename={"NAME": "state", "state": "state_id"},
    )
    assert df.columns == ["state", "state_id", "year"]
    assert df.count() == 5  # 2 + 3
    assert df.filter("year = 2018").count() == 3


def test_csv_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    out = str(tmp_path / "csv_out")
    write_csv(df, out, single_file=True)
    back = read_csv(spark, out, schema=schema, rename={"v": "val"})
    assert back.columns == ["k", "val"]
    assert sorted(r.k for r in back.collect()) == [1, 2]


def test_jsonl_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "hello", "en"), (2, "hola", "es"), (3, "bonjour", "en")],
        "doc_id INT, text STRING, lang STRING",
    )
    out = str(tmp_path / "jsonl")
    write_jsonl(df, out, partition_by=["lang"])
    back = read_jsonl(spark, out, schema="doc_id INT, text STRING")
    assert back.count() == 3
    assert {r.text for r in back.collect()} == {"hello", "hola", "bonjour"}


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json at all\n{"doc_id": 2}\n')
    clean = read_jsonl(spark, str(p), schema="doc_id INT, text STRING")
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    kept = read_jsonl(
        spark, str(p), schema="doc_id INT, text STRING", keep_corrupt=True
    )
    bad = kept.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]._corrupt_record == "not json at all"


def test_incremental_ingest_processes_only_delta(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.incremental import (
        commit_increment,
        read_increment,
    )

    src = tmp_path / "src"
    ledger = str(tmp_path / "ledger")
    src.mkdir()
    spark.range(0, 10).coalesce(1).write.parquet(str(src / "a.parquet"))

    df1, files1 = read_increment(spark, str(src), ledger)
    assert len(files1) == 1 and df1.count() == 10
    commit_increment(spark, ledger, files1)

    # no new files → no-op
    df2, files2 = read_increment(spark, str(src), ledger)
    assert df2 is None and files2 == []

    # second batch arrives → only IT is read
    spark.range(100, 105).coalesce(1).write.parquet(str(src / "b.parquet"))
    df3, files3 = read_increment(spark, str(src), ledger)
    assert len(files3) == 1 and "b.parquet" in files3[0]
    assert sorted(r.id for r in df3.collect()) == [100, 101, 102, 103, 104]
    commit_increment(spark, ledger, files3)
    df4, _ = read_increment(spark, str(src), ledger)
    assert df4 is None


def test_parquet_partitioned_sink(spark, tmp_path):
    df = spark.range(10).withColumn("p", (F.col("id") % 2).cast("int"))
    out = str(tmp_path / "pq")
    write_parquet(df, out, partition_by=["p"])
    back = spark.read.parquet(out)
    assert back.count() == 10
    # partition pruning: only one directory read
    pruned = back.filter(F.col("p") == 1)
    assert pruned.count() == 5


def test_jsonl_schema_not_mutated_across_calls(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n')
    schema = T.StructType(
        [T.StructField("doc_id", T.IntegerType()), T.StructField("text", T.StringType())]
    )
    for _ in range(2):  # second call would hit a duplicate corrupt col pre-fix
        out = read_jsonl(spark, str(p), schema=schema, keep_corrupt=True)
        assert out.columns == ["doc_id", "text", "_corrupt_record"]
    assert [f.name for f in schema.fields] == ["doc_id", "text"]


def test_incremental_corrupt_ledger_raises(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.incremental import new_files

    src = tmp_path / "src2"
    src.mkdir()
    spark.range(3).coalesce(1).write.parquet(str(src / "a.parquet"))
    ledger = tmp_path / "ledger2"
    ledger.mkdir()
    (ledger / "garbage.parquet").write_text("not parquet at all")
    import pytest as _pytest

    with _pytest.raises(Exception):
        new_files(spark, str(src), str(ledger))


def test_csv_malformed_rows_dropped(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,a\nnot_an_int,b\n3,c\n")
    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    clean = read_csv(spark, str(p), schema=schema, mode="DROPMALFORMED")
    assert sorted((r.k, r.v) for r in clean.collect()) == [(1, "a"), (3, "c")]
    # PERMISSIVE (default): bad cell nulls out, row count preserved
    loose = read_csv(spark, str(p), schema=schema)
    assert loose.count() == 3
    assert loose.filter(F.col("k").isNull()).count() == 1


def test_census_url_matches_reference_shape():
    """URL construction parity with the reference Lambda
    (extractCensusACS5.py:26): {base}{year}/{dataset}?get=...&for=state:*&key=..."""
    from census_asc5_data_pipeline_spark.sources.api_source import census_url

    url = census_url("NAME,DP03_0062E", "2016", api_key="SECRET")
    assert url == (
        "https://api.census.gov/data/2016/acs/acs5/profile"
        "?get=NAME,DP03_0062E&for=state:*&key=SECRET"
    )


def test_extract_api_year_loop_and_url_shape(spark, monkeypatch):
    """The requests fetcher drives one GET per year with the reference's
    URL; a fake requests module records calls — no network involved."""
    import sys
    import types

    from census_asc5_data_pipeline_spark.sources.api_source import (
        extract_api,
        make_requests_fetcher,
    )

    calls: list[str] = []

    class FakeResponse:
        def raise_for_status(self):
            pass

        def json(self):
            year = calls[-1].split("/data/")[1].split("/")[0]
            return [["NAME", "DP03_0062E", "state"], ["Alabama", "44758", "01"],
                    ["Alaska", "74444", "02"]] if year else []

    fake_requests = types.ModuleType("requests")

    def fake_get(url, timeout=None):
        calls.append(url)
        assert timeout  # production fetcher must set a timeout
        return FakeResponse()

    fake_requests.get = fake_get
    monkeypatch.setitem(sys.modules, "requests", fake_requests)

    fetcher = make_requests_fetcher(api_key="K")
    df = extract_api(spark, "NAME,DP03_0062E", ["2016", "2021"], fetcher)
    assert [c.split("?")[0] for c in calls] == [
        "https://api.census.gov/data/2016/acs/acs5/profile",
        "https://api.census.gov/data/2021/acs/acs5/profile",
    ]
    assert all("get=NAME,DP03_0062E" in c and "key=K" in c for c in calls)
    rows = df.collect()
    assert len(rows) == 4  # 2 states x 2 years, headers promoted not kept
    assert {r.year for r in rows} == {2016, 2021}


def test_orc_roundtrip_partitioned_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from census_asc5_data_pipeline_spark.sources.sinks import write_orc

    df = spark.createDataFrame(
        [(i, f"t{i}", i % 3) for i in range(30)], "id bigint, t string, p bigint"
    )
    out = str(tmp_path / "orc")
    write_orc(df, out, partition_by=["p"])
    back = spark.read.orc(out)
    assert back.count() == 30
    assert {r.id for r in back.filter(F.col("p") == 1).collect()} == {
        i for i in range(30) if i % 3 == 1
    }
    # partition pruning: only the p=1 directory is scanned
    plan = back.filter(F.col("p") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "(p" in plan


def test_binary_file_source_feeds_multimodal_pipeline(spark, tmp_path):
    from census_asc5_data_pipeline_spark.operators.multimodal import decode_media
    from census_asc5_data_pipeline_spark.sources.binary_source import (
        read_binary_files,
    )

    d = tmp_path / "media"
    (d / "sub").mkdir(parents=True)
    (d / "a.jpg").write_bytes(b"\xff\xd8fakejpegbytes")
    (d / "b.png").write_bytes(b"\x89PNGfakebytes")
    (d / "noext").write_bytes(b"rawbytes")
    (d / "sub" / "c.jpg").write_bytes(b"\xff\xd8nested")

    flat = read_binary_files(spark, str(d))
    rows = {r.path.split("/")[-1]: r for r in flat.collect()}
    assert set(rows) == {"a.jpg", "b.png", "noext"}  # non-recursive
    assert rows["a.jpg"].media_type == "bin/jpg"
    assert rows["noext"].media_type == "bin/raw"
    assert bytes(rows["b.png"].payload) == b"\x89PNGfakebytes"
    assert rows["a.jpg"].n_bytes == len(b"\xff\xd8fakejpegbytes")
    assert len({r.doc_id for r in rows.values()}) == 3  # stable distinct ids

    # glob pruning happens at listing time; recursive walks nested dirs
    jpgs = read_binary_files(spark, str(d), glob="*.jpg", recursive=True)
    assert {r.path.split("/")[-1] for r in jpgs.collect()} == {"a.jpg", "c.jpg"}

    # the normalized frame feeds the multimodal decode kernels unchanged
    decoded = {r.doc_id: r for r in decode_media(flat, codec="stub").collect()}
    assert set(decoded) == {r.doc_id for r in rows.values()}
    assert all(v.n_bytes > 0 for v in decoded.values())


def test_binary_file_source_extension_edge_cases(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.binary_source import (
        read_binary_files,
    )

    d = tmp_path / "edge"
    d.mkdir()
    (d / "archive.").write_bytes(b"x")   # trailing dot -> raw
    (d / ".env").write_bytes(b"x")       # hidden: Spark listings skip it
    (d / "a.b.GZ").write_bytes(b"x")     # last suffix, lowercased
    got = {
        r.path.split("/")[-1]: r.media_type
        for r in read_binary_files(spark, str(d)).collect()
    }
    # dotfiles never surface (Spark's file listing filters leading-dot
    # and leading-underscore names); the regex still maps them to raw
    # defensively if a future listing config admits them
    assert got == {"archive.": "bin/raw", "a.b.GZ": "bin/gz"}


def test_parquet_schema_evolution_merged_read(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.sinks import (
        read_parquet_evolving,
        write_parquet,
    )

    out = str(tmp_path / "evolve")
    # batch 1: pre-evolution schema
    write_parquet(spark.createDataFrame([(1, "a")], "id LONG, v STRING"), out)
    # batch 2 appends with an added column
    write_parquet(
        spark.createDataFrame([(2, "b", 9.5)], "id LONG, v STRING, score DOUBLE"),
        out,
        mode="append",
    )
    merged = read_parquet_evolving(spark, out)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None  # old rows surface the new column as NULL
    assert rows[2].score == 9.5


def test_dynamic_partition_overwrite_replaces_only_written(spark, tmp_path):
    """Re-running one day must replace that day only: static overwrite
    wipes the table root; dynamic scopes the delete to the partitions
    in the incoming frame."""
    from census_asc5_data_pipeline_spark.sources.sinks import (
        overwrite_partitions_dynamic,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("d1", 1, 10), ("d1", 2, 20), ("d2", 3, 30)], ["day", "id", "v"]
    )
    overwrite_partitions_dynamic(base, path, ["day"])
    # rerun day d2 with corrected values; d1 must survive untouched
    fix = spark.createDataFrame([("d2", 3, 99), ("d2", 4, 44)], ["day", "id", "v"])
    overwrite_partitions_dynamic(fix, path, ["day"])
    got = {
        (r.day, r.id, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == {("d1", 1, 10), ("d1", 2, 20), ("d2", 3, 99), ("d2", 4, 44)}
    # static overwrite for contrast: the whole root is truncated
    fix.write.mode("overwrite").partitionBy("day").parquet(path)
    assert {
        (r.day, r.id, r.v) for r in spark.read.parquet(path).collect()
    } == {("d2", 3, 99), ("d2", 4, 44)}


def test_schema_diff_reports_drift(spark, tmp_path):
    from census_asc5_data_pipeline_spark.sources.sinks import schema_diff

    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    spark.createDataFrame([(1, "a", 1.5)], ["id", "name", "score"]).write.parquet(old)
    spark.createDataFrame(
        [(1, "a", 2, "x")], ["id", "name", "score", "extra"]
    ).write.parquet(new)
    got = {d["column"]: d for d in schema_diff(spark, old, new)}
    assert got["extra"]["status"] == "added"
    assert got["score"]["status"] == "retyped"
    assert "double" in got["score"]["type"] and "bigint" in got["score"]["type"]
    assert "id" not in got and "name" not in got


def test_python_datasource_batch_parallel_deterministic(spark):
    """Spark 4 Python Data Source API: schema-declared, partitioned,
    deterministic — and the rows feed the text operators unchanged."""
    from census_asc5_data_pipeline_spark.sources.python_datasource import (
        register,
    )

    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )
    assert df.columns == ["doc_id", "text", "source"]
    assert df.count() == 500
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(
        tuple(r)
        for r in spark.read.format("synthetic_docs")
        .option("rows", 500)
        .load()
        .collect()
    )
    assert a == b, "two reads must be identical (deterministic source)"
    assert len({r[0] for r in a}) == 500, "doc_ids unique across partitions"
    # compose with an engine operator
    from census_asc5_data_pipeline_spark.operators.text import token_counts

    assert token_counts(df).count() == 500


def test_python_datasource_streaming_resumes_exactly(spark, tmp_path):
    """Stop the stream mid-flight and restart from the SAME checkpoint:
    the counter-offset source plus a per-epoch idempotent sink must
    yield every id exactly once — this drives BOTH
    SimpleDataSourceStreamReader.read (live) and readBetweenOffsets
    (the restart's replay of the last uncommitted batch)."""
    import time as _t

    from census_asc5_data_pipeline_spark.sources.python_datasource import (
        register,
    )

    register(spark)
    out_dir = str(tmp_path / "pyds_out")
    ckpt = str(tmp_path / "pyds_ckpt")

    def start():
        def sink(batch_df, epoch_id):
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_{epoch_id:08d}"
            )

        return (
            spark.readStream.format("synthetic_docs")
            .option("rows_per_batch", 50)
            .load()
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )

    schema = "doc_id long, text string, source string"

    def rows_written():
        try:
            return spark.read.schema(schema).parquet(f"{out_dir}/batch_*").count()
        except Exception:
            return 0

    q = start()
    deadline = _t.time() + 60
    while _t.time() < deadline and rows_written() < 100:
        _t.sleep(1)
    q.stop()  # mid-flight kill; last batch may be uncommitted
    q2 = start()  # same checkpoint -> replay via readBetweenOffsets
    deadline = _t.time() + 60
    n0 = rows_written()
    while _t.time() < deadline and rows_written() < n0 + 100:
        _t.sleep(1)
    q2.stop()
    ids = sorted(
        r.doc_id
        for r in spark.read.schema(schema).parquet(
            f"{out_dir}/batch_*"
        ).collect()
    )
    assert len(ids) >= 200
    assert ids == list(range(len(ids))), "exactly-once across restart"


def test_python_datasource_writer_manifest_commit(spark, tmp_path):
    """Write path of the Python Data Source API: per-task part files +
    driver-side manifest commit — readers through the manifest see
    exactly the committed rows."""
    import json
    import os

    from census_asc5_data_pipeline_spark.sources.python_datasource import (
        register,
        register_writer,
    )

    register(spark)
    register_writer(spark)
    out = str(tmp_path / "mjsonl")
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", 300)
        .option("partitions", 4)
        .load()
    )
    df.write.format("manifest_jsonl").option("path", out).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    assert manifest["n_rows"] == 300
    assert len(manifest["parts"]) == 4
    # read back exactly the manifested parts
    rows = []
    for part in manifest["parts"]:
        with open(os.path.join(out, part["path"])) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == 300
    assert sorted(r["doc_id"] for r in rows) == list(range(300))
    # append merges into the manifest; overwrite replaces and cleans up
    df.write.format("manifest_jsonl").option("path", out).mode(
        "append"
    ).save()
    m2 = json.load(open(os.path.join(out, "_manifest.json")))
    assert m2["n_rows"] == 600 and len(m2["parts"]) == 8
    df.write.format("manifest_jsonl").option("path", out).mode(
        "overwrite"
    ).save()
    m3 = json.load(open(os.path.join(out, "_manifest.json")))
    assert m3["n_rows"] == 300 and len(m3["parts"]) == 4
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert on_disk == {p["path"] for p in m3["parts"]}, "stale parts removed"


def test_manifest_commit_lock_serializes_appends(tmp_path):
    """The append-mode manifest publish is a read-modify-write, so it
    runs under an exclusive lock file (advisor round-5 finding: two
    concurrent appends could drop the first job's parts). Unit-level:
    a held lock blocks commit until released (parts from both commits
    survive), and a stale lock times out with a clear error instead of
    deadlocking."""
    import json
    import os
    import threading
    import time

    from census_asc5_data_pipeline_spark.sources.python_datasource import (
        ManifestJsonlWriter,
        _PartFile,
    )

    import pytest as _pytest

    out = str(tmp_path / "m")
    os.makedirs(out)
    lock = os.path.join(out, "_manifest.json.lock")

    # stale lock -> TimeoutError, lock left for the operator to inspect
    open(lock, "w").close()
    w = ManifestJsonlWriter(
        {"path": out, "lock_timeout": "0.2"}, overwrite=False
    )
    with _pytest.raises(TimeoutError, match="manifest lock"):
        w.commit([_PartFile(os.path.join(out, "p0.jsonl"), 1)])
    # held-then-released lock -> commit waits, then both appends land
    w2 = ManifestJsonlWriter(
        {"path": out, "lock_timeout": "5"}, overwrite=False
    )
    t = threading.Timer(0.3, os.remove, args=(lock,))
    t.start()
    w2.commit([_PartFile(os.path.join(out, "p1.jsonl"), 2)])
    t.join()
    w2.commit([_PartFile(os.path.join(out, "p2.jsonl"), 3)])
    m = json.load(open(os.path.join(out, "_manifest.json")))
    assert {p["path"] for p in m["parts"]} == {"p1.jsonl", "p2.jsonl"}
    assert m["n_rows"] == 5
    assert not os.path.exists(lock), "lock released after commit"


def test_avro_roundtrip_types_nulls_and_nan(spark, tmp_path):
    """Avro container source/sink (pure-python codec in this container
    — no spark-avro jar): full type surface round-trips through
    task-parallel encode + file-parallel decode, with NULL kept
    distinct from NaN in double columns (the mapInArrow rationale) and
    binary/boolean/string/int/long/float/double all preserved."""
    import math

    from census_asc5_data_pipeline_spark.sources.avro_io import (
        read_avro,
        write_avro,
    )

    df = spark.createDataFrame(
        [
            (1, 10, 1.5, 2.5, "alpha", True, bytearray(b"\x00\x01")),
            (2, None, float("nan"), None, None, None, None),
            (3, 30, None, 7.25, "beta", False, bytearray(b"xyz")),
        ],
        "k bigint, i int, d double, f float, s string, b boolean, raw binary",
    ).repartition(2)
    out = str(tmp_path / "avro")
    n = write_avro(df, out, codec="deflate")
    assert n == 3
    got = {r.k: r for r in read_avro(spark, out).collect()}
    assert sorted(got) == [1, 2, 3]
    assert got[1].i == 10 and got[1].s == "alpha" and bytes(got[1].raw) == b"\x00\x01"
    # NULL stays NULL; NaN stays NaN — not conflated
    assert got[2].i is None and got[2].f is None and got[2].s is None
    assert got[2].d is not None and math.isnan(got[2].d)
    assert got[3].d is None and abs(got[3].f - 7.25) < 1e-6
    assert got[3].b is False


def test_avro_container_format_on_disk(spark, tmp_path):
    """The files are real Avro object containers per the public spec:
    magic Obj\\x01, avro.schema metadata with the record fields, sync
    markers separating blocks — interchangeable with standard tools."""
    import glob
    import json as _json

    from census_asc5_data_pipeline_spark.sources.avro_io import (
        _read_header,
        write_avro,
    )

    df = spark.range(0, 50).selectExpr("id", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "avro")
    write_avro(df, out, codec="null")
    files = glob.glob(out + "/*.avro")
    assert files
    with open(files[0], "rb") as fh:
        assert fh.read(4) == b"Obj\x01"
        fh.seek(0)
        schema, codec, sync = _read_header(fh)
    assert codec == "null" and len(sync) == 16
    assert [f["name"] for f in schema["fields"]] == ["id", "s"]
    manifest = _json.load(open(out + "/_manifest.json"))
    assert manifest["n_rows"] == 50


def test_avro_empty_write_reads_back_empty(spark, tmp_path):
    """An empty write is a valid dataset: the manifest carries the
    Spark DDL, so a zero-part directory reads back as an empty frame
    with the right schema instead of raising (review finding — the JVM
    connector round-trips empty frames, the fallback must too)."""
    from census_asc5_data_pipeline_spark.sources.avro_io import (
        read_avro,
        write_avro,
    )

    df = spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "avro")
    assert write_avro(df, out) == 0
    back = read_avro(spark, out)
    assert back.count() == 0
    assert back.columns == ["id", "s"]


def test_avro_foreign_field_order_binds_by_name(spark, tmp_path):
    """A foreign-written directory whose files carry the SAME fields in
    a DIFFERENT order must bind values by NAME, not position — the
    fallback takes the dataset schema from the first file but decodes
    each file with its own embedded schema, so positional binding would
    silently swap columns (advisor round-6 finding). An INCOMPATIBLE
    plan (different type) must raise, not mis-decode."""
    from census_asc5_data_pipeline_spark.sources.avro_io import (
        _write_container,
        read_avro,
    )

    out = tmp_path / "avro"
    out.mkdir()
    sch_ab = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    sch_ba = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "b", "type": "string"},
            {"name": "a", "type": "long"},
        ],
    }
    with open(out / "0.avro", "wb") as fh:
        _write_container(fh, sch_ab, [[(1, "x"), (2, "y")]], "null")
    with open(out / "1.avro", "wb") as fh:
        _write_container(fh, sch_ba, [[("z", 3)]], "null")
    got = sorted((r.a, r.b) for r in read_avro(spark, str(out)).collect())
    assert got == [(1, "x"), (2, "y"), (3, "z")]

    # incompatible type -> loud error from the decode task
    sch_bad = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "double"},
            {"name": "b", "type": "string"},
        ],
    }
    with open(out / "2.avro", "wb") as fh:
        _write_container(fh, sch_bad, [[(1.5, "w")]], "null")
    import pytest as _pytest

    with _pytest.raises(Exception, match="field plan"):
        read_avro(spark, str(out)).collect()


def test_avro_overwrite_removes_stale_parts(spark, tmp_path):
    """Overwrite deletes the PRIOR manifest's parts after the new
    manifest publishes — otherwise old uuid-named files accumulate and
    a manifest-less *.avro glob (the interchange contract) returns old
    rows mixed with new (review finding)."""
    import glob

    from census_asc5_data_pipeline_spark.sources.avro_io import (
        read_avro,
        write_avro,
    )

    out = str(tmp_path / "avro")
    write_avro(spark.range(100).selectExpr("id"), out)
    first = set(glob.glob(out + "/*.avro"))
    assert first
    write_avro(spark.range(7).selectExpr("id"), out, mode="overwrite")
    second = set(glob.glob(out + "/*.avro"))
    assert not (first & second), "stale parts removed"
    assert read_avro(spark, out).count() == 7
    # mode='error' refuses to clobber an existing dataset
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        write_avro(spark.range(1).selectExpr("id"), out, mode="error")


def test_arrow_ipc_roundtrip_types_nulls_nan_timestamp(spark, tmp_path):
    """Arrow IPC source/sink: the full flat type surface + timestamp
    round-trips through task-parallel IPC writes and file-parallel
    batch-verbatim reads; NULL stays distinct from NaN (native Arrow
    null bitmap end-to-end — no pandas conflation anywhere)."""
    import datetime as dt
    import math

    from census_asc5_data_pipeline_spark.sources.arrow_io import (
        read_arrow,
        write_arrow,
    )

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 10, 1.5, 2.5, "alpha", True, bytearray(b"\x00\x01"), t0),
            (2, None, float("nan"), None, None, None, None, None),
            (3, 30, None, 7.25, "beta", False, bytearray(b"xyz"), t0),
        ],
        "k bigint, i int, d double, f float, s string, b boolean, "
        "raw binary, ts timestamp",
    ).repartition(2)
    out = str(tmp_path / "arrow")
    n = write_arrow(df, out)
    assert n == 3
    got = {r.k: r for r in read_arrow(spark, out).collect()}
    assert sorted(got) == [1, 2, 3]
    assert got[1].i == 10 and got[1].s == "alpha"
    assert bytes(got[1].raw) == b"\x00\x01"
    assert got[1].ts == t0
    assert got[2].i is None and got[2].f is None and got[2].ts is None
    assert got[2].d is not None and math.isnan(got[2].d)
    assert got[3].d is None and abs(got[3].f - 7.25) < 1e-6


def test_arrow_ipc_interchanges_with_foreign_readers_and_writers(
    spark, tmp_path
):
    """The files are REAL Arrow IPC: plain pyarrow reads a part file
    directly, and a file written by plain pyarrow (no manifest, foreign
    types like naive timestamps) reads back through read_arrow."""
    import glob

    import pyarrow as pa

    from census_asc5_data_pipeline_spark.sources.arrow_io import (
        read_arrow,
        write_arrow,
    )

    df = spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "arrow")
    assert write_arrow(df, out) == 100
    parts = glob.glob(out + "/*.arrow")
    assert parts
    with pa.ipc.open_file(parts[0]) as rd:
        tbl = rd.read_all()
    assert set(tbl.column_names) == {"id", "s"}

    # foreign-written dir: pyarrow writes one IPC file, no manifest
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    ft = pa.table(
        {"id": pa.array([1, 2], pa.int64()), "s": pa.array(["a", None])}
    )
    with pa.OSFile(str(foreign / "data.arrow"), "wb") as sink:
        with pa.ipc.new_file(sink, ft.schema) as w:
            w.write_table(ft)
    back = read_arrow(spark, str(foreign))
    assert {(r.id, r.s) for r in back.collect()} == {(1, "a"), (2, None)}


def test_arrow_ipc_hostile_column_names_round_trip(spark, tmp_path):
    """Column names containing commas and backticks are legal in quoted
    DDL; the decode task must take its schema from the manifest's
    structured (name, type) pairs, not a naive DDL string-split that
    such names break (advisor round-6 finding). Pre-r7 manifests
    without 'fields' parse spark_ddl with the REAL Spark parser."""
    import json as _json

    from census_asc5_data_pipeline_spark.sources.arrow_io import (
        read_arrow,
        write_arrow,
    )
    from pyspark.sql import functions as F

    out = str(tmp_path / "arrow")
    df = spark.range(5).select(
        F.col("id").alias("a,b"),
        (F.col("id") * 2).alias("w`eird"),
        F.lit("x").alias("plain"),
    )
    assert write_arrow(df, out) == 5
    back = read_arrow(spark, out)
    assert back.columns == ["a,b", "w`eird", "plain"]
    assert sorted(r["a,b"] for r in back.collect()) == [0, 1, 2, 3, 4]

    # pre-r7 manifest shape: strip 'fields', keep quoted spark_ddl
    mpath = tmp_path / "arrow" / "_manifest.json"
    meta = _json.load(open(mpath))
    del meta["fields"]
    _json.dump(meta, open(mpath, "w"))
    legacy = read_arrow(spark, out)
    assert legacy.columns == ["a,b", "w`eird", "plain"]
    assert legacy.count() == 5


def test_arrow_ipc_empty_and_overwrite_semantics(spark, tmp_path):
    """Empty writes read back schema-stable via the manifest DDL, and
    overwrite removes the prior manifest's parts only after the new
    manifest lands (no stale-row mixing on a manifest-less glob)."""
    import glob

    from census_asc5_data_pipeline_spark.sources.arrow_io import (
        read_arrow,
        write_arrow,
    )

    out = str(tmp_path / "arrow")
    empty = spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s")
    assert write_arrow(empty, out) == 0
    back = read_arrow(spark, out)
    assert back.count() == 0 and back.columns == ["id", "s"]

    assert write_arrow(spark.range(0, 10).selectExpr("id", "'x' AS s"), out) == 10
    first_parts = set(glob.glob(out + "/*.arrow"))
    assert write_arrow(spark.range(0, 5).selectExpr("id", "'y' AS s"), out) == 5
    assert read_arrow(spark, out).count() == 5
    # prior parts are gone — a *.arrow glob sees only the live dataset
    assert not (first_parts & set(glob.glob(out + "/*.arrow")))


def test_arrow_ipc_crash_orphans_never_pollute_reads(spark, tmp_path):
    """Manifest-first crash discipline: parts left by a crashed write
    (an .inprogress temp AND a fully-written part that never made the
    manifest) are invisible to read_arrow — the manifest, not the
    directory listing, defines the dataset."""
    import shutil

    import pyarrow as pa

    from census_asc5_data_pipeline_spark.sources.arrow_io import (
        read_arrow,
        write_arrow,
    )

    out = str(tmp_path / "arrow")
    assert write_arrow(spark.range(0, 20).selectExpr("id"), out) == 20
    # crash debris: a torn temp file and an orphaned complete part
    with open(out + "/part-torn.arrow.inprogress", "wb") as fh:
        fh.write(b"\x00" * 10)
    t = pa.table({"id": pa.array([999], pa.int64())})
    with pa.OSFile(out + "/part-orphan.arrow", "wb") as sink:
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
    got = sorted(r.id for r in read_arrow(spark, out).collect())
    assert got == list(range(20))  # 999 and the torn file never appear


def test_csv_multiline_quoted_fields_roundtrip(spark, tmp_path):
    """RFC-4180 hard cases through read_csv's option passthrough:
    quoted fields containing embedded newlines, commas and escaped
    quotes must parse as single rows with multiLine=true (the mode a
    real scraped-text CSV ingest needs — without it the embedded
    newline silently splits one record into two corrupt rows)."""
    from census_asc5_data_pipeline_spark.sources.csv_source import read_csv

    p = tmp_path / "ml.csv"
    p.write_text(
        'id,txt\n'
        '1,"line one\nline two, still field"\n'
        '2,"say ""hi"" twice"\n'
        '3,plain\n'
    )
    df = read_csv(
        spark,
        str(p),
        schema="id INT, txt STRING",
        multiLine="true",
        escape='"',
    )
    got = {r.id: r.txt for r in df.collect()}
    assert got == {
        1: "line one\nline two, still field",
        2: 'say "hi" twice',
        3: "plain",
    }
