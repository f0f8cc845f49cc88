"""Delta version-checksum sidecars (r15 elective — delta-spark
writes a ``<version>.crc`` beside every commit): incremental
chaining across every engine verb, full-state re-seed for foreign
tables, read-side audit, vacuum cleanup."""
from __future__ import annotations

import json
import os

import pytest
import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d
from census_asc5_data_pipeline_spark.sources.merge import merge_into


def test_crc_chains_across_verbs(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(
        spark.range(10).coalesce(1).select(F.col("id"),
                                           (F.col("id") % 3).alias("k")),
        p,
    )
    d.write_delta(
        spark.range(10, 14).coalesce(1).select(
            F.col("id"), (F.col("id") % 3).alias("k")
        ),
        p,
    )
    d.delete_delta_where(spark, p, "id >= 12", mode="cow")
    merge_into(
        spark, "delta", p,
        spark.range(13, 16).select(F.col("id"), F.lit(9).alias("k")),
        "t.id = s.id",
        matched=[("update", None, {"k": "s.k"})],
        not_matched={"id": "s.id", "k": "s.k"},
    )
    d.delete_delta_where(spark, p, "id = 0", mode="dv")
    last = max(d.delta_versions(p))
    for v in range(last + 1):
        assert os.path.exists(d._crc_file(p, v)), v
        doc = d.verify_crc(spark, p, v)  # audit vs replay, per version
        assert doc["numFiles"] >= 1
    # the latest crc's protocol/metadata are the live ones
    doc = json.load(open(d._crc_file(p, last)))
    assert doc["metadata"]["schemaString"]
    assert doc["protocol"]["minReaderVersion"] >= 1


def test_crc_detects_divergence(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(spark.range(5).coalesce(1).select(F.col("id")), p)
    f = d._crc_file(p, 0)
    doc = json.load(open(f))
    doc["numFiles"] += 1
    json.dump(doc, open(f, "w"))
    with pytest.raises(ValueError, match="checksum mismatch"):
        d.verify_crc(spark, p, 0)


def test_foreign_table_reseeds_then_chains(spark, tmp_path):
    p = str(tmp_path / "t")
    d.write_delta(spark.range(5).coalesce(1).select(F.col("id")), p)
    d.write_delta(spark.range(5, 8).coalesce(1).select(F.col("id")), p)
    # simulate a foreign table: no checksums at all
    for v in (0, 1):
        os.remove(d._crc_file(p, v))
    # a new commit cannot chain (prev crc missing) -> best-effort skip
    d.write_delta(spark.range(8, 9).coalesce(1).select(F.col("id")), p)
    assert not os.path.exists(d._crc_file(p, 2))
    # full-state re-seed, then the NEXT commit chains again
    d.compute_crc(spark, p)
    d.verify_crc(spark, p)
    d.write_delta(spark.range(9, 10).coalesce(1).select(F.col("id")), p)
    assert os.path.exists(d._crc_file(p, 3))
    d.verify_crc(spark, p, 3)


def test_vacuum_prunes_crc_with_commits(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(4):
        d.write_delta(
            spark.range(i * 5, i * 5 + 5).coalesce(1).select(F.col("id")),
            p,
        )
    import time as _time

    # age everything so the mtime guard lets vacuum prune
    old = _time.time() - 7 * 86400
    for f in os.listdir(os.path.join(p, "_delta_log")):
        os.utime(os.path.join(p, "_delta_log", f), (old, old))
    for root, _dirs, files in os.walk(p):
        for f in files:
            os.utime(os.path.join(root, f), (old, old))
    res = d.vacuum_delta(spark, p, keep_versions=1)
    assert res["log_files_removed"] >= 1
    for v in range(4):
        cf = os.path.join(p, "_delta_log", f"{v:020d}.json")
        assert os.path.exists(cf) == os.path.exists(d._crc_file(p, v)), v
    d.verify_crc(spark, p, max(d.delta_versions(p)))


def test_torn_prev_crc_never_fails_a_durable_commit(spark, tmp_path):
    """r15 ADVICE: _write_crc runs AFTER os.link makes the commit
    durable; a torn/foreign previous .crc (JSONDecodeError, missing
    keys) must be swallowed, not surface as a commit failure."""
    import os

    p = str(tmp_path / "t")
    df = spark.range(4).select(F.col("id"), (F.col("id") % 2).alias("k"))
    d.write_delta(df, p)
    # tear version 0's checksum: invalid JSON, then wrong shape
    crc0 = os.path.join(p, "_delta_log", f"{0:020d}.crc")
    with open(crc0, "w") as fh:
        fh.write("{torn")
    d.write_delta(df, p)  # must not raise
    assert len(d.delta_versions(p)) == 2
    with open(crc0, "w") as fh:
        fh.write('{"unexpected": "shape"}')
    d.write_delta(df, p)  # KeyError path — must not raise either
    assert len(d.delta_versions(p)) == 3
    assert d.read_delta(spark, p).count() == 12
