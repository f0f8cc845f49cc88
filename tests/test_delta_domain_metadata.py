"""Delta domainMetadata (r15 elective — PROTOCOL.md §Domain
Metadata): per-domain latest-wins replay with removed-tombstones,
the set/remove writer surface (protocol upgrade in the same commit,
delta.* system domains refused), and survival through every
checkpoint form + vacuum — the property that makes CHECKPOINT safe
on tables carrying the feature."""
from __future__ import annotations

import json
import os

import pytest
import pyspark.sql.functions as F

from census_asc5_data_pipeline_spark.sources import delta_io as d


def _mk(spark, path: str, n: int = 4) -> None:
    d.write_delta(
        spark.range(n).coalesce(1).select(F.col("id")), path
    )


def test_set_replay_and_tombstone(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    v1 = d.set_domain_metadata(spark, p, "app.retention", '{"days": 7}')
    assert d.replay_domains(spark, p) == {
        "app.retention": '{"days": 7}'
    }
    # the SAME commit declared the feature
    protocol, _m, _a, _t = d._replay(spark, p, None)
    assert "domainMetadata" in (protocol.get("writerFeatures") or [])
    # latest wins
    d.set_domain_metadata(spark, p, "app.retention", '{"days": 30}')
    d.set_domain_metadata(spark, p, "app.owner", "team-a")
    assert d.replay_domains(spark, p) == {
        "app.owner": "team-a",
        "app.retention": '{"days": 30}',
    }
    # tombstone removes; time travel still sees the old state
    d.set_domain_metadata(spark, p, "app.owner", "", removed=True)
    assert d.replay_domains(spark, p) == {
        "app.retention": '{"days": 30}'
    }
    assert d.replay_domains(spark, p, version=v1) == {
        "app.retention": '{"days": 7}'
    }


def test_system_domains_refuse(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    with pytest.raises(ValueError, match="system-controlled"):
        d.set_domain_metadata(spark, p, "delta.rowTracking", "{}")


def test_ordinary_writes_still_work_and_preserve_domains(spark, tmp_path):
    """domainMetadata is now a KNOWN writer feature: appends/DML on a
    table declaring it proceed and never clobber domains (the log is
    append-only)."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    d.set_domain_metadata(spark, p, "app.k", "v1")
    d.write_delta(spark.range(4, 6).coalesce(1).select(F.col("id")), p)
    d.delete_delta_where(spark, p, "id = 0")
    assert d.replay_domains(spark, p) == {"app.k": "v1"}
    assert d.read_delta(spark, p).count() == 5


def test_domains_survive_every_checkpoint_form(spark, tmp_path, monkeypatch):
    for form in ("classic", "v2", "multipart"):
        p = str(tmp_path / form)
        _mk(spark, p)
        if form == "v2":
            d.set_delta_properties(
                spark, p, {"delta.checkpointPolicy": "v2"}
            )
        d.set_domain_metadata(spark, p, "app.k", f"v-{form}")
        d.set_domain_metadata(spark, p, "app.gone", "x")
        d.set_domain_metadata(spark, p, "app.gone", "", removed=True)
        if form == "multipart":
            # force the distributed plane: prior checkpoint + tail
            d.create_checkpoint(spark, p)
            d.write_delta(
                spark.range(10, 12).coalesce(1).select(F.col("id")), p
            )
            monkeypatch.setattr(d, "_SPARK_PRUNE_THRESHOLD", 0)
        cv = d.create_checkpoint(spark, p)
        monkeypatch.setattr(d, "_SPARK_PRUNE_THRESHOLD", 10_000)
        # prune the JSON history below the checkpoint: the checkpoint
        # is now the only carrier of the domains
        for v in range(cv):
            f = os.path.join(p, "_delta_log", f"{v:020d}.json")
            if os.path.exists(f):
                os.remove(f)
        assert d.replay_domains(spark, p) == {"app.k": f"v-{form}"}, form
        assert d.read_delta(spark, p).count() >= 4, form


def test_domains_survive_vacuum(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    d.set_domain_metadata(spark, p, "app.k", "v1")
    for i in range(3):
        d.write_delta(
            spark.range(10 + i, 11 + i).coalesce(1).select(F.col("id")),
            p,
        )
    d.create_checkpoint(spark, p)
    d.vacuum_delta(spark, p, keep_versions=1)
    assert d.replay_domains(spark, p) == {"app.k": "v1"}


def test_foreign_checkpoint_domain_rows_read(spark, tmp_path):
    """A foreign checkpoint's domainMetadata rows (and tombstones)
    replay correctly: tombstoned domains stay gone."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    rows = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                         "writerFeatures": ["domainMetadata"]},
        },
        {
            "metaData": {
                "id": "x",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {
                                "name": "id",
                                "type": "long",
                                "nullable": True,
                                "metadata": {},
                            }
                        ],
                    }
                ),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 1,
            }
        },
        {
            "domainMetadata": {
                "domain": "app.live",
                "configuration": "yes",
                "removed": False,
            }
        },
    ]
    # reuse the real table's data file via its add action
    log0 = os.path.join(p, "_delta_log", f"{0:020d}.json")
    for a in (json.loads(x) for x in open(log0) if x.strip()):
        if "add" in a:
            rows.append({"add": a["add"]})
    spark.createDataFrame(rows, d._CKPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "ck"))
    src = next(
        f
        for f in os.listdir(str(tmp_path / "ck"))
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.replace(
        os.path.join(str(tmp_path / "ck"), src),
        os.path.join(p, "_delta_log", f"{0:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(p, "_delta_log", "_last_checkpoint"), "w") as fh:
        json.dump({"version": 0, "size": len(rows)}, fh)
    os.remove(log0)
    assert d.replay_domains(spark, p) == {"app.live": "yes"}
    assert d.read_delta(spark, p).count() == 4
