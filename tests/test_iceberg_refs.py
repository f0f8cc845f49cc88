"""Iceberg snapshot refs — branches/tags (round-12 verdict #3,
table-spec §refs): read by ref name, tag_snapshot/create_branch/
drop_ref commits, and expire_snapshots honoring per-ref retention
(min-snapshots-to-keep / max-snapshot-age-ms / max-ref-age-ms)."""

from __future__ import annotations

import json
import os

import pytest


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _snap_ids(path):
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        iceberg_snapshots,
    )

    return [s["snapshot-id"] for s in iceberg_snapshots(path)]


def test_read_by_ref_foreign_refs_block(spark, tmp_path):
    """A FOREIGN refs block (hand-edited into the metadata JSON, the
    shape Iceberg's RefsTable documents) resolves: tag → its
    snapshot, branch → its head, main → the current snapshot even
    when a stale refs.main entry disagrees; unknown refs raise."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _current_metadata,
        _meta_dir,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, "a")], "id bigint, s string"), path)
    write_iceberg(_mk(spark, [(2, "b")], "id bigint, s string"), path)
    write_iceberg(_mk(spark, [(3, "c")], "id bigint, s string"), path)
    s1, s2, s3 = _snap_ids(path)
    cur_v, meta = _current_metadata(path)
    meta["refs"] = {
        "v1.0": {"snapshot-id": s1, "type": "tag"},
        "audit": {
            "snapshot-id": s2,
            "type": "branch",
            "min-snapshots-to-keep": 2,
        },
        # stale foreign main entry — must NOT win over the hint head
        "main": {"snapshot-id": s1, "type": "branch"},
    }
    mf = os.path.join(_meta_dir(path), f"v{cur_v}.metadata.json")
    with open(mf, "w") as fh:
        json.dump(meta, fh)

    assert [r.id for r in read_iceberg(spark, path, ref="v1.0").collect()] == [1]
    assert sorted(
        r.id for r in read_iceberg(spark, path, ref="audit").collect()
    ) == [1, 2]
    assert sorted(
        r.id for r in read_iceberg(spark, path, ref="main").collect()
    ) == [1, 2, 3]
    with pytest.raises(ValueError, match="unknown ref"):
        read_iceberg(spark, path, ref="nope")
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, path, ref="v1.0", snapshot_id=s1)


def test_tag_expire_tag_still_readable(spark, tmp_path):
    """The verdict's round-trip: tag a snapshot, expire down to 1
    retained snapshot — the TAGGED snapshot survives beyond the
    keep-N window and stays byte-readable; untagged history is gone;
    dropping the tag then expiring reclaims it."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        drop_ref,
        expire_snapshots,
        iceberg_refs,
        read_iceberg,
        tag_snapshot,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, "a")], "id bigint, s string"), path)
    write_iceberg(_mk(spark, [(2, "b")], "id bigint, s string"), path)
    write_iceberg(_mk(spark, [(3, "c")], "id bigint, s string"), path)
    s1, s2, s3 = _snap_ids(path)
    tag_snapshot(path, "v1.0", snapshot_id=s1)
    assert iceberg_refs(path)["v1.0"] == {"snapshot-id": s1, "type": "tag"}

    out = expire_snapshots(path, keep_snapshots=1)
    # tag + head retained; the untagged middle snapshot expired
    assert sorted(out["retained_snapshot_ids"]) == sorted([s1, s3])
    assert [
        r.id for r in read_iceberg(spark, path, ref="v1.0").collect()
    ] == [1]
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == [
        1, 2, 3,
    ]
    with pytest.raises(ValueError):
        read_iceberg(spark, path, snapshot_id=s2)  # really gone

    drop_ref(path, "v1.0")
    assert "v1.0" not in iceberg_refs(path)
    out = expire_snapshots(path, keep_snapshots=1)
    assert out["retained_snapshot_ids"] == [s3]


def test_branch_retention_and_ref_age_expiry(spark, tmp_path):
    """Branch min-snapshots-to-keep retains history behind the
    branch head; a ref older than its max-ref-age-ms expires WITH its
    snapshot on the next expire_snapshots, and the surviving refs are
    carried into the new metadata."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        create_branch,
        expire_snapshots,
        iceberg_refs,
        read_iceberg,
        tag_snapshot,
        write_iceberg,
    )

    path = str(tmp_path / "t")
    for i in range(1, 5):  # snapshots s1..s4
        write_iceberg(
            _mk(spark, [(i, f"r{i}")], "id bigint, s string"), path
        )
    s1, s2, s3, s4 = _snap_ids(path)
    # branch at s3 keeping 2 history snapshots (s2, s3)
    create_branch(path, "dev", snapshot_id=s3, min_snapshots_to_keep=2)
    # tag at s1 already older than a 0ms ref age: expires immediately
    tag_snapshot(path, "stale", snapshot_id=s1, max_ref_age_ms=0)

    out = expire_snapshots(path, keep_snapshots=1)
    assert sorted(out["retained_snapshot_ids"]) == sorted([s2, s3, s4])
    refs = iceberg_refs(path)
    assert "dev" in refs and "stale" not in refs
    assert sorted(
        r.id for r in read_iceberg(spark, path, ref="dev").collect()
    ) == [1, 2, 3]
    with pytest.raises(ValueError):
        read_iceberg(spark, path, snapshot_id=s1)

    # ref bookkeeping guards: unknown snapshot / unknown drop raise
    with pytest.raises(ValueError, match="not in table"):
        tag_snapshot(path, "bad", snapshot_id=123456789)
    from census_asc5_data_pipeline_spark.sources.iceberg_io import drop_ref

    with pytest.raises(ValueError, match="unknown ref"):
        drop_ref(path, "nope")


def test_required_field_enforced_on_write(spark, tmp_path):
    """Iceberg's one row constraint (table spec §Schemas): a FOREIGN
    table declaring required=true fields rejects null-bearing appends
    and MERGE images BEFORE any snapshot commits; clean writes pass
    (the delta_io constraint-enforcement twin, r12)."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _current_metadata,
        _meta_dir,
        iceberg_snapshots,
        read_iceberg,
        write_iceberg,
    )
    from census_asc5_data_pipeline_spark.sources.merge import merge_into

    path = str(tmp_path / "t")
    write_iceberg(_mk(spark, [(1, "a")], "id bigint, s string"), path)
    # foreign shape: hand-mark s as required in the current metadata
    cur_v, meta = _current_metadata(path)
    for sch in meta.get("schemas") or [meta.get("schema")]:
        for f in sch["fields"]:
            if f["name"] == "s":
                f["required"] = True
    with open(
        os.path.join(_meta_dir(path), f"v{cur_v}.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)

    import pytest as _pt

    with _pt.raises(ValueError, match="required"):
        write_iceberg(_mk(spark, [(2, None)], "id bigint, s string"), path)
    src = _mk(spark, [(1, None)], "id bigint, s string")
    with _pt.raises(ValueError, match="required"):
        merge_into(
            spark, "iceberg", path, src, on="t.id = s.id",
            matched=[("update", None, {"s": "s.s"})],
        )
    n_before = len(iceberg_snapshots(path))
    assert write_iceberg(
        _mk(spark, [(2, "b")], "id bigint, s string"), path
    ) is not None
    assert len(iceberg_snapshots(path)) == n_before + 1
    assert sorted(
        (r.id, r.s) for r in read_iceberg(spark, path).collect()
    ) == [(1, "a"), (2, "b")]
