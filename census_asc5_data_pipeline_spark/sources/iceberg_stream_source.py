"""Iceberg table as a REAL Structured Streaming source — the
``delta_stream_source`` discipline (Spark 4 Python Data Source API)
generalized to the Iceberg snapshot log (round-7 verdict elective #3):
``spark.readStream.format("iceberg_tail").option("path", ...)`` tails
the table snapshot-by-snapshot, with Spark's own offset checkpointing
providing the exactly-once replay contract.

How it maps to the streaming engine:

- OFFSET = the last processed snapshot id (``{"snapshot_id": N}``) —
  the cursor :func:`iceberg_io.read_iceberg_changes` keeps, stored in
  Spark's offset log so restarts resume exactly. This engine's writer
  issues DENSE integer snapshot ids, so a hole in the range means the
  snapshot was expired → raise rather than silently skip (the
  ``read_delta_changes`` vacuumed-range contract).
- ``partitions(start, end)`` walks the manifest LISTS driver-side
  (metadata scale) via :func:`iceberg_io._changed_files_of_range`: a
  snapshot's changes are the status=1 (ADDED) entries of exactly the
  manifests whose ``added_snapshot_id`` is that snapshot — re-listed
  prior manifests and ``rewrite_data_files``'s status=0 rearrangement
  entries are skipped, so a compaction emits nothing (Delta's
  ``dataChange=false`` semantics). One input partition per changed
  file.
- ``read(partition)`` opens the parquet with pyarrow IN THE EXECUTOR
  and yields Arrow record batches (zero-copy lane). Iceberg data
  files carry ALL columns (identity partition sources included, per
  spec), so unlike ``delta_tail`` there is no partition-value
  re-attachment — only the ``_change_type`` / ``_snapshot_id`` tags
  are appended.

DELETES stream as retraction batches tagged ``_change_type='delete'``
(round-9 verdict #5 — the streaming twin of the batch change feed's
contract, so a CDC consumer can tail a table that
:func:`iceberg_io.delete_iceberg_where` /
:func:`iceberg_io.delete_iceberg_positions` writes to):

- POSITION delete files (content=1): the deleted rows' FULL images —
  the executor opens each referenced data file and ``take``s the
  listed row indices (O(referenced files + positions), never a table
  scan; the driver reads only the delete file's distinct file_path
  column to resolve basenames, same funnel as the batch feed);
- EQUALITY delete files (content=2): key-only retraction rows — the
  equality columns carry the deleted keys, every other column is
  NULL (the delete file stores keys, not row images; same contract
  as the batch feed and Iceberg's own changelog procedure).

Gates: an expired snapshot inside the requested range raises.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _FilePart(InputPartition):
    """One ADDED data file: emit its rows as inserts."""

    def __init__(self, path, snapshot_id, names):
        self.path = path
        self.snapshot_id = snapshot_id
        self.names = names


class _PosDeletePart(InputPartition):
    """One position-delete file: emit the deleted rows' full images.
    ``ref_map`` resolves the delete file's basename references to the
    data files live at the delete snapshot (only referenced entries
    ride along, resolved driver-side)."""

    def __init__(self, path, snapshot_id, names, ref_map):
        self.path = path
        self.snapshot_id = snapshot_id
        self.names = names
        self.ref_map = ref_map


class _DvDeletePart(InputPartition):
    """One snapshot's v3 DELETION-VECTOR retractions (late r16): the
    blob DIFF vs the parent snapshot's DV state is decoded in
    ``partitions()`` (a replacement blob is old ∪ new — only the diff
    is this snapshot's deletions), so the part carries the resolved
    {data file path: [positions]} map directly — O(deleted rows)
    pickled, the same trade as the DV writer."""

    def __init__(self, snapshot_id, names, pos_map):
        self.snapshot_id = snapshot_id
        self.names = names
        self.pos_map = pos_map


class _EqDeletePart(InputPartition):
    """One equality-delete file: emit key-only retraction rows.
    ``arrow_schema`` (picklable) supplies the types for the NULL
    non-key columns."""

    def __init__(self, path, snapshot_id, names, key_names, arrow_schema):
        self.path = path
        self.snapshot_id = snapshot_id
        self.names = names
        self.key_names = key_names
        self.arrow_schema = arrow_schema


from census_asc5_data_pipeline_spark.sources.delta_stream_source import (
    _RateLimitMixin,
)


class IcebergTailStreamReader(_RateLimitMixin, DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg_tail requires .option('path', ...)")
        sv = options.get("startingsnapshotid")
        st = options.get("startingtimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "pass startingsnapshotid OR startingtimestamp, not both"
            )
        if st is not None:
            from census_asc5_data_pipeline_spark.sources import (
                delta_stream_source as _dss,
                iceberg_io,
            )

            ts_ms = _dss._parse_ts_ms(st)
            # snapshots stamped AT or AFTER the timestamp are emitted
            before = [
                s["snapshot-id"]
                for s in iceberg_io.iceberg_snapshots(self.path)
                if int(s.get("timestamp-ms", 0)) < ts_ms
            ]
            self.starting = max(before, default=0)
        else:
            self.starting = int(sv) if sv is not None else 0
        self._rl_init(options)
        from pyspark.sql.pandas.types import to_arrow_schema

        from census_asc5_data_pipeline_spark.sources import iceberg_io

        _v, meta = iceberg_io._current_metadata(self.path)
        schema, _fields = iceberg_io._schema_of(meta)
        self.names = [f.name for f in schema.fields]
        self.arrow_schema = to_arrow_schema(schema)

    def initialOffset(self):
        self._rl_advance(self.starting)
        return {"snapshot_id": self.starting}

    def _count_files(self, sid):
        import os

        from census_asc5_data_pipeline_spark.sources import iceberg_io

        _v, meta = iceberg_io._current_metadata(self.path)
        snap = next(
            (
                s
                for s in meta.get("snapshots", [])
                if s["snapshot-id"] == sid
            ),
            None,
        )
        if snap is None:
            return 0, 0
        ins, pos_d, eq_d, dv_d = iceberg_io._changed_files_of_range(
            self.path, [snap]
        )
        paths = (
            [p for p, _s in ins]
            + [p for p, _s in pos_d]
            + [p for p, _s, _ids in eq_d]
            + [iceberg_io._local(e["file_path"]) for e, _s in dv_d]
        )
        nbytes = sum(
            os.path.getsize(p) for p in paths if os.path.exists(p)
        )
        return len(paths), nbytes

    def latestOffset(self):
        from census_asc5_data_pipeline_spark.sources import iceberg_io

        # cap at the MAIN head (r13): unpublished WAP-branch snapshots
        # must not leak into a main-tailing stream — a fast_forward
        # publish moves the head past them, so they replay in id
        # order exactly at publish time
        _v, meta = iceberg_io._current_metadata(self.path)
        head = meta.get("current-snapshot-id")
        head = int(head) if head not in (None, -1) else self.starting
        sids = [
            s["snapshot-id"]
            for s in meta.get("snapshots", [])
            if s["snapshot-id"] <= head
        ]
        return {"snapshot_id": self._rl_cap(sids, max(head, self.starting))}

    def partitions(self, start, end):
        import os

        import pyarrow.parquet as pq

        from census_asc5_data_pipeline_spark.sources import iceberg_io

        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        hi = self._rl_range_check(lo, hi)
        _v, meta = iceberg_io._current_metadata(self.path)
        by_id = {
            s["snapshot-id"]: s for s in meta.get("snapshots", [])
        }
        missing = [
            sid for sid in range(lo + 1, hi + 1) if sid not in by_id
        ]
        if missing:
            raise FileNotFoundError(
                f"snapshot(s) {missing} expired from the log — the "
                "stream cannot attribute that range"
            )
        want = [by_id[sid] for sid in range(lo + 1, hi + 1)]
        inserts, pos_dels, eq_dels, dv_dels = (
            iceberg_io._changed_files_of_range(self.path, want)
        )
        _schema, fields = iceberg_io._schema_of(meta)
        name_of_id = {f["id"]: f["name"] for f in fields}
        parts: list[InputPartition] = []
        for p_, sid in inserts:
            parts.append(_FilePart(p_, sid, self.names))
        for p_, sid in pos_dels:
            # resolve the delete file's referenced data files against
            # the files live AT the delete snapshot (metadata scale:
            # only the file_path column is read driver-side)
            data_at, _dels = iceberg_io._snapshot_files(
                self.path, meta, sid
            )
            abs_data: dict[str, str] = {}
            for d in data_at:
                ap = iceberg_io._local(d["file_path"])
                base = os.path.basename(ap)
                if base in abs_data and abs_data[base] != ap:
                    raise ValueError(
                        f"duplicate data-file basename {base!r} at "
                        f"snapshot {sid} — cannot attribute deleted-row "
                        "images safely"
                    )
                abs_data[base] = ap
            refs = {
                os.path.basename(fp)
                for fp in pq.read_table(p_, columns=["file_path"])
                .column("file_path")
                .to_pylist()
            }
            bad = sorted(b for b in refs if b not in abs_data)
            if bad:
                raise ValueError(
                    f"position delete references data file(s) {bad} "
                    "not live at the delete snapshot"
                )
            parts.append(
                _PosDeletePart(
                    p_,
                    sid,
                    self.names,
                    {b: abs_data[b] for b in sorted(refs)},
                )
            )
        dv_by_sid: dict[int, list[dict]] = {}
        for e, sid in dv_dels:
            dv_by_sid.setdefault(sid, []).append(e)
        for sid in sorted(dv_by_sid):
            from census_asc5_data_pipeline_spark.sources.deletion_vectors import (
                read_iceberg_dv,
            )

            def _dv_pos(entry):
                return set(
                    read_iceberg_dv(
                        iceberg_io._local(entry["file_path"]),
                        int(entry["content_offset"]),
                        int(entry["content_size_in_bytes"]),
                    )
                )

            snap = by_id[sid]
            parent = snap.get("parent-snapshot-id")
            if parent is None:
                older = [s for s in by_id if s < sid]
                parent = max(older) if older else None
            prior_by_base: dict[str, dict] = {}
            if parent is not None:
                _pd, prior_dels = iceberg_io._snapshot_files(
                    self.path, meta, int(parent)
                )
                for d in prior_dels:
                    if iceberg_io._is_dv_entry(d):
                        prior_by_base[
                            os.path.basename(
                                iceberg_io._local(
                                    d["referenced_data_file"]
                                )
                            )
                        ] = d
            data_at, _dels2 = iceberg_io._snapshot_files(
                self.path, meta, sid
            )
            abs_data2: dict[str, str] = {}
            for d in data_at:
                ap = iceberg_io._local(d["file_path"])
                base = os.path.basename(ap)
                if base in abs_data2 and abs_data2[base] != ap:
                    raise ValueError(
                        f"duplicate data-file basename {base!r} at "
                        f"snapshot {sid} — cannot attribute deleted-"
                        "row images safely"
                    )
                abs_data2[base] = ap
            pos_map: dict[str, list[int]] = {}
            for e in dv_by_sid[sid]:
                base = os.path.basename(
                    iceberg_io._local(e["referenced_data_file"])
                )
                if base not in abs_data2:
                    raise ValueError(
                        f"deletion vector references data file "
                        f"{base!r} not live at the delete snapshot"
                    )
                fresh = _dv_pos(e)
                prior = prior_by_base.get(base)
                if prior is not None:
                    fresh -= _dv_pos(prior)
                if fresh:
                    pos_map[abs_data2[base]] = sorted(fresh)
            if pos_map:
                parts.append(_DvDeletePart(sid, self.names, pos_map))
        for p_, sid, ids in eq_dels:
            key_names = []
            for fid in ids:
                nm = name_of_id.get(fid)
                if nm is None:
                    raise NotImplementedError(
                        f"equality delete references field id {fid} "
                        "not in the current schema"
                    )
                key_names.append(nm)
            parts.append(
                _EqDeletePart(
                    p_, sid, self.names, key_names, self.arrow_schema
                )
            )
        # the engine requires >= 1 partition per batch; a fence-only
        # or rewrite-only range yields one no-op partition
        if not parts:
            parts.append(_FilePart(None, hi, self.names))
        return parts

    def read(self, partition):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        def _tag(batch, names, change_type, sid):
            n = batch.num_rows
            idx = {nm: i for i, nm in enumerate(batch.schema.names)}
            arrays = [batch.columns[idx[nm]] for nm in names]
            arrays.append(pa.array([change_type] * n, pa.string()))
            arrays.append(pa.array([sid] * n, pa.int64()))
            return pa.RecordBatch.from_arrays(
                arrays, list(names) + ["_change_type", "_snapshot_id"]
            )

        if isinstance(partition, _PosDeletePart):
            dt = pq.read_table(partition.path)
            by_base: dict[str, list[int]] = {}
            for fp, pos in zip(
                dt.column("file_path").to_pylist(),
                dt.column("pos").to_pylist(),
            ):
                by_base.setdefault(os.path.basename(fp), []).append(
                    int(pos)
                )
            for base in sorted(by_base):
                data = pq.read_table(partition.ref_map[base])
                taken = data.take(sorted(by_base[base]))
                for batch in taken.to_batches():
                    if batch.num_rows:
                        yield _tag(
                            batch,
                            partition.names,
                            "delete",
                            partition.snapshot_id,
                        )
            return
        if isinstance(partition, _DvDeletePart):
            for dpath in sorted(partition.pos_map):
                data = pq.read_table(dpath)
                taken = data.take(partition.pos_map[dpath])
                for batch in taken.to_batches():
                    if batch.num_rows:
                        yield _tag(
                            batch,
                            partition.names,
                            "delete",
                            partition.snapshot_id,
                        )
            return
        if isinstance(partition, _EqDeletePart):
            keys = pq.read_table(
                partition.path, columns=list(partition.key_names)
            )
            aschema = partition.arrow_schema
            for batch in keys.to_batches():
                n = batch.num_rows
                if not n:
                    continue
                idx = {nm: i for i, nm in enumerate(batch.schema.names)}
                arrays = []
                for nm in partition.names:
                    t = aschema.field(nm).type
                    if nm in idx:
                        arrays.append(batch.columns[idx[nm]].cast(t))
                    else:
                        arrays.append(pa.nulls(n, t))
                arrays.append(pa.array(["delete"] * n, pa.string()))
                arrays.append(
                    pa.array([partition.snapshot_id] * n, pa.int64())
                )
                yield pa.RecordBatch.from_arrays(
                    arrays,
                    list(partition.names)
                    + ["_change_type", "_snapshot_id"],
                )
            return
        if partition.path is None:
            return
        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches():
            yield _tag(
                batch, partition.names, "insert", partition.snapshot_id
            )

    def commit(self, end):
        self._rl_advance(int(end["snapshot_id"]))


class IcebergTailDataSource(DataSource):
    @classmethod
    def name(cls):
        return "iceberg_tail"

    def schema(self):
        from pyspark.sql import types as T

        from census_asc5_data_pipeline_spark.sources import iceberg_io

        _v, meta = iceberg_io._current_metadata(self.options.get("path"))
        schema, _fields = iceberg_io._schema_of(meta)
        return T.StructType(
            schema.fields
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_snapshot_id", T.LongType()),
            ]
        )

    def streamReader(self, schema):
        return IcebergTailStreamReader(self.options)


def register(spark) -> None:
    # once per session (r17): see delta_stream_source.register
    if getattr(spark, "_graft_iceberg_stream_source", False):
        return
    spark.dataSource.register(IcebergTailDataSource)
    spark._graft_iceberg_stream_source = True
