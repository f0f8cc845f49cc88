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
  (metadata scale): a snapshot's inserts are the status=1 (ADDED)
  entries of exactly the manifests whose ``added_snapshot_id`` is that
  snapshot — re-listed prior manifests and ``rewrite_data_files``'s
  status=0 rearrangement entries are skipped, so a compaction emits
  nothing (Delta's ``dataChange=false`` semantics). One input
  partition per added file.
- ``read(partition)`` opens the parquet with pyarrow IN THE EXECUTOR
  and yields Arrow record batches (zero-copy lane). Iceberg data
  files carry ALL columns (identity partition sources included, per
  spec), so unlike ``delta_tail`` there is no partition-value
  re-attachment at all — only the ``_snapshot_id`` tag is appended.

Gates: inserts only; delete manifests (v2 merge-on-read) raise; an
expired snapshot inside the requested range raises.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _FilePart(InputPartition):
    def __init__(self, path, snapshot_id, names):
        self.path = path
        self.snapshot_id = snapshot_id
        self.names = names


class IcebergTailStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg_tail requires .option('path', ...)")
        self.starting = int(options.get("startingsnapshotid", 0))
        from census_asc5_data_pipeline_spark.sources import iceberg_io

        _v, meta = iceberg_io._current_metadata(self.path)
        schema, _fields = iceberg_io._schema_of(meta)
        self.names = [f.name for f in schema.fields]

    def initialOffset(self):
        return {"snapshot_id": self.starting}

    def latestOffset(self):
        from census_asc5_data_pipeline_spark.sources import iceberg_io

        snaps = iceberg_io.iceberg_snapshots(self.path)
        last = max((s["snapshot-id"] for s in snaps), default=self.starting)
        return {"snapshot_id": max(last, self.starting)}

    def partitions(self, start, end):
        from census_asc5_data_pipeline_spark.sources import iceberg_io

        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
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
        parts = []
        for sid in range(lo + 1, hi + 1):
            snap = by_id[sid]
            _sch, manifests = iceberg_io.read_container_generic(
                iceberg_io._local(snap["manifest-list"])
            )
            for m in manifests:
                if int(m.get("content", 0)) == 1:
                    raise NotImplementedError(
                        "delete manifest in the stream range; "
                        "merge-on-read is out of scope"
                    )
                if int(m.get("added_snapshot_id", sid)) != sid:
                    continue  # re-listed prior manifest
                _s2, entries = iceberg_io.read_container_generic(
                    iceberg_io._local(m["manifest_path"])
                )
                for e in entries:
                    if int(e.get("status", 1)) != 1:
                        continue  # EXISTING (rewrite) / DELETED
                    parts.append(
                        _FilePart(
                            iceberg_io._local(
                                e["data_file"]["file_path"]
                            ),
                            sid,
                            self.names,
                        )
                    )
        # the engine requires >= 1 partition per batch; a fence-only
        # or rewrite-only range yields one no-op partition
        if not parts:
            parts.append(_FilePart(None, hi, self.names))
        return parts

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition.path is None:
            return
        pf = pq.ParquetFile(partition.path)
        order = list(partition.names) + ["_snapshot_id"]
        for batch in pf.iter_batches():
            n = batch.num_rows
            idx = {nm: i for i, nm in enumerate(batch.schema.names)}
            arrays = [batch.columns[idx[nm]] for nm in partition.names]
            arrays.append(pa.array([partition.snapshot_id] * n, pa.int64()))
            yield pa.RecordBatch.from_arrays(arrays, order)

    def commit(self, end):
        pass


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
            schema.fields + [T.StructField("_snapshot_id", T.LongType())]
        )

    def streamReader(self, schema):
        return IcebergTailStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(IcebergTailDataSource)
