"""File-level zone-map index: per-file column min/max stats, used to
prune the FILE LIST before Spark ever plans the scan.

Parquet already prunes row groups from footer stats — but at 100 TB the
cost that kills you is upstream of that: a table of millions of files
means millions of footer reads just to plan. A zone-map manifest (one
tiny parquet of ``file, n_rows, min, max`` rows, built once per ingest)
lets the driver select the matching file subset with one small read and
hand Spark an explicit file list — planning cost proportional to the
MATCHING files, not the table. This is the core of what table formats
(Iceberg/Delta manifests) do; here it is expressed engine-side over
plain parquet directories.

The index build is itself distributed: one pass over the table grouped
by ``input_file_name()`` (map-side combinable min/max per file, shuffle
keyed on the file path — O(files) rows out).

Correctness contract (advisor round-5 finding): the index records
WHICH column it indexes and pruned_read validates it — pruning on a
different column than the one indexed would silently drop matching
files (wrong results, not over-selection). Staleness is likewise
handled for correctness, not performance: data files present on disk
but absent from the index (appended after the build) are read
UNPRUNED and unioned in, so the result still equals the full-scan
filter; only indexed files are ever skipped.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def index_path(table_path: str) -> str:
    return os.path.join(table_path, "_zone_index")


def _local_path(file_uri: str) -> str:
    """Normalize ``input_file_name()`` URIs (file:///...) and plain
    paths to one comparable canonical form. ``realpath``, not
    ``abspath``: if the table was indexed through a symlink (the
    versioned store's layout) and later pruned through the resolved
    path — or vice versa — abspath keys would never match, sending
    every file down BOTH the indexed and unindexed branches and
    silently duplicating rows (review finding)."""
    p = urlparse(file_uri)
    raw = unquote(p.path) if p.scheme else file_uri
    return os.path.realpath(raw)


def _data_files(table_path: str) -> list[str]:
    """Driver-side listing of the table's parquet data files —
    metastore-scale metadata (the same listing any manifest-less scan
    needs), skipping underscore/dot dirs and files (_zone_index,
    _SUCCESS, ...)."""
    out = []
    for root, dirs, files in os.walk(table_path, followlinks=True):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.realpath(os.path.join(root, f)))
    return out


def build_stats_index(
    spark: SparkSession, table_path: str, cols: str | list[str]
) -> DataFrame:
    """Build/refresh the per-file min/max index for one or MORE
    columns — all columns' stats come from ONE distributed pass over
    the data files (never the index dir), then land in one index
    subdirectory per column (``_zone_index/<col>/``): per-column
    storage keeps each column's min/max in its NATIVE type (a shared
    long-format table would force lossy type unification between, say,
    BIGINT and VARCHAR zones). The indexed column name additionally
    travels inside each subdir so a reader can never prune on stats
    for a different column. Returns the index frame for the first
    column (single-column callers see the old contract unchanged).
    """
    col_list = [cols] if isinstance(cols, str) else list(cols)
    df = spark.read.parquet(table_path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in col_list:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    wide = (
        df.select(F.input_file_name().alias("file"), *col_list)
        .groupBy("file")
        .agg(*aggs)
    )
    # one small O(files) frame per column — driver loops over columns,
    # never over files
    for c in col_list:
        (
            wide.select(
                "file",
                "n_rows",
                F.col(f"__min_{c}").alias("min_v"),
                F.col(f"__max_{c}").alias("max_v"),
                F.lit(c).alias("indexed_col"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(index_path(table_path), c))
        )
    return spark.read.parquet(
        os.path.join(index_path(table_path), col_list[0])
    )


def pruned_read(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Read only files whose [min, max] zone overlaps [lo, hi], then
    apply the exact predicate. Returns (frame, n_files_selected,
    n_files_total). The result equals the full-scan filter under ALL
    conditions: zone overlap can only over-select on indexed files,
    ``col`` is validated against the column the index was built on
    (ValueError on mismatch — stats for another column must never
    prune), and files on disk that the index doesn't know about
    (appended after the build) are included unpruned.

    The index read and the file listing are driver-side metadata scale
    (O(files) tiny rows); the file list goes back to Spark as an
    explicit multi-path load, so task planning touches only the
    selected files.
    """
    base = index_path(table_path)
    col_dir = os.path.join(base, col)
    if not os.path.isdir(col_dir):
        built = sorted(
            d
            for d in (os.listdir(base) if os.path.isdir(base) else [])
            if not d.startswith(("_", "."))
            and os.path.isdir(os.path.join(base, d))
        )
        if len(built) == 1:
            built_desc = f"column {built[0]!r}"
        else:
            built_desc = f"columns {built!r}"
        raise ValueError(
            f"zone index at {base!r} was built on {built_desc}, cannot "
            f"prune on {col!r} — rebuild with build_stats_index "
            "including it (stats for another column must never prune)"
        )
    idx = spark.read.parquet(col_dir).collect()
    if idx and idx[0]["indexed_col"] != col:
        raise ValueError(
            f"zone index subdir {col_dir!r} carries a stamp for "
            f"{idx[0]['indexed_col']!r} — index dir corrupted, rebuild"
        )
    on_disk = _data_files(table_path)
    # staleness guard, both directions: files ADDED after the build are
    # read unpruned; files DELETED after the build (compaction/vacuum)
    # drop out of the indexed set so the multi-path read never names a
    # missing path (advisor round-6 finding)
    indexed = {
        f: r
        for f, r in ((_local_path(r["file"]), r) for r in idx)
        if f in set(on_disk)
    }
    unindexed = [f for f in on_disk if f not in indexed]
    files = [
        f
        for f, r in indexed.items()
        if r["max_v"] is not None and r["max_v"] >= lo and r["min_v"] <= hi
    ] + unindexed
    total = len(on_disk)
    if not files:
        empty = spark.read.parquet(table_path).filter(F.lit(False))
        return empty, 0, total
    out = spark.read.parquet(*files).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
    return out, len(files), total


# --- Bloom file index: point-lookup pruning where zone maps can't ---


def bloom_index_path(table_path: str) -> str:
    return os.path.join(table_path, "_bloom_index")


def build_bloom_index(
    spark: SparkSession,
    table_path: str,
    col: str,
    n_bits: int = 1 << 16,
) -> DataFrame:
    """Per-file Bloom membership index for ``col`` — the pruning
    complement to the zone map: a high-cardinality key UNSORTED across
    files has every file's [min, max] spanning the whole domain, so
    the zone index prunes nothing, while a point lookup needs exactly
    the files whose SET of keys contains the probe.

    The filter is k=2 seeded-``xxhash64`` bit positions modulo
    ``n_bits``, stored as the per-file sorted set of SET positions
    (map-side-combinable ``collect_set`` union — one distributed pass,
    O(files) rows out, each bounded by min(2·distinct, n_bits)
    integers). A probe key matches a file only if BOTH its positions
    are present: false-positive rate ~ (2·n_distinct/n_bits)², false
    negatives impossible — the pruning contract. xxhash64 is
    TYPE-sensitive, so values are cast to BIGINT on build and probe
    both (the bloom_semi_join lesson).

    Positions-as-array trades the packed bitset's constant size for
    zero serialization code; size the index with ``n_bits`` ≈ 20× the
    expected per-file distinct count. At saturation the index stops
    pruning but never lies.
    """
    df = spark.read.parquet(table_path)
    c = F.col(col).cast("bigint")
    pos = F.array(
        F.pmod(F.xxhash64(F.lit(1), c), F.lit(n_bits)),
        F.pmod(F.xxhash64(F.lit(2), c), F.lit(n_bits)),
    )
    idx = (
        df.select(F.input_file_name().alias("file"), F.explode(pos).alias("p"))
        .groupBy("file")
        .agg(F.sort_array(F.collect_set("p")).alias("bits"))
        .withColumn("indexed_col", F.lit(col))
        .withColumn("n_bits", F.lit(n_bits))
    )
    idx.write.mode("overwrite").parquet(bloom_index_path(table_path))
    return spark.read.parquet(bloom_index_path(table_path))


def bloom_pruned_read(
    spark: SparkSession,
    table_path: str,
    col: str,
    value,
) -> tuple[DataFrame, int, int]:
    """Read only files whose Bloom filter might contain ``value``,
    then apply the exact equality predicate. Returns (frame,
    n_files_selected, n_files_total) with the same correctness
    contract as :func:`pruned_read`: ``col`` is validated against the
    stamp (ValueError on mismatch), unindexed files are read UNPRUNED
    and unioned in, and Bloom false positives only over-select — the
    exact filter on top makes the result equal the full-scan filter
    under all conditions.

    Membership evaluation runs IN SPARK over the index parquet (the
    per-file bit arrays never ship to the driver); only the matching
    file names — O(selected) strings — come back to plan the scan.
    """
    idxdf = spark.read.parquet(bloom_index_path(table_path))
    head = idxdf.select("indexed_col", "n_bits").first()
    if head is not None and head["indexed_col"] != col:
        raise ValueError(
            f"bloom index at {bloom_index_path(table_path)!r} was built "
            f"on column {head['indexed_col']!r}, cannot prune on "
            f"{col!r} — rebuild with build_bloom_index(col)"
        )
    v = F.lit(value).cast("bigint")
    hit_rows = (
        idxdf.filter(
            F.array_contains(
                "bits", F.pmod(F.xxhash64(F.lit(1), v), F.col("n_bits"))
            )
            & F.array_contains(
                "bits", F.pmod(F.xxhash64(F.lit(2), v), F.col("n_bits"))
            )
        )
        .select("file")
        .collect()
    )
    on_disk = _data_files(table_path)
    disk_set = set(on_disk)
    # staleness guard, both directions (see pruned_read): added files
    # read unpruned, deleted files drop out of the indexed set
    indexed = {
        _local_path(r["file"]) for r in idxdf.select("file").collect()
    } & disk_set
    hits = [
        f for f in (_local_path(r["file"]) for r in hit_rows)
        if f in disk_set
    ]
    unindexed = [f for f in on_disk if f not in indexed]
    files = hits + unindexed
    total = len(on_disk)
    if not files:
        empty = spark.read.parquet(table_path).filter(F.lit(False))
        return empty, 0, total
    out = spark.read.parquet(*files).filter(F.col(col) == value)
    return out, len(files), total
