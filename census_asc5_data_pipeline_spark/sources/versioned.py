"""Versioned parquet snapshots with an atomic pointer commit.

Round-4 advice + verdict item 6: the two-rename swap
(``os.rename(snapshot, old); os.rename(tmp, snapshot)``) used by the
CDC merge sink and ``compact_parquet`` had a crash window where NO
dataset existed at the published path, and a leftover ``__merge_old``
dir from a half-finished swap wedged the next batch. This module
replaces it with the manifest-pointer discipline every table format
(Iceberg/Delta/Hudi) uses, scaled down to plain parquet:

- Each snapshot version is an immutable directory
  ``<table>__versions/v_0000NN`` (Spark's ``_SUCCESS`` marks it
  complete; versions are written ONCE and never mutated).
- The COMMIT POINT is ``<table>__versions/_current`` — a one-line
  pointer file updated via write-temp + ``os.replace`` (atomic on
  POSIX). A reader that resolves the pointer then reads the version
  directory can never observe a mid-swap state: it either sees the
  old pointer (old version, fully present) or the new one (new
  version, fully written BEFORE the pointer moved).
- ``<table>`` itself is maintained as a symlink to the current
  version dir, flipped atomically (symlink + ``os.replace``) AFTER the
  pointer commit — so legacy ``spark.read.parquet(table)`` readers
  keep working unchanged. On an object store (no symlinks, no atomic
  rename) the pointer file is the only commit primitive you'd keep;
  the symlink is a local-filesystem convenience view.
- ``recover()`` is called at every commit/read entry: a crash between
  pointer commit and symlink flip (or a missing symlink entirely) is
  healed by re-pointing the symlink at the pointer's target. Once a
  pointer exists, orphan version dirs (crash before a later commit's
  pointer move) are invisible to readers and pruned by the next
  commit. The one exception is a table with NO pointer at all: a
  complete orphan there is redo-adopted as current (first-commit
  crash after a full write — surfacing a complete-but-unacknowledged
  write is at-least-once redo, never a torn read).
- ``keep`` old versions are retained so an in-flight reader that
  resolved the pointer just before a commit still finds its version
  directory (time-travel for free); older versions are pruned.

Crash-safety is pinned by tests/test_versioned.py's crash-injection
cases (kill between every pair of steps; readers always see a
complete snapshot).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "commit_version",
    "read_current",
    "read_version",
    "read_as_of",
    "version_as_of_timestamp",
    "register_versioned_views",
    "recover",
    "current_version_dir",
    "list_versions",
]


def _versions_root(table: str) -> str:
    return table.rstrip("/") + "__versions"


def _pointer_path(table: str) -> str:
    return os.path.join(_versions_root(table), "_current")


def _version_dir(table: str, n: int) -> str:
    return os.path.join(_versions_root(table), f"v_{n:06d}")


def _is_complete(vdir: str) -> bool:
    return os.path.isdir(vdir) and os.path.exists(os.path.join(vdir, "_SUCCESS"))


def list_versions(table: str) -> list[int]:
    root = _versions_root(table)
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v_") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def _read_pointer(table: str) -> int | None:
    try:
        with open(_pointer_path(table)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _write_pointer(table: str, n: int) -> None:
    """THE commit point: write-temp + atomic replace."""
    ptr = _pointer_path(table)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"{n}\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, ptr)


def _flip_symlink(table: str, target: str) -> None:
    """Atomically (re)point the legacy path at the current version."""
    tmp = table.rstrip("/") + ".__link_tmp"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(target, tmp)
    os.replace(tmp, table.rstrip("/"))


def _adopt_legacy_dir(table: str) -> None:
    """A plain parquet directory at ``table`` (pre-versioning layout:
    a seed snapshot the caller wrote directly, or a legacy writer that
    clobbered the symlink with a real directory later on) is adopted
    as the NEXT free version — not hardcoded v0, which would collide
    with existing versions and wedge the table on ENOTEMPTY
    (code-review r5 finding). The one-time adoption gap (between
    moving the dir and re-creating the symlink) is healed by
    ``recover``; steady-state commits never reopen it."""
    table = table.rstrip("/")
    if os.path.islink(table) or not os.path.isdir(table):
        return
    root = _versions_root(table)
    os.makedirs(root, exist_ok=True)
    versions = list_versions(table)
    nxt = (versions[-1] + 1) if versions else 0
    vdir = _version_dir(table, nxt)
    os.rename(table, vdir)
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        # seed dirs written by non-Spark tools may lack the marker
        open(os.path.join(vdir, "_SUCCESS"), "w").close()
    _write_pointer(table, nxt)
    _flip_symlink(table, vdir)


def recover(table: str) -> None:
    """Heal any half-finished commit. Idempotent; call before reads
    and at sink start (round-4 advice)."""
    table = table.rstrip("/")
    _adopt_legacy_dir(table)
    cur = _read_pointer(table)
    if cur is None:
        # No pointer: nothing committed yet. If complete versions
        # exist (pointer file lost), re-commit the newest complete one.
        complete = [n for n in list_versions(table) if _is_complete(_version_dir(table, n))]
        if not complete:
            return
        cur = complete[-1]
        _write_pointer(table, cur)
    vdir = _version_dir(table, cur)
    # Re-point the symlink if it is missing or stale (crash between
    # pointer commit and symlink flip).
    if os.path.realpath(table) != os.path.realpath(vdir):
        _flip_symlink(table, vdir)


def current_version_dir(table: str) -> str:
    recover(table)
    cur = _read_pointer(table)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {table}")
    return _version_dir(table, cur)


def read_current(spark: SparkSession, table: str) -> DataFrame:
    """Pointer-resolved read: immune to concurrent commits (the
    resolved version dir is immutable and retained for ``keep``
    generations)."""
    return spark.read.parquet(current_version_dir(table))


def read_version(spark: SparkSession, table: str, n: int) -> DataFrame:
    """Time travel: read a specific retained version (the last ``keep``
    generations survive pruning). Raises FileNotFoundError for a
    pruned/never-written version."""
    vdir = _version_dir(table, n)
    if not _is_complete(vdir):
        raise FileNotFoundError(
            f"version {n} of {table} is not present (pruned or incomplete); "
            f"retained: {[v for v in list_versions(table) if _is_complete(_version_dir(table, v))]}"
        )
    return spark.read.parquet(vdir)


def _prune(table: str, keep: int) -> None:
    cur = _read_pointer(table)
    versions = list_versions(table)
    protected = set(versions[-keep:]) if keep > 0 else set()
    if cur is not None:
        protected.add(cur)
    for n in versions:
        if n not in protected:
            shutil.rmtree(_version_dir(table, n), ignore_errors=True)


def commit_version(
    df: DataFrame, table: str, keep: int = 3, commit_ts_ms: int | None = None
) -> str:
    """Write ``df`` as the next immutable version and atomically move
    the pointer to it. Returns the new version directory.

    A ``_commit_meta.json`` (epoch-millis commit timestamp) is stamped
    into the version dir BEFORE the pointer moves, so timestamp
    time-travel (``read_as_of``/``version_as_of_timestamp``) resolves
    from durable metadata, not file mtimes. ``commit_ts_ms`` exists
    for deterministic tests; production callers omit it."""
    import json
    import time

    table = table.rstrip("/")
    recover(table)
    versions = list_versions(table)
    nxt = (versions[-1] + 1) if versions else 0
    vdir = _version_dir(table, nxt)
    os.makedirs(_versions_root(table), exist_ok=True)
    df.write.mode("overwrite").parquet(vdir)
    ts = commit_ts_ms if commit_ts_ms is not None else int(time.time() * 1000)
    with open(os.path.join(vdir, "_commit_meta.json"), "w") as fh:
        json.dump({"version": nxt, "committed_at_ms": ts}, fh)
    _write_pointer(table, nxt)  # <- commit point
    _flip_symlink(table, vdir)
    _prune(table, keep)
    return vdir


def _commit_ts_ms(table: str, n: int) -> int:
    """Commit timestamp of a retained version; falls back to the
    _SUCCESS mtime for versions committed before the meta stamp."""
    import json

    vdir = _version_dir(table, n)
    meta = os.path.join(vdir, "_commit_meta.json")
    if os.path.exists(meta):
        return int(json.load(open(meta))["committed_at_ms"])
    return int(os.path.getmtime(os.path.join(vdir, "_SUCCESS")) * 1000)


def version_as_of_timestamp(table: str, ts_ms: int) -> int:
    """Newest retained version committed at-or-before ``ts_ms`` — the
    `TIMESTAMP AS OF` resolution rule every table format uses. Raises
    if every retained version is newer (the history before that point
    has been pruned or never existed)."""
    table = table.rstrip("/")
    candidates = [
        n
        for n in list_versions(table)
        if _is_complete(_version_dir(table, n)) and _commit_ts_ms(table, n) <= ts_ms
    ]
    if not candidates:
        raise FileNotFoundError(
            f"no retained version of {table} committed at or before {ts_ms}"
        )
    return candidates[-1]


def read_as_of(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Time travel: `VERSION AS OF` / `TIMESTAMP AS OF` reads over the
    retained snapshots (exactly one selector must be given). Version
    dirs are immutable, so the returned frame is stable no matter what
    commits land afterwards."""
    if (version is None) == (timestamp_ms is None):
        raise ValueError("pass exactly one of version= or timestamp_ms=")
    if timestamp_ms is not None:
        version = version_as_of_timestamp(table, timestamp_ms)
    return read_version(spark, table, version)


def register_versioned_views(
    spark: SparkSession, name: str, table: str
) -> list[str]:
    """SQL surface for time travel: registers ``name`` as the
    pointer-resolved CURRENT snapshot plus one ``name__vN`` view per
    retained version, so plain Spark SQL can query history::

        spark.sql("SELECT * FROM docs__v3")

    (Spark has no extensible `FOR VERSION AS OF` hook for path tables
    and rejects ``@`` in view names, so the version is addressed in
    the view NAME — the spirit of Delta's ``table@v3`` contract.) Views are re-registered on each
    call; returns the registered names. Each view reads an immutable
    version dir, so a concurrent commit never changes what a
    registered view returns."""
    table = table.rstrip("/")
    out = [name]
    read_current(spark, table).createOrReplaceTempView(name)
    for n in list_versions(table):
        if _is_complete(_version_dir(table, n)):
            vname = f"{name}__v{n}"
            read_version(spark, table, n).createOrReplaceTempView(vname)
            out.append(vname)
    return out
