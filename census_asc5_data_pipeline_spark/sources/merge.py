"""``MERGE INTO`` over both table formats — the write-side SQL verb a
warehouse user reaches for first (reference analog: report.md's view
DDL is read-only; the round-8/9 verdicts both named MERGE the last big
API-parity gap). Two layers:

- :func:`merge_into` — the engine: ANSI MERGE semantics (ordered
  WHEN MATCHED clauses, first match wins; a target row matching more
  than one source row raises, per the standard's cardinality rule)
  executed Spark-first and committed through the native table-format
  writers:

  * **Delta**: copy-on-write, the ``delete_delta_where(mode='cow')``
    shape — ONLY the files containing matched rows are rewritten
    (untouched files are never read), inserts stage as new files, and
    the commit removes/adds atomically. With
    ``delta.enableChangeDataFeed=true`` the same commit stages spec
    change-data files carrying ``delete`` / ``update_preimage`` /
    ``update_postimage`` / ``insert`` rows.
  * **Iceberg**: merge-on-read — matched rows are retired by a
    POSITION-delete file and update post-images + inserts append as
    new data files, all in ONE snapshot (the delete manifest and the
    data manifest share the new sequence number; position deletes
    name explicit old file paths, so the same-sequence new data is
    untouched, per the spec's ``delete_seq >= data_seq`` rule).
    Cost is O(matched + inserted rows), never O(table).

- :func:`merge_into_sql` — a front-end for the constrained ANSI
  surface::

      MERGE INTO sales AS t USING updates AS s ON t.id = s.id
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET price = s.price
      WHEN NOT MATCHED THEN INSERT (id, price) VALUES (s.id, s.price)

  with ``UPDATE SET *`` / ``INSERT *`` shorthands. The target name
  resolves through a ``{name: (format, path)}`` catalog; the source is
  a temp view name or a parenthesized subquery.

The row semantics reuse the engine's CDC discipline (the ``cdc_apply``
registry query is the pure-DataFrame statement of the same
upsert/delete fold).
"""

from __future__ import annotations

import os
import re
import shutil
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["merge_into", "merge_into_sql", "update_where", "dml_sql"]

# matched clause: ("update", cond_sql_or_None, {col: expr_sql}) or
# ("delete", cond_sql_or_None); not_matched: {col: expr_sql} or None
MatchedClause = tuple


def _clause_actions(
    clauses: list[MatchedClause], prefix: str = "m"
) -> list[tuple[str, object, dict | None]]:
    out = []
    for i, cl in enumerate(clauses):
        kind = cl[0]
        if kind == "update":
            _k, cond, sets = cl
            out.append((f"{prefix}u{i}", cond, dict(sets)))
        elif kind == "delete":
            cond = cl[1] if len(cl) > 1 else None
            out.append((f"{prefix}d{i}", cond, None))
        else:
            raise ValueError(f"unknown {prefix!r} clause kind {kind!r}")
    return out


def _all_clauses(
    matched: list[MatchedClause], nmbs: list[MatchedClause]
) -> list[tuple[str, object, dict | None]]:
    return _clause_actions(matched, "m") + _clause_actions(nmbs, "n")


def _chain(clauses: list[tuple[str, object, dict | None]]):
    """WHEN chain in reverse so the FIRST clause wins (ANSI order)."""
    chain = F.lit("keep")
    for tag, cond, _sets in reversed(clauses):
        hit = F.lit(True) if cond is None else F.coalesce(
            F.expr(cond), F.lit(False)
        )
        chain = F.when(hit, F.lit(tag)).otherwise(chain)
    return chain


def _plan_merge(
    scan: DataFrame,
    source: DataFrame,
    on: str,
    matched: list[MatchedClause],
    nmbs: list[MatchedClause],
    not_matched: dict | None,
    target_fields: list[T.StructField],
) -> tuple[DataFrame, DataFrame | None, object | None]:
    """Shared row semantics: returns (tagged, inserts, card_check).

    ``tagged`` = every target row of ``scan`` left-joined with the
    source, carrying ``__action`` ('keep' | 'm…' | 'n…') chosen by the
    FIRST matching clause (ANSI order) — WHEN MATCHED clauses for
    matched rows, WHEN NOT MATCHED BY SOURCE clauses (t.*-only
    expressions) for source-absent target rows — plus ``__base`` /
    ``__ri`` for position addressing.
    ``card_check`` enforces the standard's cardinality rule (a target
    row matching more than one source row raises). r17: instead of a
    dedicated inner-join probe job, two ``observe()`` counts ride the
    caller's FIRST action over ``tagged`` (the metrics collect / the
    position staging) — the left join preserves every scan row exactly
    once UNLESS some target row matches several source rows, so
    ``count(tagged) > count(scan)`` is exactly the old group-count
    probe. The caller MUST invoke ``card_check()`` after its first
    ``tagged`` action and BEFORE committing (None when no WHEN
    MATCHED clause — the ANSI insert-only exemption).
    ``inserts`` = the NOT MATCHED [BY TARGET] source rows projected to
    the target schema (None when no insert clause). ``not_matched``
    is a {col: expr} dict (one unconditional INSERT) or an ORDERED
    list of ``(cond_sql_or_None, {col: expr})`` — the ANSI
    ``WHEN NOT MATCHED AND <cond> THEN INSERT`` surface, first
    matching clause wins, rows matching none are skipped."""
    reserved = {"__base", "__ri"} & set(source.columns)
    if reserved:
        raise ValueError(
            f"MERGE source carries reserved column(s) {sorted(reserved)}"
        )
    if isinstance(not_matched, dict):
        not_matched = [(None, not_matched)]
    tnames = {f.name for f in target_fields}
    for _cond, vals in not_matched or []:
        unknown = set(vals) - tnames
        if unknown:
            raise ValueError(
                f"INSERT column(s) {sorted(unknown)} not in the table "
                "schema (pass evolve_schema=True to add source columns)"
            )
    for _tag, _cond, sets in _all_clauses(matched, nmbs):
        bad = set(sets or {}) - tnames
        if bad:
            raise ValueError(
                f"SET column(s) {sorted(bad)} not in the table schema "
                "(pass evolve_schema=True to add source columns)"
            )
    src = source.withColumn("__s_matched", F.lit(True)).alias("s")
    scan0 = scan  # un-observed: the insert anti-join must not share
    card_check = None
    if matched:
        # cardinality check rides the caller's first action over
        # ``tagged`` (r17 — was a dedicated inner-join probe job): the
        # left join emits each scan row once per matching source row,
        # so a fan-out (tagged count above scan count) is exactly a
        # target row matching more than one source row. Filters do not
        # push through CollectMetrics, so both counts see every row.
        from pyspark.sql import Observation

        obs_scan = Observation()
        obs_tag = Observation()
        scan = scan.observe(obs_scan, F.count(F.lit(1)).alias("n"))
        j = scan.alias("t").join(src, F.expr(on), "left").observe(
            obs_tag, F.count(F.lit(1)).alias("n")
        )

        def _obs_n(obs):
            # AQE's runtime empty-relation propagation can REPLACE the
            # subtree holding a CollectMetrics node when a downstream
            # stage materializes empty (the row-level no-op merge);
            # the query then completes with an EMPTY metrics row.
            # Detect that (schema-less zero-length row) and report
            # "unavailable" instead of tripping toPyRow's assertion.
            jrow = obs._jo.getRow()
            if jrow.length() == 0:
                return None
            return int(obs.get["n"])

        def card_check(_s=obs_scan, _t=obs_tag):
            nt, ns = _obs_n(_t), _obs_n(_s)
            if nt is not None and ns is not None:
                if nt > ns:
                    raise ValueError(
                        "MERGE cardinality violation: a target row "
                        "matches more than one source row"
                    )
                return
            # metrics dropped by AQE (empty downstream result) — fall
            # back to the pre-r17 probe job; rare, and exactly the
            # case where almost nothing matched
            dup = (
                scan0.alias("t")
                .join(src, F.expr(on), "inner")
                .groupBy(F.col("t.__base"), F.col("t.__ri"))
                .count()
                .where("count > 1")
                .limit(1)
                .count()
            )
            if dup:
                raise ValueError(
                    "MERGE cardinality violation: a target row "
                    "matches more than one source row"
                )

    else:
        j = scan.alias("t").join(src, F.expr(on), "left")
        # insert-only exemption (ANSI / delta-spark): with no WHEN
        # MATCHED clause, multiple source matches are legal — but the
        # left join still fans such target rows out, so collapse them.
        # Exact: the matched-side action is uniformly 'keep' and NOT
        # MATCHED BY SOURCE rows (source-absent) cannot be duplicated.
        j = j.dropDuplicates(["__base", "__ri"])
    is_matched = F.col("s.__s_matched").isNotNull()
    action = F.when(
        is_matched, _chain(_clause_actions(matched, "m"))
    ).otherwise(_chain(_clause_actions(nmbs, "n")))
    tagged = j.withColumn("__action", action)
    inserts = None
    if not_matched:
        anti = src.join(scan0.alias("t"), F.expr(on), "left_anti")
        # first insert clause wins (ANSI order); unmatched-by-every-
        # condition rows are skipped
        iclauses = [
            (f"i{k}", cond, dict(vals))
            for k, (cond, vals) in enumerate(not_matched)
        ]
        ichain = F.lit("skip")
        for itag, cond, _vals in reversed(iclauses):
            hit = F.lit(True) if cond is None else F.coalesce(
                F.expr(cond), F.lit(False)
            )
            ichain = F.when(hit, F.lit(itag)).otherwise(ichain)
        anti = anti.withColumn("__iaction", ichain).where(
            F.col("__iaction") != "skip"
        )
        cols = []
        for f in target_fields:
            expr = F.lit(None).cast(f.dataType)
            for itag, _cond, vals in reversed(iclauses):
                if f.name in vals:
                    expr = F.when(
                        F.col("__iaction") == itag,
                        F.expr(vals[f.name]).cast(f.dataType),
                    ).otherwise(expr)
            cols.append(expr.alias(f.name))
        inserts = anti.select(cols)
    return tagged, inserts, card_check


def _rewritten_cols(
    matched: list[MatchedClause],
    nmbs: list[MatchedClause],
    target_fields: list[T.StructField],
):
    """Per-target-column expression applying the winning UPDATE
    clause's SET (rows whose action is a delete tag are filtered
    before this projection)."""
    clauses = _all_clauses(matched, nmbs)
    cols = []
    for f in target_fields:
        expr = F.col(f"t.{f.name}")
        for tag, _cond, sets in clauses:
            if sets is not None and f.name in sets:
                expr = F.when(
                    F.col("__action") == tag,
                    F.expr(sets[f.name]).cast(f.dataType),
                ).otherwise(expr)
        cols.append(expr.alias(f.name))
    return cols


def _delete_tags(matched, nmbs) -> list[str]:
    return [
        t for t, _c, sets in _all_clauses(matched, nmbs) if sets is None
    ]


def _update_tags(matched, nmbs) -> list[str]:
    return [
        t
        for t, _c, sets in _all_clauses(matched, nmbs)
        if sets is not None
    ]


def merge_into(
    spark: SparkSession,
    fmt: str,
    path: str,
    source: DataFrame,
    on: str,
    matched: list[MatchedClause] | None = None,
    not_matched: dict | None = None,
    not_matched_by_source: list[MatchedClause] | None = None,
    mode: str = "cow",
    evolve_schema: bool = False,
    branch: str | None = None,
) -> int | None:
    """Execute MERGE against a ``delta`` or ``iceberg`` table at
    ``path``. ``on`` / clause conditions / SET and VALUES expressions
    are Spark SQL over the aliases ``t`` (target) and ``s`` (source).
    ``matched`` is an ORDERED list of ``("update", cond|None, {col:
    expr})`` / ``("delete", cond|None)``; ``not_matched`` maps target
    columns to insert expressions (missing columns insert NULL);
    ``not_matched_by_source`` is the delta-spark extension — ordered
    update/delete clauses applied to TARGET rows with no source match
    (expressions may reference ``t.*`` only — there is no source row).
    Delta ``mode``: ``'cow'`` rewrites the matched files; ``'dv'``
    retires acted-on rows via deletion vectors and appends update
    post-images + inserts — no data file rewritten, O(acted + inserted
    rows), the delta-spark DV-MERGE shape. Iceberg is always
    merge-on-read. ``evolve_schema=True`` (delta-spark's
    ``withSchemaEvolution()``, Delta only): source columns absent from
    the target are ADDED to the table schema in the same commit
    (nullable; pre-existing rows read NULL) — without it schema
    enforcement keeps drift out. Returns the committed
    version/snapshot id, or None when the merge is a no-op."""
    matched = matched or []
    nmbs = not_matched_by_source or []
    if not matched and not nmbs and not_matched is None:
        raise ValueError("MERGE needs at least one WHEN clause")
    if branch is not None and fmt != "iceberg":
        raise ValueError(
            "branch writes are an Iceberg refs feature — Delta has "
            "no branch refs"
        )
    if fmt not in ("delta", "iceberg"):
        raise ValueError(f"unsupported format {fmt!r} (delta|iceberg)")
    if fmt == "delta" and mode not in ("cow", "dv"):
        raise ValueError(f"unsupported mode {mode!r} (cow|dv)")
    # Persist the source for the statement's lifetime (r16): the merge
    # plan references it from SEPARATE actions — the tagged left
    # join's metrics/staging actions and the insert anti-join — and
    # broadcast builds are not reused across actions, so an uncached
    # source recomputed its whole lineage per action. Statement-
    # scoped: released in the finally regardless of commit outcome.
    # r17 (ADVICE): only when the CALLER has not already cached it —
    # persisting twice raises on a different storage level, and the
    # finally must not drop a cache this call did not add.
    added_cache = not source.is_cached
    if added_cache:
        source = source.persist()
    try:
        if fmt == "delta":
            return _merge_delta(
                spark, path, source, on, matched, nmbs, not_matched,
                mode, evolve_schema,
            )
        return _merge_iceberg(
            spark, path, source, on, matched, nmbs, not_matched,
            evolve_schema, branch=branch,
        )
    finally:
        if added_cache:
            source.unpersist()


def _merge_delta(
    spark, path, source, on, matched, nmbs, not_matched, mode="cow",
    evolve_schema=False,
) -> int | None:
    import json

    from census_asc5_data_pipeline_spark.sources import delta_io as d

    protocol, meta, adds, _tx = d._replay(spark, path, None)
    # insert-only merges never remove or modify committed rows, so
    # they remain legal on delta.appendOnly tables; anything with a
    # MATCHED / NOT MATCHED BY SOURCE clause is a row modification
    d._writer_gate(
        protocol, meta, "MERGE" if (matched or nmbs) else "WRITE"
    )
    gens = d._generated_columns(meta)
    gen_names = {n for n, _e, _t in gens}
    nm_list = (
        [(None, not_matched)]
        if isinstance(not_matched, dict)
        else list(not_matched or [])
    )
    idents = d._identity_columns(meta)
    ident_names = {i[0] for i in idents}
    identity_basis = {n: h for n, _d, _s, _st, h, _a in idents}
    if ident_names:
        # r14 (r13 verdict #3): MERGE supports identity tables —
        # insert-clause rows flow through _apply_identity's
        # checkpoint+count+mapInPandas kernel below; SET on the
        # identity column keeps refusing (system-allocated values)
        for _tag, _cond, sets_ in _all_clauses(matched, nmbs):
            bad = ident_names & set(sets_ or {})
            if bad:
                raise ValueError(
                    f"cannot SET identity column(s) {sorted(bad)} — "
                    "identity values are system-allocated"
                )
        for name in sorted(ident_names):
            supplied = [name in vals for _c, vals in nm_list]
            if supplied and any(supplied) and not all(supplied):
                raise ValueError(
                    f"identity column {name!r} must be supplied by "
                    "ALL insert clauses or NONE — mixed clauses "
                    "would interleave explicit values with "
                    "allocation"
                )
    if gen_names:
        for _tag, _cond, sets_ in _all_clauses(matched, nmbs):
            bad = gen_names & set(sets_ or {})
            if bad:
                raise ValueError(
                    f"cannot SET generated column(s) {sorted(bad)} — "
                    "they are recomputed from their generation "
                    "expression"
                )
        for name in sorted(gen_names):
            supplied = [name in vals for _c, vals in nm_list]
            if supplied and any(supplied) and not all(supplied):
                raise ValueError(
                    f"generated column {name!r} must be supplied by "
                    "ALL insert clauses or NONE — mixed clauses would "
                    "leave unsupplied rows NULL instead of computed"
                )
    physical_of = d._column_mapping(meta)
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = list(meta.get("partitionColumns") or [])
    # row tracking (r16): on an ENABLED table the target scan exposes
    # ``_row_id`` (so ON / clause conditions may join on stable ids —
    # the foreign-tracking-table merge case) and every rewritten or
    # updated row carries its id forward through the materialized
    # columns; inserts materialize NULL and take fresh base ids
    rt_preserve = d._rt_supported(protocol) and d._rt_enabled(meta)
    rt_conf_changed = False
    mat_id = mat_cv = None
    rt_extra: list[str] = []
    if rt_preserve:
        conf0 = meta.get("configuration") or {}
        conf2, mat_id, mat_cv = d._rt_mint_conf(conf0)
        if conf2 != conf0:
            meta = dict(meta, configuration=conf2)
            rt_conf_changed = True
        rt_extra = [mat_id, mat_cv]
    extra_fields: list[T.StructField] = []
    evolve_conf: dict[str, str] | None = None
    if evolve_schema:
        new_srcs = [
            f
            for f in source.schema.fields
            if f.name not in schema.fieldNames()
        ]
        if new_srcs and physical_of:
            # column-mapped evolution (r16 — the overwriteSchema
            # remint's additive twin): each NEW column mints a fresh
            # physicalName + columnMapping.id ABOVE maxColumnId (ids
            # never reused), maxColumnId bumps in the same commit,
            # and staging maps the new logical names through the
            # extended mapping
            conf0 = meta.get("configuration") or {}
            next_id = int(
                conf0.get("delta.columnMapping.maxColumnId", "0") or 0
            )
            physical_of = dict(physical_of)
            for f in new_srcs:
                import uuid as _uuid

                next_id += 1
                phys = f"col-{_uuid.uuid4()}"
                physical_of[f.name] = phys
                extra_fields.append(
                    T.StructField(
                        f.name,
                        f.dataType,
                        True,
                        {
                            "delta.columnMapping.id": next_id,
                            "delta.columnMapping.physicalName": phys,
                        },
                    )
                )
            evolve_conf = {
                **conf0,
                "delta.columnMapping.maxColumnId": str(next_id),
            }
            meta = dict(meta, configuration=evolve_conf)
        else:
            extra_fields = [
                T.StructField(f.name, f.dataType, True)
                for f in new_srcs
            ]
        if extra_fields:
            schema = T.StructType(schema.fields + extra_fields)
    if not adds and not_matched is None:
        return None
    scan = d._scan_adds(
        spark,
        path,
        schema,
        pcols,
        [(None, a) for a in adds.values()],
        keep_pos=True,
        physical_of=physical_of,
        extra_long_cols=rt_extra,
    ) if adds else spark.createDataFrame(
        [],
        T.StructType(
            schema.fields
            + [
                T.StructField("__base", T.StringType()),
                T.StructField("__ri", T.LongType()),
            ]
        ),
    )
    if rt_preserve:
        scan = (
            d._rt_stable_cols(spark, scan, list(adds.values()), meta)
            if adds
            else scan.withColumn(
                "_row_id", F.lit(None).cast("long")
            ).withColumn("__rt_cv", F.lit(None).cast("long"))
        )
    tagged, inserts, card_check = _plan_merge(
        scan, source, on, matched, nmbs, not_matched, list(schema.fields)
    )
    # statement-scoped inserts persist (r17): the insert anti-join is
    # referenced by the n_ins count, the identity allocation pin, the
    # staging union write AND the CDC union — each a separate action
    # that would re-run the anti-join (re-scanning the target) on an
    # uncached frame. Bounded by the (already persisted) source size;
    # released in the finally regardless of commit outcome.
    # the commit body is a closure (r17) so the statement-scoped
    # inserts cache below is released on EVERY exit path — no-op
    # returns, cardinality/constraint raises, the commit itself —
    # without threading two dozen locals through a helper signature.
    # ``inserts`` binds as a default arg because the identity path
    # rebinds it inside the closure.
    def _commit_body(inserts=inserts):
        # per-(action, file) matched-row counts ride the SAME shuffle the
        # old distinct() took (r15: operationMetrics) — touched files AND
        # numTargetRowsUpdated/Deleted from one job, which is also the
        # action the cardinality observe() pair rides (r17) AND the
        # materialization of the statement-scoped `acted` cache every
        # later acted-row consumer (DV retire, post-images, CDC
        # delete/update images) reads instead of re-scanning the target
        act_rows = (
            acted.groupBy(
                F.col("__action"), F.col("t.__base").alias("__base")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
            if acted is not None
            else []
        )
        if card_check is not None:
            card_check()
        touched = sorted({r["__base"] for r in act_rows})
        n_upd = sum(int(r["n"]) for r in act_rows if r["__action"] in upd_tags)
        n_del = sum(int(r["n"]) for r in act_rows if r["__action"] in del_tags)
        n_ins = inserts.count() if inserts is not None else 0
        if not touched and not n_ins and not extra_fields:
            # row-level no-op AND no schema widening: nothing to commit.
            # With evolve_schema extra columns the widened metaData still
            # commits below (r11 ADVICE: a caller relying on the evolved
            # schema for a follow-up write must not silently see the old
            # one), just with no add/remove actions.
            return None
        identity_updates: dict[str, int] = {}
        if inserts is not None and n_ins and ident_names:
            # insert-clause allocation (r14): clauses that DON'T name the
            # identity column projected it as NULL — drop it so
            # _apply_identity sees it missing and allocates gap-free;
            # clauses that DO name it pass explicit values through the
            # same ALWAYS-refusal / BY DEFAULT hwm-ratchet rules as
            # INSERT. Update post-images keep their existing values (SET
            # refused above), so only inserts allocate.
            unsupplied = [
                n
                for n in sorted(ident_names)
                if not any(n in vals for _c, vals in nm_list)
            ]
            alloc_src = inserts.drop(*unsupplied) if unsupplied else inserts
            alloc_out, identity_updates = d._apply_identity(
                alloc_src, meta, "MERGE"
            )
            inserts = alloc_out.select(
                [F.col(f"`{f.name}`") for f in schema.fields]
            )
        now_ms = int(time.time() * 1000)
        lines: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "MERGE",
                    "operationParameters": {"predicate": on},
                    "engineInfo": "census_asc5_data_pipeline_spark delta_io",
                }
            }
        ]
        if extra_fields or identity_updates or rt_conf_changed:
            # schema evolution, the advanced identity high water mark
            # and/or freshly-minted materialized row-id column names
            # commit atomically with the row changes in ONE metaData
            # action (old files' missing columns read NULL on scan; the
            # hwm must land with its allocated rows, per spec)
            meta_commit = (
                dict(meta, schemaString=schema.json())
                if extra_fields
                else dict(meta)
            )
            if identity_updates:
                meta_commit = d._stamp_identity_hwm(
                    meta_commit, identity_updates
                )
            lines.append({"metaData": meta_commit})
        adds_by_base = d._adds_by_base(adds)
        planned: dict[str, dict | None] = {}
        staged_rows: DataFrame | None = None
        if mode == "dv":
            # DV-retire every acted-on row (update pre-images AND deletes)
            # and stage only the post-images — untouched rows of touched
            # files stay in place behind the deletion vector
            if touched:
                d._dv_retire(
                    spark, path, protocol,
                    acted.select(
                        F.col("t.__base").alias("__base"),
                        F.col("t.__ri").alias("__ri"),
                    ),
                    F.lit(True), adds_by_base, lines, planned, now_ms,
                )
            if upd_tags and acted is not None:
                # updated post-images keep their stable id; the commit
                # version resets to THIS commit (null materialized value
                # → the new file's defaultRowCommitVersion on read)
                staged_rows = d._regenerate(
                    acted.where(F.col("__action").isin(upd_tags)).select(
                        _rewritten_cols(matched, nmbs, list(schema.fields))
                        + (
                            [
                                F.col("t._row_id").alias(mat_id),
                                F.lit(None).cast("long").alias(mat_cv),
                            ]
                            if rt_preserve
                            else []
                        )
                    ),
                    meta,
                    gens,
                )
        elif touched:
            kept = d._regenerate(
                tagged.where(
                    F.col("t.__base").isin(touched)
                    & ~F.col("__action").isin(del_tags)
                ).select(
                    _rewritten_cols(matched, nmbs, list(schema.fields))
                    + (
                        [
                            F.col("t._row_id").alias(mat_id),
                            # copied rows keep id AND original commit
                            # version; updated rows keep id, new version
                            F.when(
                                F.col("__action").isin(upd_tags),
                                F.lit(None).cast("long"),
                            )
                            .otherwise(F.col("t.__rt_cv"))
                            .cast("long")
                            .alias(mat_cv),
                        ]
                        if rt_preserve
                        else []
                    )
                ),
                meta,
                gens,
            )
            staged_rows = kept
            for base in sorted(touched):
                a = adds_by_base[base]
                planned[a["path"]] = a.get("deletionVector")
                lines.append({"remove": d._remove_action(a, now_ms)})
        ins_checks: list[tuple[str, str]] = []
        if inserts is not None and n_ins and gens:
            # insert clauses that SUPPLY a generated column are validated
            # (the check rides the constraint aggregate; regenerated
            # post-images satisfy it by construction); unsupplied ones
            # are computed from the generation expression
            for name, expr, dtype in gens:
                if any(name in vals for _c, vals in nm_list):
                    ins_checks.append(
                        (
                            f"GENERATED {name}",
                            f"`{name}` <=> CAST(({expr}) AS "
                            f"{dtype.simpleString()})",
                        )
                    )
                else:
                    inserts = inserts.withColumn(
                        name, F.expr(expr).cast(dtype)
                    )
        if inserts is not None and n_ins:
            staged_ins = inserts
            if rt_preserve:
                # fresh rows materialize NULL — they take the new file's
                # baseRowId + position on read (kept off the CDF images)
                staged_ins = staged_ins.withColumn(
                    mat_id, F.lit(None).cast("long")
                ).withColumn(mat_cv, F.lit(None).cast("long"))
            staged_rows = (
                staged_ins
                if staged_rows is None
                else staged_rows.unionByName(staged_ins)
            )
        staged_add_lines: list[dict] = []
        if staged_rows is not None:
            d._check_constraints(staged_rows, meta, "MERGE", extra=ins_checks)
            staged_add_lines = d._stage_adds_mapped(
                staged_rows, path, pcols, physical_of,
                stats_cols=d._stats_cols_of(meta),
                field_ids=d._mapping_ids(meta),
            )
            lines.extend(staged_add_lines)
        if (meta.get("configuration") or {}).get(
            "delta.enableChangeDataFeed"
        ) == "true":
            cdc_parts = []
            tcols = [
                F.col(f"t.{f.name}").alias(f.name) for f in schema.fields
            ]
            if del_tags and acted is not None:
                cdc_parts.append(
                    acted.where(F.col("__action").isin(del_tags))
                    .select(tcols)
                    .withColumn("_change_type", F.lit("delete"))
                )
            if upd_tags and acted is not None:
                upd = acted.where(F.col("__action").isin(upd_tags))
                cdc_parts.append(
                    upd.select(tcols).withColumn(
                        "_change_type", F.lit("update_preimage")
                    )
                )
                cdc_parts.append(
                    d._regenerate(
                        upd.select(
                            _rewritten_cols(
                                matched, nmbs, list(schema.fields)
                            )
                        ),
                        meta,
                        gens,
                    ).withColumn("_change_type", F.lit("update_postimage"))
                )
            if inserts is not None and n_ins:
                cdc_parts.append(
                    inserts.withColumn("_change_type", F.lit("insert"))
                )
            if cdc_parts:
                cdc = cdc_parts[0]
                for p_ in cdc_parts[1:]:
                    cdc = cdc.unionByName(p_)
                lines.extend(
                    d._stage_cdc_mapped(
                        cdc, path, pcols, physical_of,
                        field_ids=d._mapping_ids(meta),
                    )
                )
        c = d._commit_counts(lines)
        dv_pairs = c["dv_adds"] if mode == "dv" else 0
        copied = None
        if c["add_rows"] is not None:
            # CoW rewrites carry kept + updated + inserted rows; what's
            # neither updated nor inserted was copied through. DV mode
            # stages only post-images + inserts — nothing is copied.
            copied = (
                max(0, c["add_rows"] - n_upd - n_ins)
                if mode == "cow"
                else 0
            )
        d._stamp_op_metrics(
            lines,
            numTargetRowsInserted=n_ins,
            numTargetRowsUpdated=n_upd,
            numTargetRowsDeleted=n_del,
            numTargetRowsCopied=copied,
            numOutputRows=c["add_rows"],
            # a DV remove+re-add pair masks rows in the same data file —
            # neither side counts as a file added/removed (delta-spark)
            numTargetFilesAdded=c["adds"] - dv_pairs,
            numTargetFilesRemoved=c["removes"] - dv_pairs,
            numTargetDeletionVectorsAdded=dv_pairs if mode == "dv" else None,
            numTargetChangeFilesAdded=c["cdc"],
        )
        while True:
            versions = d.delta_versions(path)
            ckpt = d._read_last_checkpoint(path)
            next_v = max(versions + ([ckpt] if ckpt is not None else [])) + 1
            if identity_updates:
                # the hwm comparison needs the CURRENT metaData — full
                # replay here; the non-identity path fetches only the
                # planned adds
                _p2, _m2, live_now, _t2 = d._replay(spark, path, None)
            else:
                live_now = d._live_subset(spark, path, frozenset(planned))
            for p_, dv in planned.items():
                cur = live_now.get(p_)
                if cur is None or cur.get("deletionVector") != dv:
                    raise ValueError(
                        f"concurrent commit changed {p_!r} since this MERGE "
                        "was planned — aborting without committing"
                    )
            if identity_updates:
                # the write_delta concurrent-allocation abort, verbatim:
                # committing a range another writer also allocated would
                # duplicate keys
                cur_basis = {
                    n: h
                    for n, _d, _s, _st, h, _a in d._identity_columns(_m2)
                }
                if cur_basis != identity_basis:
                    raise ValueError(
                        "concurrent identity allocation detected (high "
                        "water mark moved since this MERGE was planned) "
                        "— re-run the merge"
                    )
            d._stamp_row_tracking(
                spark, path, protocol, lines, staged_add_lines, next_v
            )
            try:
                d._put_if_absent_commit(path, next_v, lines)
                d._maybe_auto_checkpoint(
                    spark, path, next_v, meta.get("configuration")
                )
                return next_v
            except FileExistsError:
                continue

    ins_cache = None
    if inserts is not None:
        inserts = ins_cache = inserts.persist()
    if not adds:
        # an EMPTY target cannot match any source row: the cardinality
        # rule is vacuously satisfied and nothing can be acted on —
        # skip the probe fallback AND the acted-rows machinery (r17)
        card_check = None
    # statement-scoped acted-rows persist (r17): the DV retire /
    # post-image staging and the CDC delete/update images each re-ran
    # the full target-scan join for the same acted subset. Bounded by
    # the matched-row count; materialized by the metrics collect,
    # released in the finally.
    del_tags = _delete_tags(matched, nmbs)
    upd_tags = _update_tags(matched, nmbs)
    act_tags = del_tags + upd_tags
    acted = (
        tagged.where(F.col("__action").isin(act_tags)).persist()
        if act_tags and adds
        else None
    )
    try:
        return _commit_body()
    finally:
        if ins_cache is not None:
            ins_cache.unpersist()
        if acted is not None:
            acted.unpersist()


def _spec_pcols(meta: dict, fields: list[dict], verb: str) -> list[dict]:
    """The default partition spec as [{name, source, transform,
    src_type, result_type}] for the DML staging path. ALL spec
    transforms the writer supports (identity, bucket[N], truncate[W],
    year/month/day — round-11: the r10 identity-only gate lifted by
    reusing :func:`iceberg_io._stage_partition_expr`'s kernels);
    ``hour``/``void`` complete the vocabulary in r13."""
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _transform_result_type,
    )

    specs = meta.get("partition-specs") or (
        [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
    )
    spec = next(
        s
        for s in specs
        if s.get("spec-id", 0) == meta.get("default-spec-id", 0)
    )
    by_id = {f["id"]: f for f in fields}
    out = []
    for f in spec.get("fields", []):
        tr = f.get("transform", "identity")
        s_f = by_id[f["source-id"]]
        out.append(
            {
                "name": f["name"],
                "source": s_f["name"],
                "transform": tr,
                "src_type": s_f["type"],
                "result_type": _transform_result_type(tr, s_f["type"]),
            }
        )
    return out


def _merge_iceberg(
    spark, path, source, on, matched, nmbs, not_matched,
    evolve_schema=False, branch=None,
) -> int | None:
    from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
    from census_asc5_data_pipeline_spark.sources.avro_io import (
        write_container_generic,
    )

    cur_v, meta = ice._current_metadata(path)
    # v3 MERGE is lineage-preserving since r16: updated rows carry
    # their _row_id as a materialized column (a null materialized
    # _last_updated_sequence_number inherits the NEW file's sequence
    # number — "last updated" semantics for free), inserts take ids
    # from the new files' first_row_id blocks, and the retirements
    # commit as Puffin deletion vectors (the spec's mandatory v3
    # position-delete shape)
    fv = ice._format_version_gate(
        meta, "MERGE", write=True, v3_write_ok=True,
        # the target scan materializes defaults (r16) — copied rows'
        # post-images carry the default, never a wrong NULL
        defaults_ok=True,
    )
    branch_head = _branch_head(meta, branch)
    schema, fields = ice._schema_of(meta)
    defaulted = (
        [f for f in fields if f.get("initial-default") is not None]
        if fv >= 3
        else []
    )
    pcols = _spec_pcols(meta, fields, "MERGE")
    evolved_fields = None
    extra_sp: list[T.StructField] = []
    if evolve_schema:
        extra_sp = [
            T.StructField(f.name, f.dataType, True)
            for f in source.schema.fields
            if f.name not in schema.fieldNames()
        ]
        if extra_sp:
            # Iceberg schema evolution: register a NEW schema-id with
            # name-stable old field ids + fresh ids for the additions
            # (the write_iceberg overwrite discipline); old data files
            # scan NULL for the new columns
            next_id = max(
                [int(meta.get("last-column-id", 0))]
                + [f["id"] for f in fields]
            )
            new_ice = []
            for f in extra_sp:
                t = ice._SPARK_TO_ICE.get(f.dataType.simpleString())
                if t is None:
                    raise ValueError(
                        "iceberg schema evolution supports flat "
                        f"primitives + timestamp; {f.name!r} is "
                        f"{f.dataType.simpleString()!r}"
                    )
                next_id += 1
                new_ice.append(
                    {
                        "id": next_id,
                        "name": f.name,
                        "required": False,
                        "type": t,
                    }
                )
            evolved_fields = list(fields) + new_ice
            schema = T.StructType(list(schema.fields) + extra_sp)
    data_files, delete_fs = ice._snapshot_files(path, meta, branch_head)
    abs_of_base: dict[str, str] = {}
    for dd in data_files:
        ap = os.path.abspath(ice._local(dd["file_path"]))
        base = os.path.basename(ap)
        if base in abs_of_base and abs_of_base[base] != ap:
            raise ValueError(
                f"duplicate data-file basename {base!r} — cannot "
                "address positions unambiguously"
            )
        abs_of_base[base] = ap
    old_schema = (
        T.StructType(schema.fields[: len(fields)])
        if evolved_fields
        else schema
    )
    if data_files:
        if defaulted:
            scan = ice._scan_with_defaults(
                spark, old_schema, fields, data_files, delete_fs,
                defaulted, keep_pos=True, lineage=True,
            ).drop("_last_updated_sequence_number")
        elif fv >= 3:
            scan = ice._lineage_scan(
                spark, old_schema, fields, data_files, delete_fs,
                keep_pos=True,
            ).drop("_last_updated_sequence_number")
        else:
            scan = ice._scan_with_deletes(
                spark, old_schema, fields, data_files, delete_fs,
                keep_pos=True,
            )
        for f in extra_sp:
            # pre-evolution files scan NULL for the added columns
            scan = scan.withColumn(f.name, F.lit(None).cast(f.dataType))
    else:
        scan = spark.createDataFrame(
            [],
            T.StructType(
                schema.fields
                + (
                    [T.StructField("_row_id", T.LongType())]
                    if fv >= 3
                    else []
                )
                + [
                    T.StructField("__base", T.StringType()),
                    T.StructField("__ri", T.LongType()),
                ]
            ),
        )
    tagged, inserts, card_check = _plan_merge(
        scan, source, on, matched, nmbs, not_matched, list(schema.fields)
    )
    if not data_files:
        # an EMPTY target cannot match any source row: the cardinality
        # rule is vacuously satisfied (r17 — skips the probe fallback
        # that AQE's empty-relation handling would otherwise force)
        card_check = None
    # statement-scoped inserts persist (r17): the insert anti-join is
    # referenced by both the required-field validation aggregate and
    # the staging write — each would re-run it (re-scanning the
    # target) on an uncached frame. Bounded by the (already
    # persisted) source size; released in the finally.
    ins_cache = None
    if inserts is not None:
        inserts = ins_cache = inserts.persist()
    try:
        return _merge_iceberg_commit(
            spark, path, cur_v, meta, fv, pcols, schema, matched, nmbs,
            tagged, inserts, card_check, evolved_fields, branch,
            delete_fs, abs_of_base,
        )
    finally:
        if ins_cache is not None:
            ins_cache.unpersist()


def _merge_iceberg_commit(
    spark, path, cur_v, meta, fv, pcols, schema, matched, nmbs,
    tagged, inserts, card_check, evolved_fields, branch, delete_fs,
    abs_of_base,
) -> int | None:
    del_tags = _delete_tags(matched, nmbs)
    upd_tags = _update_tags(matched, nmbs)
    act_tags = del_tags + upd_tags
    # merge-on-read: retire EVERY acted-on row by position, append
    # update post-images + inserts as new data — one snapshot.
    # abs_of_base empty = EMPTY target: nothing can be retired, so
    # skip the position staging write outright (r17)
    retired = tagged.where(F.col("__action").isin(act_tags)) if (
        act_tags and abs_of_base
    ) else None
    new_rows: DataFrame | None = None
    if upd_tags:
        new_rows = tagged.where(F.col("__action").isin(upd_tags)).select(
            _rewritten_cols(matched, nmbs, list(schema.fields))
            + (
                # updated rows keep their identity: the target row's
                # _row_id materializes into the rewritten image
                [F.col("t._row_id").alias("_row_id")]
                if fv >= 3
                else []
            )
        )
    if inserts is not None:
        if fv >= 3:
            # fresh rows: null materialized id → assigned from the
            # new file's first_row_id block on read
            inserts = inserts.withColumn(
                "_row_id", F.lit(None).cast("long")
            )
        new_rows = (
            inserts if new_rows is None else new_rows.unionByName(inserts)
        )

    pos_df = None
    if retired is not None:
        base_df = F.broadcast(
            spark.createDataFrame(
                sorted(abs_of_base.items()),
                "__base string, __abs string",
            )
        )
        pos_df = (
            retired.select(
                F.col("t.__base").alias("__base"),
                F.col("t.__ri").alias("__ri"),
            )
            .join(base_df, "__base")
            .select(
                F.col("__abs").alias("file_path"),
                F.col("__ri").alias("pos"),
            )
        )
        if fv < 3:
            # v2 parquet position-delete files must each be sorted by
            # (file_path, pos); cluster per file with a HASH exchange
            # — NOT repartitionByRange, whose boundary-sampling pass
            # re-executes the subtree and double-counts the
            # cardinality observe() riding it (r17) — and AQE
            # coalesces small deletes to one file. (v3 skips the
            # shuffle entirely: the DV grouping below is its own
            # aggregate and _stage_dv_files sorts per blob.)
            pos_df = pos_df.repartition("file_path").sortWithinPartitions(
                "file_path", "pos"
            )
    return _commit_iceberg_mor(
        spark, path, cur_v, meta, pos_df, new_rows, pcols,
        evolved_fields=evolved_fields, branch=branch,
        existing_deletes=delete_fs, precommit_check=card_check,
    )


def _branch_head(meta: dict, branch: str | None) -> int | None:
    """Resolve a branch ref to its head snapshot id for DML scans
    (None = main/current). Validation mirrors
    :func:`_commit_iceberg_mor`'s, but the scan needs the head BEFORE
    planning."""
    if branch is None:
        return None
    bref = (meta.get("refs") or {}).get(branch)
    if bref is None:
        raise ValueError(
            f"unknown branch {branch!r} — create_branch first "
            f"(refs: {sorted(meta.get('refs') or {})})"
        )
    if bref.get("type") != "branch":
        raise ValueError(
            f"ref {branch!r} is a {bref.get('type')!r}, not a branch "
            "— only branches accept writes"
        )
    return int(bref["snapshot-id"])


def _commit_iceberg_mor(
    spark, path, cur_v, meta, pos_df, new_rows, pcols=None,
    evolved_fields=None, branch=None, existing_deletes=None,
    precommit_check=None,
) -> int | None:
    """ONE merge-on-read Iceberg snapshot: ``pos_df`` (file_path, pos —
    already sorted) stages as a content=1 position-delete file,
    ``new_rows`` as new data files; both manifests share the new
    sequence number (position deletes name explicit OLD paths, so the
    same-sequence new data is untouched per the spec's
    delete_seq >= data_seq rule). Shared by :func:`merge_into` and
    :func:`update_where` on Iceberg. ``branch`` (round-13 WAP):
    the snapshot's parent + inherited manifests come from the branch
    head, ``refs[branch]`` advances, and main (current-snapshot-id /
    snapshot-log) does not move. Returns the snapshot id, or None
    when there is nothing to commit."""
    from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
    from census_asc5_data_pipeline_spark.sources.avro_io import (
        write_container_generic,
    )

    import pyarrow.parquet as pq

    pcols = pcols or []
    branch_base: int | None = None
    if branch is not None:
        if evolved_fields is not None:
            raise NotImplementedError(
                "schema evolution on a BRANCH write is out of scope — "
                "current-schema-id is table-global"
            )
        bref = (meta.get("refs") or {}).get(branch)
        if bref is None:
            raise ValueError(
                f"unknown branch {branch!r} — create_branch first "
                f"(refs: {sorted(meta.get('refs') or {})})"
            )
        if bref.get("type") != "branch":
            raise ValueError(
                f"ref {branch!r} is a {bref.get('type')!r}, not a "
                "branch — only branches accept writes"
            )
        branch_base = int(bref["snapshot-id"])
    fv = int(meta.get("format-version", 2))
    delete_files: list[dict] = []
    dv_entry_schema: dict | None = None
    dv_superseded: list[tuple[str, int]] = []
    added_files: list[dict] = []
    staging = os.path.join(path, "data", f".staging-{uuid.uuid4().hex}")
    try:
        if pos_df is not None and fv >= 3:
            # v3: the retirements commit as Puffin deletion vectors,
            # one blob per touched data file (iceberg_io's shared
            # staging; positions ride the driver, O(matched rows))
            hit = (
                pos_df.groupBy("file_path")
                .agg(F.collect_list("pos").alias("pos"))
                .collect()
            )
            # MERGE's cardinality observe() pair fired during the
            # position collect — validate before anything stages
            if precommit_check is not None:
                precommit_check()
                precommit_check = None
            if hit:
                delete_files, dv_entry_schema, dv_superseded = (
                    ice._stage_dv_files(
                        path, meta, cur_v,
                        [(r["file_path"], list(r["pos"])) for r in hit],
                        existing_deletes or [],
                    )
                )
        elif pos_df is not None:
            pos_df.write.mode("overwrite").parquet(staging)
            # MERGE's cardinality observe() pair fired during the
            # position staging write — validate before any file moves
            if precommit_check is not None:
                precommit_check()
                precommit_check = None
            for fn in sorted(os.listdir(staging)):
                if not fn.endswith(".parquet") or fn.startswith("."):
                    continue
                nrows = int(
                    pq.ParquetFile(
                        os.path.join(staging, fn)
                    ).metadata.num_rows
                )
                if not nrows:
                    continue
                dst = os.path.join(
                    path, "data", f"pos-delete-{uuid.uuid4().hex}.parquet"
                )
                shutil.move(os.path.join(staging, fn), dst)
                delete_files.append(
                    {
                        "content": 1,
                        "file_path": os.path.abspath(dst),
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": nrows,
                        "file_size_in_bytes": os.path.getsize(dst),
                    }
                )
        if new_rows is not None:
            # foreign required=true fields bind MERGE/UPDATE images
            # too — validate before anything stages (r12, the
            # delta-side _check_constraints twin)
            ice._check_required(
                new_rows,
                evolved_fields
                if evolved_fields is not None
                else ice._schema_of(meta, allow_renames=True)[1],
                "MERGE",
            )
            shutil.rmtree(staging, ignore_errors=True)
            # the write_iceberg staging shape: a DERIVED __pt_ column
            # evaluates the spec field's transform (identity clone,
            # bucket = spec murmur3, truncate, year/month/day) and
            # drives the layout, so the source column stays IN the
            # data file (iceberg files carry all columns per spec) and
            # an update that moves a row across partitions lands it in
            # the right directory automatically
            out_df = ice._with_field_ids(
                new_rows,
                evolved_fields
                if evolved_fields is not None
                else ice._schema_of(meta, allow_renames=True)[1],
            )
            writer_cols = []
            for pf in pcols:
                out_df = out_df.withColumn(
                    f"__pt_{pf['name']}",
                    ice._stage_partition_expr(
                        pf["transform"], pf["source"], pf["src_type"]
                    ),
                )
                writer_cols.append(f"__pt_{pf['name']}")
            w = out_df.write.mode("overwrite")
            if writer_cols:
                w = w.partitionBy(*writer_cols)
            w.parquet(staging)
            for root, _dirs, fnames in os.walk(staging):
                for fn in sorted(fnames):
                    if not fn.endswith(".parquet") or fn.startswith("."):
                        continue
                    srcp = os.path.join(root, fn)
                    nrows = int(pq.ParquetFile(srcp).metadata.num_rows)
                    if not nrows:
                        continue
                    rel = os.path.relpath(srcp, staging)
                    pv: dict[str, str | None] = {}
                    for comp in rel.split(os.sep)[:-1]:
                        if "=" in comp:
                            k, _, v = comp.partition("=")
                            v = urllib.parse.unquote(v)
                            pv[k.removeprefix("__pt_")] = (
                                None
                                if v == "__HIVE_DEFAULT_PARTITION__"
                                else v
                            )
                    dst_rel = os.path.join(
                        os.path.dirname(rel.replace("__pt_", "")),
                        f"part-{uuid.uuid4().hex}.parquet",
                    )
                    dst = os.path.join(path, "data", dst_rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.move(srcp, dst)
                    part_rec: dict = {}
                    for pf in pcols:
                        raw = pv.get(pf["name"])
                        if raw is None:
                            part_rec[pf["name"]] = None
                        elif pf["result_type"] in ("int", "long"):
                            part_rec[pf["name"]] = int(raw)
                        else:
                            part_rec[pf["name"]] = raw
                    added_files.append(
                        {
                            "content": 0,
                            "file_path": os.path.abspath(dst),
                            "file_format": "PARQUET",
                            "partition": part_rec,
                            "record_count": nrows,
                            "file_size_in_bytes": os.path.getsize(dst),
                            **ice.iceberg_bounds.file_column_metrics(
                                dst,
                                evolved_fields
                                or ice._schema_of(meta)[1],
                            ),
                        }
                    )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    if not delete_files and not added_files:
        return None
    if ice._current_metadata(path)[0] != cur_v:
        raise ValueError(
            "concurrent commit landed during MERGE planning — aborting "
            "without committing"
        )
    now_ms = int(time.time() * 1000)
    new_v = cur_v + 1
    snap_id = new_v
    seq = int(meta.get("last-sequence-number", cur_v)) + 1
    specs = meta.get("partition-specs") or (
        [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
    )
    default_spec_id = meta.get("default-spec-id", 0)
    # a position-delete file spanning partitions is GLOBAL per spec —
    # it belongs to an unpartitioned spec; register one if the table
    # only has partitioned specs
    new_specs = list(specs)
    delete_spec_id = default_spec_id
    if delete_files and pcols:
        unpart = next(
            (s for s in specs if not s.get("fields")), None
        )
        if unpart is None:
            unpart = {
                "spec-id": max(s.get("spec-id", 0) for s in specs) + 1,
                "fields": [],
            }
            new_specs = specs + [unpart]
        delete_spec_id = unpart["spec-id"]
    lineage_first: int | None = None
    lineage_next: int | None = None
    if fv >= 3 and added_files:
        # fresh first_row_id blocks above next-row-id (spec: assigned
        # to every added data file; rows with a materialized _row_id
        # — the updated images — simply never consult theirs)
        lineage_first = int(meta.get("next-row-id", 0) or 0)
        lineage_next = lineage_first
        for dd in added_files:
            dd["first_row_id"] = lineage_next
            lineage_next += int(dd["record_count"])
    data_entry_schema = ice._entry_schema_for(
        [(pf["name"], pf["result_type"]) for pf in pcols]
    )
    if fv >= 3:
        data_entry_schema["fields"][2]["type"]["fields"].append(
            {"name": "first_row_id", "type": ["null", "long"],
             "default": None}
        )
    schemas_by_content = {
        0: data_entry_schema,
        1: dv_entry_schema or ice._entry_schema_for([]),
    }
    spec_by_content = {0: default_spec_id, 1: delete_spec_id}
    manifests: list[dict] = []
    for content, files_ in ((0, added_files), (1, delete_files)):
        if not files_:
            continue
        man_path = os.path.join(
            ice._meta_dir(path),
            f"manifest-merge{content}-{snap_id}-{uuid.uuid4().hex}.avro",
        )
        with open(man_path, "wb") as fh:
            write_container_generic(
                fh,
                schemas_by_content[content],
                [
                    {"status": 1, "snapshot_id": snap_id, "data_file": dd}
                    for dd in files_
                ],
            )
        manifests.append(
            {
                "manifest_path": os.path.abspath(man_path),
                "manifest_length": os.path.getsize(man_path),
                "partition_spec_id": spec_by_content[content],
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
                "added_files_count": len(files_),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    dd["record_count"] for dd in files_
                ),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    cur_snap_id = (
        branch_base if branch is not None
        else meta.get("current-snapshot-id")
    )
    prev_manifests: list[dict] = []
    snap = next(
        (
            s
            for s in meta.get("snapshots", [])
            if s["snapshot-id"] == cur_snap_id
        ),
        None,
    )
    if snap is not None and "manifest-list" in snap:
        _s, prev_manifests = ice.read_container_generic(
            ice._local(snap["manifest-list"])
        )
    # v3: a replacement DV supersedes the old entry in the SAME
    # snapshot — drop it from the re-listed prior manifests
    prev_manifests = ice._drop_superseded_dv_entries(
        path, prev_manifests, dv_superseded
    )
    ml_path = os.path.join(
        ice._meta_dir(path), f"snap-{snap_id}-{uuid.uuid4().hex}.avro"
    )
    ml_rows = [
        {
            k: m.get(k, 0)
            for k in (
                f["name"]
                for f in ice._MANIFEST_FILE_SCHEMA["fields"]
            )
        }
        for m in prev_manifests
    ] + manifests
    with open(ml_path, "wb") as fh:
        write_container_generic(
            fh, ice._MANIFEST_FILE_SCHEMA, ml_rows
        )
    new_sid = meta.get("current-schema-id", 0)
    evolved_schemas = None
    if evolved_fields is not None:
        prev_schemas = meta.get("schemas") or (
            [dict(meta["schema"], **{"schema-id": 0})]
            if "schema" in meta
            else []
        )
        new_sid = (
            max((sc.get("schema-id", 0) for sc in prev_schemas), default=0)
            + 1
        )
        evolved_schemas = prev_schemas + [
            {
                "type": "struct",
                "schema-id": new_sid,
                "fields": evolved_fields,
            }
        ]
    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": os.path.abspath(ml_path),
        "summary": ice._snapshot_summary(
            "overwrite",
            ml_rows,
            ice._parent_summary(meta, cur_snap_id),
            added_data_files=len(added_files),
            added_records=sum(
                int(dd["record_count"]) for dd in added_files
            ),
            added_delete_files=len(delete_files),
            added_position_deletes=sum(
                int(dd["record_count"]) for dd in delete_files
            ),
            added_files_size=sum(
                int(dd.get("file_size_in_bytes", 0) or 0)
                for dd in added_files + delete_files
            ),
        ),
        "schema-id": new_sid,
    }
    if lineage_first is not None:
        snapshot["first-row-id"] = int(lineage_first)
    if cur_snap_id is not None and cur_snap_id != -1:
        snapshot["parent-snapshot-id"] = int(cur_snap_id)
    new_meta = dict(meta)
    if lineage_next is not None:
        new_meta["next-row-id"] = int(lineage_next)
    if evolved_schemas is not None:
        # the schema widens ATOMICALLY with the row changes (the
        # Delta evolve_schema twin): new schema-id, name-stable old
        # field ids, fresh ids for additions
        new_meta["schemas"] = evolved_schemas
        new_meta["current-schema-id"] = new_sid
        new_meta["last-column-id"] = max(
            f["id"] for f in evolved_fields
        )
        new_meta.pop("schema", None)
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = now_ms
    new_meta["snapshots"] = meta.get("snapshots", []) + [snapshot]
    if branch is not None:
        # branch DML advances the ref only; main lineage stays put
        new_refs = dict(meta.get("refs") or {})
        new_refs[branch] = {**new_refs[branch], "snapshot-id": snap_id}
        new_meta["refs"] = new_refs
    else:
        new_meta["current-snapshot-id"] = snap_id
        new_meta["snapshot-log"] = meta.get("snapshot-log", []) + [
            {"timestamp-ms": now_ms, "snapshot-id": snap_id}
        ]
    if new_specs != specs:
        new_meta["partition-specs"] = new_specs
    ice._write_metadata_version(path, new_v, new_meta)
    return snap_id


# --------------------------------------------------------- SQL layer

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[\w.]+)\s*(?:AS\s+)?(?P<talias>\w+)?"
    r"\s+USING\s+(?P<source>\([^)]*\)|[\w.]+)\s*(?:AS\s+)?"
    r"(?P<salias>\w+)?\s+ON\s+(?P<on>.*?)(?=\s+WHEN\s)(?P<clauses>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED"
    r"(?:\s+BY\s+(?P<by>SOURCE|TARGET))?\s*"
    r"(?:AND\s+(?P<cond>.*?))?\s*"
    r"THEN\s+(?P<act>UPDATE\s+SET\s+.*?|DELETE|INSERT\s+.*?)"
    r"(?=\s*WHEN\s+(?:NOT\s+)?MATCHED|\s*$)",
    re.IGNORECASE | re.DOTALL,
)


def _split_top(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parentheses/quotes."""
    out, depth, cur, q = [], 0, [], None
    for ch in text:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [s for s in out if s]


def merge_into_sql(
    spark: SparkSession,
    sql: str,
    catalog: dict[str, tuple[str, str]],
    evolve_schema: bool = False,
) -> int | None:
    """Parse and execute a constrained ANSI ``MERGE INTO`` statement.
    ``catalog`` maps table names to ``(format, path)``
    (format in {'delta','iceberg'}). The USING source is a registered
    temp view / table name or a parenthesized subquery; aliases
    default to ``t`` / ``s`` and arbitrary aliases are rewritten to
    them. Supports ordered WHEN MATCHED [AND cond] THEN UPDATE SET
    (col=expr... or *) / DELETE and WHEN NOT MATCHED THEN INSERT
    ((cols) VALUES (exprs) or *). ``evolve_schema=True`` widens the
    ``SET *`` / ``INSERT *`` expansions (and the Delta table schema)
    with source columns absent from the target."""
    text = sql.strip().rstrip(";")
    # lift a parenthesized USING subquery out before the regex (its
    # nested parens defeat a regex source matcher)
    subquery = None
    um = re.search(r"\bUSING\s*\(", text, re.IGNORECASE)
    if um:
        i = um.end() - 1
        depth, j = 0, i
        for j in range(i, len(text)):
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            raise ValueError("unbalanced parentheses in USING subquery")
        subquery = text[i + 1 : j]
        text = text[: i] + "__subquery__" + text[j + 1 :]
    m = _MERGE_RE.match(text)
    if not m:
        raise ValueError(
            "cannot parse MERGE statement (supported: MERGE INTO t "
            "USING s ON ... WHEN [NOT] MATCHED [AND ...] THEN "
            "UPDATE SET ...|DELETE|INSERT ...)"
        )
    tname = m.group("target")
    if tname not in catalog:
        raise ValueError(
            f"table {tname!r} not in catalog (have {sorted(catalog)})"
        )
    fmt, path = catalog[tname]
    src_ref = m.group("source").strip()
    if src_ref == "__subquery__":
        source = spark.sql(subquery)
    else:
        source = spark.table(src_ref)
    talias = m.group("talias") or "t"
    salias = m.group("salias") or "s"
    if talias.lower() == salias.lower():
        raise ValueError(
            f"target and source aliases collide ({talias!r}) — "
            "references cannot be attributed"
        )

    def _realias(expr: str) -> str:
        # ONE quote-aware pass rewriting both aliases simultaneously —
        # sequential re.sub corrupts expressions when an alias collides
        # with a canonical name (MERGE ... AS s USING ... AS t turned
        # 's.id = t.id' into 's.id = s.id') and rewrote matches inside
        # string literals (r10 ADVICE)
        tl, sl = talias.lower(), salias.lower()

        def _canon(word: str, at: int, after: int) -> str | None:
            # alias position: followed by '.', not itself a field
            # access (preceded by '.')
            if (
                after < len(expr)
                and expr[after] == "."
                and (at == 0 or expr[at - 1] != ".")
            ):
                lw = word.lower()
                if lw == tl:
                    return "t."
                if lw == sl:
                    return "s."
            return None

        out: list[str] = []
        i, n = 0, len(expr)
        while i < n:
            ch = expr[i]
            if ch in "'\"":
                # copy string literals verbatim, honoring BOTH escape
                # forms Spark SQL accepts: backslash ('a\'b') and
                # doubled quote ('a''b') — r11 ADVICE
                j = i + 1
                while j < n:
                    if expr[j] == "\\":
                        j += 2
                        continue
                    if expr[j] == ch:
                        if j + 1 < n and expr[j + 1] == ch:
                            j += 2  # doubled quote stays inside
                            continue
                        break
                    j += 1
                out.append(expr[i : min(j + 1, n)])
                i = j + 1
                continue
            if ch == "`":
                # backtick-quoted identifier (`` escapes a literal
                # backtick): an alias is an alias however it's quoted,
                # so `s`.id rewrites like s.id — r11 ADVICE
                j = i + 1
                content: list[str] = []
                while j < n:
                    if expr[j] == "`":
                        if j + 1 < n and expr[j + 1] == "`":
                            content.append("`")
                            j += 2
                            continue
                        break
                    content.append(expr[j])
                    j += 1
                canon = _canon("".join(content), i, j + 1)
                if canon is not None:
                    out.append(canon)
                    i = j + 2  # past closing backtick and the dot
                    continue
                out.append(expr[i : min(j + 1, n)])
                i = j + 1
                continue
            m = re.match(r"\w+", expr[i:])
            if m:
                word = m.group(0)
                j = i + len(word)
                canon = _canon(word, i, j)
                if canon is not None:
                    out.append(canon)
                    i = j + 1
                    continue
                out.append(word)
                i = j
                continue
            out.append(ch)
            i += 1
        return "".join(out)

    on = _realias(m.group("on").strip())
    # target schema for SET * / INSERT * expansion
    if fmt == "delta":
        import json as _json

        from census_asc5_data_pipeline_spark.sources import delta_io as d

        _p, meta, _a, _t = d._replay(spark, path, None)
        tgt_cols = [
            f["name"]
            for f in _json.loads(meta["schemaString"])["fields"]
        ]
    else:
        from census_asc5_data_pipeline_spark.sources import (
            iceberg_io as ice,
        )

        _v, imeta = ice._current_metadata(path)
        _sch, ifields = ice._schema_of(imeta)
        tgt_cols = [f["name"] for f in ifields]
    if evolve_schema:
        tgt_cols = tgt_cols + [
            c for c in source.columns if c not in tgt_cols
        ]
    star_extra = [c for c in source.columns if c not in tgt_cols]
    matched: list[MatchedClause] = []
    nmbs: list[MatchedClause] = []
    not_matched: list[tuple] = []
    for wm in _WHEN_RE.finditer(m.group("clauses")):
        cond = wm.group("cond")
        cond = _realias(cond.strip()) if cond else None
        act = wm.group("act").strip()
        up = act.upper()
        by = (wm.group("by") or "").upper()
        if wm.group("not") and by == "SOURCE":
            # delta-spark extension: act on TARGET rows with no
            # source match (expressions may reference t.* only)
            if up.startswith("DELETE"):
                nmbs.append(("delete", cond))
            elif up.startswith("UPDATE"):
                body = re.sub(
                    r"^UPDATE\s+SET\s+", "", act, flags=re.IGNORECASE
                ).strip()
                if body == "*":
                    raise ValueError(
                        "UPDATE SET * is meaningless in WHEN NOT "
                        "MATCHED BY SOURCE (no source row)"
                    )
                sets = {}
                for item in _split_top(body):
                    k, _, v = item.partition("=")
                    col = re.sub(
                        rf"^{re.escape(talias)}\.",
                        "",
                        k.strip(),
                        flags=re.IGNORECASE,
                    )
                    sets[col] = _realias(v.strip())
                nmbs.append(("update", cond, sets))
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE"
                )
            continue
        if wm.group("not"):
            if not up.startswith("INSERT"):
                raise ValueError(
                    "WHEN NOT MATCHED supports only INSERT"
                )
            body = act[len("INSERT"):].strip()
            if body == "*":
                if star_extra:
                    raise ValueError(
                        f"INSERT *: source column(s) {star_extra} are "
                        "not in the target schema — pass "
                        "evolve_schema=True to add them"
                    )
                not_matched.append(
                    (cond, {c: f"s.{c}" for c in tgt_cols})
                )
            else:
                bm = re.match(
                    r"^\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\)$",
                    body,
                    re.IGNORECASE | re.DOTALL,
                )
                if not bm:
                    raise ValueError(
                        f"cannot parse INSERT clause: {act!r}"
                    )
                cols = [c.strip() for c in bm.group("cols").split(",")]
                vals = _split_top(bm.group("vals"))
                if len(cols) != len(vals):
                    raise ValueError(
                        "INSERT column/value count mismatch"
                    )
                not_matched.append(
                    (cond, {c: _realias(v) for c, v in zip(cols, vals)})
                )
        elif up.startswith("DELETE"):
            matched.append(("delete", cond))
        elif up.startswith("UPDATE"):
            body = re.sub(
                r"^UPDATE\s+SET\s+", "", act, flags=re.IGNORECASE
            ).strip()
            if body == "*":
                if star_extra:
                    raise ValueError(
                        f"UPDATE SET *: source column(s) {star_extra} "
                        "are not in the target schema — pass "
                        "evolve_schema=True to add them"
                    )
                sets = {c: f"s.{c}" for c in tgt_cols}
            else:
                sets = {}
                for item in _split_top(body):
                    k, _, v = item.partition("=")
                    col = k.strip()
                    col = re.sub(
                        rf"^{re.escape(talias)}\.",
                        "",
                        col,
                        flags=re.IGNORECASE,
                    )
                    sets[col] = _realias(v.strip())
            matched.append(("update", cond, sets))
        else:
            raise ValueError(f"cannot parse WHEN clause action {act!r}")
    return merge_into(
        spark,
        fmt,
        path,
        source,
        on,
        matched,
        not_matched or None,
        not_matched_by_source=nmbs,
        evolve_schema=evolve_schema,
    )


def update_where(
    spark: SparkSession,
    fmt: str,
    path: str,
    predicate: str,
    sets: dict[str, str],
    mode: str = "cow",
    branch: str | None = None,
) -> int | None:
    """Row-level ``UPDATE <table> SET ... WHERE <predicate>`` — the
    third DML verb beside ``delete_*_where`` and :func:`merge_into`.
    ``predicate`` and the SET expressions are Spark SQL over the
    table's columns (no aliases; there is no source relation).

    - **Delta** ``mode='cow'``: the files holding matches are
      rewritten with the SET applied (untouched files never read);
      ``mode='dv'`` (delta-spark's DV-era UPDATE shape): old positions
      are DV-retired and the updated rows append as new files in the
      SAME commit — O(matched rows), no file rewrite. With CDF on,
      both modes stage update_preimage/update_postimage rows.
    - **Iceberg**: merge-on-read — ONE snapshot carrying a position
      delete of the matched rows + their updated images as new data
      files (:func:`_commit_iceberg_mor`).

    Returns the committed version/snapshot id, or None when nothing
    matched."""
    if branch is not None and fmt != "iceberg":
        raise ValueError(
            "branch writes are an Iceberg refs feature — Delta has "
            "no branch refs"
        )
    if fmt == "delta":
        return _update_delta(spark, path, predicate, sets, mode)
    if fmt == "iceberg":
        if mode != "cow":
            raise ValueError("iceberg UPDATE is always merge-on-read")
        return _update_iceberg(spark, path, predicate, sets, branch=branch)
    raise ValueError(f"unsupported format {fmt!r} (delta|iceberg)")


def _set_cols(sets, fields, pred=None):
    """Per-column projection applying SET where ``pred`` holds (or
    unconditionally when pred is None)."""
    cols = []
    for f in fields:
        if f.name in sets:
            e = F.expr(sets[f.name]).cast(f.dataType)
            if pred is not None:
                e = F.when(pred, e).otherwise(F.col(f.name))
            cols.append(e.alias(f.name))
        else:
            cols.append(F.col(f.name))
    return cols


def _update_delta(spark, path, predicate, sets, mode) -> int | None:
    import json

    from census_asc5_data_pipeline_spark.sources import delta_io as d

    if mode not in ("cow", "dv"):
        raise ValueError(f"unsupported mode {mode!r} (cow|dv)")
    # candidate selection through the distributed plane above the
    # checkpoint threshold (r14, the delete_delta_where discipline):
    # only stats-surviving adds reach the driver
    pruned = d._replay_pruned_spark(spark, path, None, None, predicate)
    if pruned is not None:
        protocol, meta, _cand_list, _tx = pruned
        adds = {a["path"]: a for a in _cand_list}
    else:
        protocol, meta, adds, _tx = d._replay(spark, path, None)
    d._writer_gate(protocol, meta, "UPDATE")
    physical_of = d._column_mapping(meta)
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = list(meta.get("partitionColumns") or [])
    # row tracking (r16): preserve stable ids through the rewrite and
    # expose _row_id to the WHERE predicate (the _merge_delta shape)
    rt_preserve = d._rt_supported(protocol) and d._rt_enabled(meta)
    rt_meta_line = None
    mat_id = mat_cv = None
    rt_extra: list[str] = []
    if rt_preserve:
        conf0 = meta.get("configuration") or {}
        conf2, mat_id, mat_cv = d._rt_mint_conf(conf0)
        if conf2 != conf0:
            meta = dict(meta, configuration=conf2)
            rt_meta_line = {
                "metaData": {
                    "id": meta.get("id"),
                    "format": meta.get("format")
                    or {"provider": "parquet", "options": {}},
                    "schemaString": meta["schemaString"],
                    "partitionColumns": pcols,
                    "configuration": conf2,
                    "createdTime": meta.get("createdTime"),
                }
            }
        rt_extra = [mat_id, mat_cv]
    gens = d._generated_columns(meta)
    bad_gen = {n for n, _e, _t in gens} & set(sets)
    if bad_gen:
        raise ValueError(
            f"cannot SET generated column(s) {sorted(bad_gen)} — they "
            "are recomputed from their generation expression"
        )
    bad_ident = {
        n for n, _d, _s, _st, _h, _a in d._identity_columns(meta)
    } & set(sets)
    if bad_ident:
        raise ValueError(
            f"cannot SET identity column(s) {sorted(bad_ident)} — "
            "their values are writer-allocated"
        )
    for c in sets:
        if c not in schema.fieldNames():
            raise ValueError(f"SET column {c!r} not in the table schema")
    if not adds and pruned is None:
        return None
    # stats-based candidate pruning (r13, the delete_delta_where
    # discipline): files whose stats prove the WHERE matches nothing
    # are neither read nor rewritten; the distributed plane (r14)
    # already pruned when it engaged
    from census_asc5_data_pipeline_spark.sources import delta_stats

    cand = list(adds.values())
    if pruned is None:
        atoms = delta_stats.parse_skip_predicate(predicate)
        if atoms is not None:
            cand = delta_stats.skip_files(
                cand, atoms, schema, pcols, physical_of,
                session_tz=spark.conf.get(
                    "spark.sql.session.timeZone", "UTC"
                ),
            )
    if not cand:
        return None
    scan = d._scan_adds(
        spark,
        path,
        schema,
        pcols,
        [(None, a) for a in cand],
        keep_pos=True,
        physical_of=physical_of,
        extra_long_cols=rt_extra,
    )
    if rt_preserve:
        scan = d._rt_stable_cols(spark, scan, cand, meta)
    pred = F.coalesce(F.expr(predicate), F.lit(False))
    # statement-scoped matched persist (r17): the matched rows feed
    # the constraint aggregate, the per-file hit counts / DV retire,
    # and the CDF pre-image staging — each a separate action that
    # re-scanned every candidate file on an uncached frame. Bounded
    # by the predicate's match count; released in the finally.
    matched = scan.filter(pred).persist()
    adds_by_base = d._adds_by_base(adds)
    now_ms = int(time.time() * 1000)
    lines: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "UPDATE",
                "operationParameters": {"predicate": predicate},
                "engineInfo": "census_asc5_data_pipeline_spark delta_io",
            }
        }
    ]
    if rt_meta_line:
        lines.append(rt_meta_line)
    planned: dict[str, dict | None] = {}
    staged_add_lines: list[dict] = []
    try:
        updated = d._regenerate(
            matched.select(
                _set_cols(sets, schema.fields)
                + (
                    [
                        F.col("_row_id").alias(mat_id),
                        F.lit(None).cast("long").alias(mat_cv),
                    ]
                    if rt_preserve
                    else []
                )
            ),
            meta,
            gens,
        )
        d._check_constraints(updated, meta, "UPDATE")
        if mode == "dv":
            # retire the old positions, append the updated images — the
            # delta-spark DV UPDATE commit shape
            n_upd = d._dv_retire(
                spark, path, protocol, matched, F.lit(True), adds_by_base,
                lines, planned, now_ms,
            )
            if not n_upd:
                return None
            staged_add_lines = d._stage_adds_mapped(
                updated, path, pcols, physical_of,
                stats_cols=d._stats_cols_of(meta),
                field_ids=d._mapping_ids(meta),
            )
            lines.extend(staged_add_lines)
        else:
            # per-file matched-row counts ride the SAME shuffle the old
            # distinct() took (r15: operationMetrics)
            hit_counts = {
                r["__base"]: int(r["n"])
                for r in matched
                .groupBy("__base")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            touched = sorted(hit_counts)
            if not touched:
                return None
            n_upd = sum(hit_counts.values())
            rewritten = d._regenerate(
                scan.filter(F.col("__base").isin(touched)).select(
                    _set_cols(sets, schema.fields, pred=pred)
                    + (
                        [
                            F.col("_row_id").alias(mat_id),
                            # updated rows reset to the new commit
                            # version (null materialized); copied rows
                            # keep their original
                            F.when(pred, F.lit(None).cast("long"))
                            .otherwise(F.col("__rt_cv"))
                            .cast("long")
                            .alias(mat_cv),
                        ]
                        if rt_preserve
                        else []
                    )
                ),
                meta,
                gens,
            )
            staged_add_lines = d._stage_adds_mapped(
                rewritten, path, pcols, physical_of,
                stats_cols=d._stats_cols_of(meta),
                field_ids=d._mapping_ids(meta),
            )
            lines.extend(staged_add_lines)
            for base in sorted(touched):
                a = adds_by_base[base]
                planned[a["path"]] = a.get("deletionVector")
                lines.append({"remove": d._remove_action(a, now_ms)})
        if (meta.get("configuration") or {}).get(
            "delta.enableChangeDataFeed"
        ) == "true":
            pre = matched.select(
                [F.col(f.name) for f in schema.fields]
            ).withColumn("_change_type", F.lit("update_preimage"))
            post = updated.select(
                [F.col(f"`{f.name}`") for f in schema.fields]
            ).withColumn("_change_type", F.lit("update_postimage"))
            lines.extend(
                d._stage_cdc_mapped(
                    pre.unionByName(post), path, pcols, physical_of,
                    field_ids=d._mapping_ids(meta),
                )
            )
        c = d._commit_counts(lines)
        dv_pairs = c["dv_adds"] if mode == "dv" else 0
        d._stamp_op_metrics(
            lines,
            numUpdatedRows=n_upd,
            numCopiedRows=(
                max(0, c["add_rows"] - n_upd)
                if mode == "cow" and c["add_rows"] is not None
                else (0 if mode == "dv" else None)
            ),
            numAddedFiles=c["adds"] - dv_pairs,
            numRemovedFiles=c["removes"] - dv_pairs,
            numDeletionVectorsAdded=dv_pairs if mode == "dv" else None,
            numAddedChangeFiles=c["cdc"],
        )
        while True:
            versions = d.delta_versions(path)
            ckpt = d._read_last_checkpoint(path)
            next_v = max(versions + ([ckpt] if ckpt is not None else [])) + 1
            live_now = d._live_subset(spark, path, frozenset(planned))
            for p_, dv in planned.items():
                cur = live_now.get(p_)
                if cur is None or cur.get("deletionVector") != dv:
                    raise ValueError(
                        f"concurrent commit changed {p_!r} since this "
                        "UPDATE was planned — aborting without committing"
                    )
            d._stamp_row_tracking(
                spark, path, protocol, lines, staged_add_lines, next_v
            )
            try:
                d._put_if_absent_commit(path, next_v, lines)
                d._maybe_auto_checkpoint(
                    spark, path, next_v, meta.get("configuration")
                )
                return next_v
            except FileExistsError:
                continue

    finally:
        matched.unpersist()


def _update_iceberg(spark, path, predicate, sets, branch=None) -> int | None:
    from census_asc5_data_pipeline_spark.sources import iceberg_io as ice

    cur_v, meta = ice._current_metadata(path)
    # v3 UPDATE preserves lineage and materializes defaults (r16):
    # see _merge_iceberg
    fv = ice._format_version_gate(
        meta, "UPDATE", write=True, v3_write_ok=True, defaults_ok=True,
    )
    branch_head = _branch_head(meta, branch)
    schema, fields = ice._schema_of(meta)
    defaulted = (
        [f for f in fields if f.get("initial-default") is not None]
        if fv >= 3
        else []
    )
    pcols = _spec_pcols(meta, fields, "UPDATE")
    for c in sets:
        if c not in schema.fieldNames():
            raise ValueError(f"SET column {c!r} not in the table schema")
    # bounds-based candidate pruning (r13, the _update_delta
    # discipline): files whose manifest metrics prove the WHERE
    # matches nothing are neither scanned nor position-deleted;
    # r14: partition-predicate atoms additionally skip WHOLE DATA
    # MANIFESTS via the manifest-list field summaries before any
    # Avro decodes (delete manifests always decode)
    from census_asc5_data_pipeline_spark.sources import delta_stats as dsk

    atoms = dsk.parse_skip_predicate(predicate)
    tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    pruner = (
        ice._manifest_summary_pruner(meta, fields, atoms, session_tz=tz)
        if atoms is not None
        else None
    )
    data_files, delete_fs = ice._snapshot_files(
        path, meta, branch_head, spark=spark, manifest_pruner=pruner
    )
    if not data_files:
        return None
    if atoms is not None:
        data_files = ice._skip_by_bounds(
            data_files, atoms, fields, meta, session_tz=tz
        )
    if not data_files:
        return None
    abs_of_base: dict[str, str] = {}
    for dd in data_files:
        ap = os.path.abspath(ice._local(dd["file_path"]))
        base = os.path.basename(ap)
        if base in abs_of_base and abs_of_base[base] != ap:
            raise ValueError(
                f"duplicate data-file basename {base!r} — cannot "
                "address positions unambiguously"
            )
        abs_of_base[base] = ap
    if defaulted:
        scan = ice._scan_with_defaults(
            spark, schema, fields, data_files, delete_fs, defaulted,
            keep_pos=True, lineage=True,
        ).drop("_last_updated_sequence_number")
    elif fv >= 3:
        scan = ice._lineage_scan(
            spark, schema, fields, data_files, delete_fs,
            keep_pos=True,
        ).drop("_last_updated_sequence_number")
    else:
        scan = ice._scan_with_deletes(
            spark, schema, fields, data_files, delete_fs, keep_pos=True
        )
    pred = F.coalesce(F.expr(predicate), F.lit(False))
    # statement-scoped matched persist (r17): the matched rows feed
    # the position-delete staging, the updated-image staging and the
    # required-field validation — each a separate action that re-ran
    # the full delete-aware/lineage scan on an uncached frame.
    # Bounded by the predicate's match count; released in the finally.
    matched = scan.filter(pred).persist()
    try:
        base_df = F.broadcast(
            spark.createDataFrame(
                sorted(abs_of_base.items()), "__base string, __abs string"
            )
        )
        pos_df = (
            matched.select("__base", "__ri")
            .join(base_df, "__base")
            .select(
                F.col("__abs").alias("file_path"),
                F.col("__ri").alias("pos"),
            )
        )
        if fv < 3:
            # each v2 parquet position-delete FILE stays sorted by
            # (file_path, pos) per spec: hash-cluster per file + sort
            # within partitions (AQE coalesces a small delete back to
            # one file; a 100 TB-scale delete spreads over many). v3
            # skips the shuffle — the DV grouping in the commit is its
            # own aggregate and _stage_dv_files sorts per blob.
            pos_df = pos_df.repartition(
                "file_path"
            ).sortWithinPartitions("file_path", "pos")
        new_rows = matched.select(
            _set_cols(sets, schema.fields)
            # updated rows keep their identity; the dropped null
            # _last_updated_sequence_number inherits the new file's
            # sequence number on read
            + ([F.col("_row_id")] if fv >= 3 else [])
        )
        return _commit_iceberg_mor(
            spark, path, cur_v, meta, pos_df, new_rows, pcols,
            branch=branch, existing_deletes=delete_fs,
        )
    finally:
        matched.unpersist()


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<target>[\w.]+)\s+SET\s+(?P<sets>.*?)"
    r"(?:\s+WHERE\s+(?P<pred>.*?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?:(?P<into>INTO)|(?P<over>OVERWRITE))\s+"
    r"(?:TABLE\s+)?(?P<target>[\w.]+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?(?P<body>(?:SELECT|VALUES)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?"
    r"(?P<target>[\w.]+)\s*(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_TAIL_RE = re.compile(
    r"^USING\s+(?P<fmt>\w+)\s*"
    # one paren-nesting level inside PARTITIONED BY: transform
    # entries like bucket(4, id)
    r"(?:PARTITIONED\s+BY\s*\((?P<pby>(?:[^()]|\([^()]*\))*)\)\s*)?"
    # liquid clustering (r16, Delta only — mutually exclusive with
    # PARTITIONED BY, enforced by the writer)
    r"(?:CLUSTER\s+BY\s*\((?P<cby>[^)]*)\)\s*)?"
    # TBLPROPERTIES accepted on either side of LOCATION (Spark's
    # grammar permits both orders)
    r"(?:TBLPROPERTIES\s*\((?P<props1>[^)]*)\)\s*)?"
    r"(?:LOCATION\s+'(?P<loc>[^']+)'\s*)?"
    r"(?:TBLPROPERTIES\s*\((?P<props2>[^)]*)\)\s*)?"
    r"(?:AS\s+(?P<body>SELECT\b.*))?$",
    re.IGNORECASE | re.DOTALL,
)


def _create_table(
    spark: SparkSession,
    sql_text: str,
    catalog: dict[str, tuple[str, str]],
) -> int | None:
    """``CREATE TABLE [IF NOT EXISTS] t (col TYPE, ...) USING
    delta|iceberg [PARTITIONED BY (...)] LOCATION '<path>'`` — plus
    the CTAS form (``... USING fmt [PARTITIONED BY ...] LOCATION
    '<path>' AS SELECT ...``). The column list parses through Spark's
    own DDL parser; PARTITIONED BY accepts the writers' vocabulary
    (identity columns, and for Iceberg bucket/truncate/year/month/day
    transforms). An empty CREATE commits version/snapshot 0 carrying
    only the schema (zero data files); CTAS writes the query result.
    The created table is registered into ``catalog`` under its name
    so subsequent DML statements in the same session resolve it.
    LOCATION is required (this engine is path-addressed — there is no
    warehouse root). Returns the committed version/snapshot id, or
    None when IF NOT EXISTS found an existing table."""
    cm = _CLONE_RE.match(sql_text)
    if cm:
        # CREATE TABLE t [SHALLOW|DEEP] CLONE s (delta-spark's clone
        # DDL, r13) — metadata-only (shallow, the default spelling
        # includes the keyword) or file-copying (deep); optional
        # VERSION/TIMESTAMP AS OF clones a historical state
        from census_asc5_data_pipeline_spark.sources.delta_io import (
            clone_delta,
        )

        src_name = cm.group("src")
        if src_name not in catalog:
            raise ValueError(
                f"CLONE source {src_name!r} not in catalog "
                f"(have {sorted(catalog)})"
            )
        sfmt, spath = catalog[src_name]
        if sfmt != "delta":
            raise ValueError(
                "CLONE is a Delta verb in this engine — source "
                f"{src_name!r} is {sfmt}"
            )
        dpath = cm.group("loc")
        exists = os.path.isdir(os.path.join(dpath, "_delta_log"))
        if exists and cm.group("ine"):
            catalog[cm.group("target")] = ("delta", dpath)
            return None
        ver = cm.group("ver")
        ts = cm.group("ts")
        ts_ms = None
        if ts is not None:
            import datetime as _dt

            ts_ms = int(
                _dt.datetime.fromisoformat(
                    ts.replace("Z", "+00:00")
                ).timestamp()
                * 1000
            ) if not ts.isdigit() else int(ts)
        v = clone_delta(
            spark,
            spath,
            dpath,
            shallow=(cm.group("kind") or "SHALLOW").upper()
            != "DEEP",
            version=int(ver) if ver is not None else None,
            timestamp_ms=ts_ms,
        )
        catalog[cm.group("target")] = ("delta", dpath)
        return v
    m = _CREATE_RE.match(sql_text)
    if not m:
        raise ValueError(f"cannot parse CREATE TABLE: {sql_text!r}")
    name = m.group("target")
    rest = m.group("rest").strip()
    cols_ddl = None
    if rest.startswith("("):
        # balanced extraction: column defs may nest parens (DECIMAL(10,2))
        depth = 0
        for j, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            raise ValueError("unbalanced parentheses in column list")
        cols_ddl = rest[1:j]
        rest = rest[j + 1 :].strip()
    tm = _CREATE_TAIL_RE.match(rest)
    if not tm:
        raise ValueError(
            f"cannot parse CREATE TABLE tail: {rest!r} (supported: "
            "USING delta|iceberg [PARTITIONED BY (...)] LOCATION "
            "'<path>' [AS SELECT ...])"
        )
    fmt = tm.group("fmt").lower()
    if fmt not in ("delta", "iceberg"):
        raise ValueError(f"unsupported format {fmt!r} (delta|iceberg)")
    path = tm.group("loc")
    if not path:
        raise ValueError(
            "CREATE TABLE requires LOCATION '<path>' — this engine is "
            "path-addressed (no warehouse root)"
        )
    body = tm.group("body")
    if cols_ddl is not None and body is not None:
        raise ValueError("pass a column list OR AS SELECT, not both")
    if cols_ddl is None and body is None:
        raise ValueError("CREATE TABLE needs a column list or AS SELECT")
    pby = [
        p.strip()
        for p in _split_top(tm.group("pby") or "")
        if p.strip()
    ]
    cby = [
        c.strip()
        for c in (tm.group("cby") or "").split(",")
        if c.strip()
    ]
    if cby and fmt != "delta":
        raise ValueError(
            "CLUSTER BY is Delta liquid clustering in this engine — "
            "use WRITE ORDERED BY (sort orders) for Iceberg"
        )
    exists = (
        os.path.isdir(os.path.join(path, "_delta_log"))
        if fmt == "delta"
        else os.path.isdir(os.path.join(path, "metadata"))
    )
    if exists:
        if m.group("ine"):
            catalog[name] = (fmt, path)
            return None
        raise ValueError(f"table at {path!r} already exists")
    props_raw = tm.group("props1") or tm.group("props2")
    props = _parse_props(props_raw) if props_raw else {}
    ident_meta: dict[str, dict] = {}
    if cols_ddl is not None:
        cols_ddl, ident_meta = _extract_identity(cols_ddl)
        if ident_meta and fmt != "delta":
            raise ValueError(
                "GENERATED … AS IDENTITY is a Delta feature "
                "(delta.identity.* column metadata)"
            )
    if body is not None:
        df = spark.sql(body)
    else:
        schema = T.StructType.fromDDL(cols_ddl)
        if ident_meta:
            schema = T.StructType(
                [
                    T.StructField(
                        f.name,
                        f.dataType,
                        f.nullable,
                        ident_meta.get(f.name, f.metadata),
                    )
                    for f in schema.fields
                ]
            )
            for icol in ident_meta:
                if not isinstance(
                    schema[icol].dataType, (T.LongType, T.IntegerType)
                ):
                    raise ValueError(
                        f"identity column {icol!r} must be BIGINT or "
                        f"INT, not {schema[icol].dataType.simpleString()}"
                    )
        df = spark.createDataFrame([], schema)
    if fmt == "delta":
        from census_asc5_data_pipeline_spark.sources.delta_io import (
            write_delta,
        )

        # configuration lands IN the version-0 metaData — CDF,
        # column mapping, appendOnly, constraints are live from the
        # very first commit (round-12 #4)
        v = write_delta(
            df, path, partition_by=pby or None,
            configuration=props or None,
            cluster_by=cby or None,
        )
    else:
        from census_asc5_data_pipeline_spark.sources.iceberg_io import (
            set_iceberg_properties,
            write_iceberg,
        )

        v = write_iceberg(df, path, partition_by=pby or None)
        if props:
            # iceberg properties are a metadata-only follow-up commit
            # (nothing in the staging path depends on them)
            set_iceberg_properties(path, props)
    catalog[name] = (fmt, path)
    return v


def _insert_into(spark, fmt, path, cols_clause, body, mode="append") -> int:
    """``INSERT INTO|OVERWRITE t [(cols)] SELECT ...|VALUES ...`` —
    the fourth DML verb (round-11): the body evaluates as a Spark SQL
    query, maps POSITIONALLY onto the named columns (or the full
    target schema), fills unnamed target columns with NULL, casts to
    the target types, and appends (INTO) or replaces (OVERWRITE)
    through the native writer in one commit/snapshot."""
    if fmt == "delta":
        import json as _json

        from census_asc5_data_pipeline_spark.sources import delta_io as d

        _p, meta, _a, _t = d._replay(spark, path, None)
        schema = d._strip_meta(
            T.StructType.fromJson(_json.loads(meta["schemaString"]))
        )
    else:
        from census_asc5_data_pipeline_spark.sources import (
            iceberg_io as ice,
        )

        _v, imeta = ice._current_metadata(path)
        schema, _ifields = ice._schema_of(imeta)
    df = spark.sql(body)
    if cols_clause:
        names = [c.strip() for c in cols_clause.split(",")]
        unknown = [n for n in names if n not in schema.fieldNames()]
        if unknown:
            raise ValueError(
                f"INSERT column(s) {unknown} not in the table schema"
            )
    else:
        names = schema.fieldNames()
    if len(df.columns) != len(names):
        raise ValueError(
            f"INSERT provides {len(df.columns)} column(s) for "
            f"{len(names)} target column(s)"
        )
    by_target = dict(zip(names, df.columns))
    gen_unnamed: set[str] = set()
    if fmt == "delta":
        # generated/identity columns the INSERT does not name are
        # left OUT of the frame (not NULL-filled) so write_delta
        # COMPUTES/ALLOCATES them; named ones validate (generated) or
        # ratchet the high water mark (identity, BY DEFAULT only)
        gen_unnamed = (
            {n for n, _e, _t in d._generated_columns(meta)}
            | {
                n
                for n, _d, _s, _st, _h, _a in d._identity_columns(
                    meta
                )
            }
        ) - set(by_target)
    out = df.select(
        [
            F.col(by_target[f.name]).cast(f.dataType).alias(f.name)
            if f.name in by_target
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name not in gen_unnamed
        ]
    )
    if fmt == "delta":
        from census_asc5_data_pipeline_spark.sources.delta_io import (
            write_delta,
        )

        return write_delta(out, path, mode=mode)
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        write_iceberg,
    )

    return write_iceberg(out, path, mode=mode)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<target>[\w.]+)"
    r"(?:\s+WHERE\s+(?P<pred>.*?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<target>[\w.]+)\s+(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_ADD_COLS_RE = re.compile(
    r"^ADD\s+COLUMNS?\s*(?:\((?P<pcols>(?:[^()]|\([^()]*\))*)\)"
    r"|(?P<bcols>.+?))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SET_PROPS_RE = re.compile(
    r"^SET\s+TBLPROPERTIES\s*\((?P<props>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UNSET_PROPS_RE = re.compile(
    r"^UNSET\s+TBLPROPERTIES\s*\((?P<keys>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COPY_INTO_RE = re.compile(
    r"^\s*COPY\s+INTO\s+(?P<target>[\w.]+)\s+"
    r"FROM\s+'(?P<src>[^']+)'\s+"
    r"FILEFORMAT\s*=\s*(?P<fmt>PARQUET|CSV|JSON)"
    r"(?:\s+PATTERN\s*=\s*'(?P<pattern>[^']+)')?"
    r"(?:\s+FORMAT_OPTIONS\s*\(\s*(?P<fopts>[^)]*)\)\s*)?"
    r"(?:\s+COPY_OPTIONS\s*\(\s*(?P<copts>[^)]*)\)\s*)?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def copy_into(
    spark: SparkSession,
    path: str,
    src: str,
    fileformat: str,
    pattern: str | None = None,
    format_options: dict[str, str] | None = None,
    force: bool = False,
) -> int | None:
    """delta-spark's ``COPY INTO`` (r13): IDEMPOTENT bulk file
    loading — each run lists the files under ``src`` (``pattern`` is
    an fnmatch glob over the src-relative path), subtracts every file
    a prior COPY INTO commit already recorded, reads only the NEW
    ones with the table's schema, and appends them in one commit
    whose commitInfo carries the loaded-file list — the commit log IS
    the idempotency ledger, so re-running after a crash or on a
    schedule never double-loads (``force=True`` reloads everything).
    Returns the committed version, or None when there is nothing new.

    Durability (r13 ADVICE): checkpoints don't retain commitInfo and
    ``vacuum_delta`` prunes log JSONs below the latest checkpoint, so
    the log alone forgets old loads.  Every successful COPY INTO also
    folds the full loaded-file set into a sidecar ledger
    (``_delta_log/_copy_into_ledger.json``, atomic-rename write) that
    vacuum never touches; the replay below takes the UNION of ledger
    + surviving commitInfo lines, so a crash between commit and
    ledger write self-heals on the next run from the still-unpruned
    log JSON.

    Scale notes: the ledger replay is O(commits) driver-side metadata
    (the describe_history loop); the data read is one multi-path
    Spark scan over exactly the new files."""
    import fnmatch
    import glob as _glob
    import json

    from census_asc5_data_pipeline_spark.sources import delta_io as d

    fileformat = fileformat.lower()
    if fileformat not in ("parquet", "csv", "json"):
        raise ValueError(
            f"FILEFORMAT {fileformat!r} (parquet|csv|json)"
        )
    _p, meta, _adds, _tx = d._replay(spark, path, None)
    d._writer_gate(_p, meta, "WRITE")
    schema = d._strip_meta(
        T.StructType.fromJson(json.loads(meta["schemaString"]))
    )
    ledger_fp = os.path.join(path, "_delta_log", "_copy_into_ledger.json")
    loaded: set[str] = set()
    try:
        with open(ledger_fp) as fh:
            prior = json.load(fh).get("files", [])
        if isinstance(prior, list):
            loaded.update(str(p) for p in prior)
    except (OSError, ValueError, TypeError):
        pass
    for v in d.delta_versions(path):
        with open(d._commit_file(path, v)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                ci = action.get("commitInfo")
                if ci is None:
                    continue
                if ci.get("operation") == "COPY INTO":
                    try:
                        loaded.update(
                            json.loads(
                                (ci.get("operationParameters") or {})
                                .get("files", "[]")
                            )
                        )
                    except (TypeError, ValueError):
                        pass
                break
    src = os.path.abspath(src)
    cands = sorted(
        p
        for p in _glob.glob(os.path.join(src, "**"), recursive=True)
        if os.path.isfile(p)
        and not os.path.basename(p).startswith((".", "_"))
        and (
            pattern is None
            or fnmatch.fnmatch(os.path.relpath(p, src), pattern)
        )
    )
    new = [
        p
        for p in cands
        if force or os.path.abspath(p) not in loaded
    ]
    if not new:
        return None
    reader = spark.read.format(fileformat)
    for k, v in (format_options or {}).items():
        reader = reader.option(k, v)
    if fileformat in ("csv", "json"):
        reader = reader.schema(schema)
    df = reader.load(new)
    out = df.select(
        [
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
    version = d.write_delta(
        out,
        path,
        commit_operation="COPY INTO",
        commit_params={
            "files": json.dumps(
                sorted(os.path.abspath(p) for p in new)
            ),
            "source": src,
            "fileformat": fileformat,
        },
    )
    # fold the union into the vacuum-proof sidecar ledger; a failure
    # here is safe — the just-committed JSON still carries the list
    # and the next run re-merges it
    try:
        tmp = f"{ledger_fp}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "files": sorted(
                        loaded | {os.path.abspath(p) for p in new}
                    )
                },
                fh,
            )
        os.replace(tmp, ledger_fp)
    except OSError:
        pass
    return version


_WRITE_ORDERED_RE = re.compile(
    r"^WRITE\s+(?:(?P<unordered>UNORDERED)"
    r"|ORDERED\s+BY\s*\(\s*(?P<cols>.+?)\s*\))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_PARTITION_FIELD_RE = re.compile(
    r"^(?P<verb>ADD|DROP)\s+PARTITION\s+FIELD\s+(?P<field>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_RENAME_COL_RE = re.compile(
    r"^RENAME\s+COLUMN\s+(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*$",
    re.IGNORECASE,
)
_DROP_COLS_RE = re.compile(
    r"^DROP\s+COLUMNS?\s*(?:\((?P<pcols>[^)]*)\)|(?P<bcols>[\w,\s]+?))\s*$",
    re.IGNORECASE,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<target>[\w.]+)"
    r"(?:\s+ZORDER\s+BY\s*\(?(?P<zcols>[\w.,\s]*?)\)?)?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?P<target>[\w.]+)"
    r"(?:\s+RETAIN\s+(?P<keep>\d+)\s+(?P<unit>VERSIONS|HOURS))?\s*$",
    re.IGNORECASE,
)
_CALL_RE = re.compile(
    r"^\s*CALL\s+(?:[\w]+\.)*(?P<proc>\w+)\s*\((?P<args>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+(?:TABLE\s+)?(?P<target>[\w.]+)\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>\d+|'[^']*'))\s*$",
    re.IGNORECASE,
)
_PROP_PAIR_RE = re.compile(r"'(?P<k>(?:[^'\\]|\\.)*)'\s*=\s*'(?P<v>(?:[^'\\]|\\.)*)'")


_CLONE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<target>[\w.]+)\s+(?:(?P<kind>SHALLOW|DEEP)\s+)?CLONE\s+"
    r"(?P<src>[\w.]+)"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?"
    r"\s+LOCATION\s+'(?P<loc>[^']+)'\s*$",
    re.IGNORECASE,
)

_IDENTITY_CLAUSE_RE = re.compile(
    r"\s+GENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY"
    r"(?:\s*\(\s*(?:START\s+WITH\s+(-?\d+)\s*)?"
    r"(?:INCREMENT\s+BY\s+(-?\d+)\s*)?\))?",
    re.IGNORECASE,
)


def _extract_identity(
    cols_ddl: str,
) -> tuple[str, dict[str, dict]]:
    """Pre-parse ``col BIGINT GENERATED ALWAYS|BY DEFAULT AS IDENTITY
    [(START WITH n [INCREMENT BY k])]`` out of the CREATE column list
    (delta-spark's identity DDL; Spark's own DDL parser doesn't know
    the clause) → (cleaned ddl, {col: delta.identity.* metadata}).
    ALWAYS refuses explicit inserts; BY DEFAULT accepts them and
    ratchets the high water mark (delta_io._apply_identity)."""
    out_cols: list[str] = []
    meta: dict[str, dict] = {}
    for chunk in _split_top(cols_ddl):
        m = _IDENTITY_CLAUSE_RE.search(chunk)
        if not m:
            out_cols.append(chunk)
            continue
        cleaned = (
            chunk[: m.start()] + chunk[m.end() :]
        ).strip()
        name = cleaned.split()[0].strip("`")
        step = int(m.group(3) or 1)
        if step == 0:
            raise ValueError(
                f"identity column {name!r}: INCREMENT BY 0"
            )
        meta[name] = {
            "delta.identity.start": int(m.group(2) or 1),
            "delta.identity.step": step,
            "delta.identity.allowExplicitInsert": (
                m.group(1).upper() != "ALWAYS"
            ),
        }
        out_cols.append(cleaned)
    return ", ".join(c.strip() for c in out_cols), meta


def _parse_props(text: str) -> dict[str, str]:
    """TBLPROPERTIES body: 'k'='v' [, ...] — quoted keys and values
    only (the Spark SQL surface); anything unquoted raises."""
    pairs = dict(
        (m.group("k"), m.group("v"))
        for m in _PROP_PAIR_RE.finditer(text)
    )
    leftover = _PROP_PAIR_RE.sub("", text).replace(",", "").strip()
    if leftover or not pairs:
        raise ValueError(
            f"cannot parse TBLPROPERTIES body {text!r} "
            "(expected 'key'='value', ...)"
        )
    return pairs


_TT_SUFFIX = (
    r"(?:"
    r"\s+FOR\s+SYSTEM_VERSION\s+AS\s+OF\s+(?P<sv>\d+|'[^']*')"
    r"|\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?P<st>\d+|'[^']*')"
    r"|\s+VERSION\s+AS\s+OF\s+(?P<v>\d+|'[^']*')"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+(?P<t>\d+|'[^']*')"
    r")?"
)


def _view_cycle_check(
    name: str,
    catalog: dict[str, tuple[str, str]],
    _stack: tuple = (),
) -> None:
    """Refuse view definitions whose reference graph cycles — a pure
    textual DFS BEFORE any evaluation, because evaluation re-enters
    :func:`query_sql` with a fresh stack."""
    if name in _stack:
        raise ValueError(
            f"view {name!r} participates in a reference cycle "
            f"({' -> '.join(_stack + (name,))})"
        )
    body = catalog[name][1]
    for vname, entry in list(catalog.items()):
        if entry[0] == "view" and re.search(
            rf"\b{re.escape(vname)}\b", body, re.IGNORECASE
        ):
            _view_cycle_check(vname, catalog, _stack + (name,))


def _expand_view(
    spark: SparkSession,
    name: str,
    catalog: dict[str, tuple[str, str]],
) -> None:
    """Evaluate a stored CREATE VIEW definition and register it as a
    temp view under its own name (recursive — a view may reference
    other views/tables; cycles refuse up front)."""
    _view_cycle_check(name, catalog)
    query_sql(spark, catalog[name][1], catalog).createOrReplaceTempView(
        name
    )


_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?VIEW\s+"
    r"(?P<name>[\w.]+)\s+AS\s+(?P<body>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+(?P<kind>TABLE|VIEW)\s+(?P<ine>IF\s+EXISTS\s+)?"
    r"(?P<name>[\w.]+)\s*(?P<purge>PURGE)?\s*$",
    re.IGNORECASE,
)
_DESCRIBE_RE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+(?:(?P<kind>HISTORY|DETAIL|TABLE)\s+)?"
    r"(?P<target>[\w.]+)\s*$",
    re.IGNORECASE,
)


def _show_create_table(
    spark: SparkSession,
    name: str,
    catalog: dict[str, tuple[str, str]],
):
    """``SHOW CREATE TABLE t`` (r14): reconstruct a runnable
    :func:`dml_sql` CREATE statement from the live metadata — column
    list with NOT NULL, PARTITIONED BY (Iceberg specs render their
    transforms back to the DDL vocabulary), LOCATION, TBLPROPERTIES.
    Views render their stored definition."""
    import json as _json

    from census_asc5_data_pipeline_spark.sources import delta_io as d
    from census_asc5_data_pipeline_spark.sources import iceberg_io as ice

    if name not in catalog:
        raise ValueError(
            f"table {name!r} not in catalog (have {sorted(catalog)})"
        )
    fmt, path = catalog[name]
    if fmt == "view":
        stmt = f"CREATE VIEW {name} AS {path}"
        return spark.createDataFrame(
            [(stmt,)], "createtab_stmt string"
        )
    if fmt == "delta":
        _p, meta, _adds, _tx = d._replay(spark, path, None)
        schema = T.StructType.fromJson(
            _json.loads(meta["schemaString"])
        )
        cols = [
            f"{f.name} {f.dataType.simpleString().upper()}"
            + ("" if f.nullable else " NOT NULL")
            for f in schema.fields
        ]
        pby = list(meta.get("partitionColumns") or [])
        props = dict(meta.get("configuration") or {})
    else:
        _v, meta = ice._current_metadata(path)
        _sch, fields = ice._schema_of(meta, allow_renames=True)
        by_id = {f["id"]: f for f in fields}
        cols = [
            f"{f['name']} {str(f['type']).upper()}"
            + (" NOT NULL" if f.get("required") else "")
            for f in fields
        ]
        specs = meta.get("partition-specs") or (
            [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
        )
        sid = int(meta.get("default-spec-id", 0))
        spec = next(
            (s for s in specs if int(s.get("spec-id", 0)) == sid),
            {"fields": []},
        )
        pby = []
        for pf in spec.get("fields", []):
            src = by_id.get(pf["source-id"], {}).get(
                "name", pf["name"]
            )
            tr = pf.get("transform", "identity")
            if tr == "identity":
                pby.append(src)
            elif tr.startswith("bucket["):
                pby.append(f"bucket({tr[7:-1]}, {src})")
            elif tr.startswith("truncate["):
                pby.append(f"truncate({tr[9:-1]}, {src})")
            elif tr != "void":
                pby.append(f"{tr}({src})")
        props = dict(meta.get("properties") or {})
    stmt = f"CREATE TABLE {name} (\n  " + ",\n  ".join(cols) + "\n)"
    stmt += f"\nUSING {fmt}"
    if pby:
        stmt += f"\nPARTITIONED BY ({', '.join(pby)})"
    stmt += f"\nLOCATION '{os.path.abspath(path)}'"
    if props:
        kv = ", ".join(
            f"'{k}'='{v}'" for k, v in sorted(props.items())
        )
        stmt += f"\nTBLPROPERTIES ({kv})"
    return spark.createDataFrame([(stmt,)], "createtab_stmt string")


def _describe_sql(
    spark: SparkSession,
    text: str,
    catalog: dict[str, tuple[str, str]],
):
    """DESCRIBE [TABLE] / DESCRIBE HISTORY / DESCRIBE DETAIL over the
    statement catalog (r14)."""
    import json as _json

    from census_asc5_data_pipeline_spark.sources import delta_io as d
    from census_asc5_data_pipeline_spark.sources import iceberg_io as ice

    m = _DESCRIBE_RE.match(text)
    if not m:
        raise ValueError(f"cannot parse DESCRIBE statement: {text!r}")
    name = m.group("target")
    if name not in catalog:
        raise ValueError(
            f"table {name!r} not in catalog (have {sorted(catalog)})"
        )
    fmt, path = catalog[name]
    kind = (m.group("kind") or "TABLE").upper()
    if fmt == "view":
        if kind != "TABLE":
            raise ValueError(f"{name!r} is a view — DESCRIBE {name} only")
        _expand_view(spark, name, catalog)
        df = spark.table(name)
        return spark.createDataFrame(
            [
                (f.name, f.dataType.simpleString(), f.nullable, False)
                for f in df.schema.fields
            ],
            "col_name string, data_type string, nullable boolean, "
            "is_partition boolean",
        )
    if kind == "HISTORY":
        if fmt == "delta":
            return d.describe_history(spark, path)
        return ice.read_iceberg_meta(spark, path, "history")
    if kind == "DETAIL":
        if fmt == "delta":
            return d.describe_detail(spark, path)
        cur_v, meta = ice._current_metadata(path)
        _sch, fields = ice._schema_of(meta, allow_renames=True)
        specs = meta.get("partition-specs") or (
            [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
        )
        sid = int(meta.get("default-spec-id", 0))
        spec = next(
            (s for s in specs if int(s.get("spec-id", 0)) == sid),
            {"fields": []},
        )
        row = (
            "iceberg",
            str(meta.get("table-uuid") or ""),
            os.path.abspath(path),
            [f["name"] for f in spec.get("fields", [])],
            len(meta.get("snapshots", [])),
            int(meta.get("current-snapshot-id") or -1),
            {
                str(k): str(v)
                for k, v in (meta.get("properties") or {}).items()
            },
            int(meta.get("format-version", 1)),
        )
        return spark.createDataFrame(
            [row],
            "format string, id string, location string, "
            "partition_columns array<string>, num_snapshots bigint, "
            "current_snapshot_id bigint, properties map<string,string>, "
            "format_version int",
        )
    # DESCRIBE [TABLE]: columns + partition flags off the metadata
    if fmt == "delta":
        _p, meta, _adds, _tx = d._replay(spark, path, None)
        schema = T.StructType.fromJson(_json.loads(meta["schemaString"]))
        pcols = set(meta.get("partitionColumns") or [])
        rows = [
            (f.name, f.dataType.simpleString(), f.nullable, f.name in pcols)
            for f in schema.fields
        ]
    else:
        _v, meta = ice._current_metadata(path)
        _sch, fields = ice._schema_of(meta, allow_renames=True)
        by_id = {f["id"]: f for f in fields}
        specs = meta.get("partition-specs") or (
            [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
        )
        psrc = {
            by_id[pf["source-id"]]["name"]
            for s in specs
            for pf in s.get("fields", [])
            if pf.get("transform", "identity") == "identity"
            and pf["source-id"] in by_id
        }
        rows = [
            (
                f["name"],
                str(f["type"]),
                not f.get("required", False),
                f["name"] in psrc,
            )
            for f in fields
        ]
    return spark.createDataFrame(
        rows,
        "col_name string, data_type string, nullable boolean, "
        "is_partition boolean",
    )


def query_sql(
    spark: SparkSession,
    sql: str,
    catalog: dict[str, tuple[str, str]],
):
    """The READ-side SQL router (round-13 verdict #4): run a SELECT
    over catalog tables with the time-travel clauses lakehouse users
    actually type —

    - ``SELECT ... FROM t VERSION AS OF 3`` (delta-spark / Spark SQL)
    - ``SELECT ... FROM t TIMESTAMP AS OF '2024-01-15 12:00:00'``
      (naive strings resolve in the session timezone, the
      delta-spark rule; integers are epoch millis)
    - ``FROM t FOR SYSTEM_VERSION AS OF <snapshot-id>`` /
      ``FOR SYSTEM_TIME AS OF ...`` (the Spark-Iceberg spelling)
    - ``VERSION AS OF 'branch_or_tag'`` — a QUOTED version resolves
      as an Iceberg ref name (Spark-Iceberg semantics), so the WAP
      audit step is plain SQL.

    Each time-traveled reference is resolved through the native
    readers (``read_delta(version=/timestamp_ms=)`` /
    ``read_iceberg(snapshot_id=/ref=)``), registered as an immutable
    temp view, and the statement is rewritten to read the view; bare
    catalog references register the CURRENT table under its own name.
    Returns the result DataFrame. (The statement front-end twin of
    :func:`dml_sql`, which keeps the write verbs.)

    Catalog introspection verbs (r14 — r13 verdict #6, the SQL
    surface users previously had to drop to Python for):
    ``SHOW TABLES [LIKE 'pat']`` (name/format/location over the
    catalog, views included), ``DESCRIBE [TABLE] t`` (columns +
    partition flags), ``DESCRIBE HISTORY t`` (Delta commit history /
    Iceberg snapshot-log), ``DESCRIBE DETAIL t`` (one-row state
    summary, both formats). ``CREATE VIEW`` definitions (stored in
    the catalog by :func:`dml_sql`) expand recursively on
    reference."""
    from census_asc5_data_pipeline_spark.sources import delta_io as d
    from census_asc5_data_pipeline_spark.sources import iceberg_io as ice
    from census_asc5_data_pipeline_spark.sources.delta_stream_source import (
        _parse_ts_ms,
    )

    text = sql.strip().rstrip(";")
    head = text.lstrip().split(None, 1)[0].upper() if text.strip() else ""
    if head == "SHOW":
        cm = re.match(
            r"^\s*SHOW\s+CREATE\s+TABLE\s+(?P<target>[\w.]+)\s*$",
            text,
            re.IGNORECASE,
        )
        if cm:
            return _show_create_table(
                spark, cm.group("target"), catalog
            )
        m = re.match(
            r"^\s*SHOW\s+TABLES\s*(?:LIKE\s+'(?P<pat>[^']*)')?\s*$",
            text,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse SHOW statement: {sql!r}")
        import fnmatch

        pat = m.group("pat")
        rows = [
            (n, fmt, "" if fmt == "view" else loc)
            for n, (fmt, loc) in sorted(catalog.items())
            if pat is None or fnmatch.fnmatch(n, pat)
        ]
        return spark.createDataFrame(
            rows, "table_name string, format string, location string"
        )
    if head in ("DESCRIBE", "DESC"):
        return _describe_sql(spark, text, catalog)
    for vname, entry in list(catalog.items()):
        if entry[0] == "view" and re.search(
            rf"\b{re.escape(vname)}\b", text, re.IGNORECASE
        ):
            _expand_view(spark, vname, catalog)

    def _ts_ms(tok: str) -> int:
        # naive strings resolve in the session timezone inside
        # _parse_ts_ms (it reads the active session)
        return _parse_ts_ms(tok[1:-1] if tok.startswith("'") else tok)

    for name, (fmt, path) in catalog.items():
        if fmt == "view":
            continue  # already registered by _expand_view above
        pat = re.compile(
            rf"\b{re.escape(name)}\b" + _TT_SUFFIX, re.IGNORECASE
        )

        def _repl(m, fmt=fmt, path=path, name=name):
            ver = m.group("sv") or m.group("v")
            ts = m.group("st") or m.group("t")
            if ver is None and ts is None:
                if fmt == "delta":
                    d.read_delta(spark, path).createOrReplaceTempView(name)
                else:
                    ice.read_iceberg(spark, path).createOrReplaceTempView(
                        name
                    )
                return name
            if ver is not None and ver.startswith("'"):
                if fmt != "iceberg":
                    raise ValueError(
                        f"VERSION AS OF {ver} on {name!r}: named "
                        "version refs are an Iceberg feature — Delta "
                        "versions are integers"
                    )
                ref = ver[1:-1]
                df = ice.read_iceberg(spark, path, ref=ref)
                vname = f"{name}__asof_ref_{re.sub(r'[^A-Za-z0-9_]', '_', ref)}"
            elif fmt == "delta":
                if ver is not None:
                    df = d.read_delta(spark, path, version=int(ver))
                    vname = f"{name}__asof_v{ver}"
                else:
                    ms = _ts_ms(ts)
                    df = d.read_delta(spark, path, timestamp_ms=ms)
                    vname = f"{name}__asof_t{ms}"
            else:
                if ver is not None:
                    df = ice.read_iceberg(
                        spark, path, snapshot_id=int(ver)
                    )
                    vname = f"{name}__asof_v{ver}"
                else:
                    ms = _ts_ms(ts)
                    sid = ice.snapshot_as_of_timestamp_iceberg(path, ms)
                    df = ice.read_iceberg(spark, path, snapshot_id=sid)
                    vname = f"{name}__asof_t{ms}"
            df.createOrReplaceTempView(vname)
            return vname

        text = pat.sub(_repl, text)
    return spark.sql(text)


def dml_sql(
    spark: SparkSession,
    sql: str,
    catalog: dict[str, tuple[str, str]],
) -> int | None:
    """One SQL entry point for the write-side verbs over both table
    formats: routes ``MERGE INTO`` to :func:`merge_into_sql`,
    ``INSERT INTO t [(cols)] SELECT ...|VALUES ...`` to the append
    writers (:func:`_insert_into`), ``UPDATE t SET ... [WHERE ...]``
    to :func:`update_where`, and ``DELETE FROM t [WHERE ...]`` to the
    native row-level deletes (:func:`delta_io.delete_delta_where` /
    :func:`iceberg_io.delete_iceberg_positions`). ``catalog`` maps
    table names to ``(format, path)``. Returns the committed
    version/snapshot id (None = no-op).

    Round-12 #4 completers: ``ALTER TABLE t ADD COLUMN(S) ...`` /
    ``ALTER TABLE t SET TBLPROPERTIES ('k'='v', ...)`` /
    ``OPTIMIZE t [ZORDER BY (c, ...)]`` / ``VACUUM t [RETAIN n
    VERSIONS | RETAIN n HOURS]`` (version-count retention stays the
    deterministic test surface; RETAIN n HOURS is delta-spark's
    time-based retention — r14 — resolving versions/snapshots by
    commit timestamp, boundary-at-cutoff retained), and CREATE TABLE
    takes a TBLPROPERTIES clause (see :func:`_create_table`)."""
    text = sql.strip().rstrip(";")
    head = text.lstrip().split(None, 1)[0].upper() if text.strip() else ""
    if head == "MERGE":
        return merge_into_sql(spark, text, catalog)
    if head == "CREATE":
        vm = _CREATE_VIEW_RE.match(text)
        if vm:
            name = vm.group("name")
            exists = catalog.get(name)
            if exists is not None and not vm.group("replace"):
                raise ValueError(
                    f"{name!r} already exists "
                    f"({exists[0]}) — use CREATE OR REPLACE VIEW"
                )
            if exists is not None and exists[0] != "view":
                raise ValueError(
                    f"cannot replace {exists[0]} table {name!r} with a "
                    "view"
                )
            body = vm.group("body").strip()
            catalog[name] = ("view", body)
            # validate eagerly (plan only, no job): a broken
            # definition should fail at CREATE, not first SELECT
            try:
                _expand_view(spark, name, catalog)
            except Exception:
                del catalog[name]
                raise
            return None
        return _create_table(spark, text, catalog)
    if head == "DROP":
        dm = _DROP_RE.match(text)
        if not dm:
            raise ValueError(f"cannot parse DROP statement: {sql!r}")
        name = dm.group("name")
        want_view = dm.group("kind").upper() == "VIEW"
        entry = catalog.get(name)
        if entry is None:
            if dm.group("ine"):
                return None
            raise ValueError(
                f"{'view' if want_view else 'table'} {name!r} not in "
                f"catalog (have {sorted(catalog)})"
            )
        is_view = entry[0] == "view"
        if is_view != want_view:
            raise ValueError(
                f"{name!r} is a {'view' if is_view else 'table'} — use "
                f"DROP {'VIEW' if is_view else 'TABLE'}"
            )
        del catalog[name]
        spark.catalog.dropTempView(name)
        if dm.group("purge"):
            if is_view:
                raise ValueError("PURGE applies to tables, not views")
            import shutil as _sh

            _sh.rmtree(entry[1], ignore_errors=True)
        return None
    if head == "COPY":
        cm = _COPY_INTO_RE.match(text)
        if not cm:
            raise ValueError(f"cannot parse COPY INTO: {sql!r}")
        name = cm.group("target")
        if name not in catalog:
            raise ValueError(
                f"table {name!r} not in catalog (have {sorted(catalog)})"
            )
        fmt, path = catalog[name]
        if fmt != "delta":
            raise ValueError(
                "COPY INTO is a Delta verb in this engine — "
                f"{name!r} is {fmt}"
            )
        copts = (
            _parse_props(cm.group("copts")) if cm.group("copts") else {}
        )
        return copy_into(
            spark,
            path,
            cm.group("src"),
            cm.group("fmt"),
            pattern=cm.group("pattern"),
            format_options=(
                _parse_props(cm.group("fopts"))
                if cm.group("fopts")
                else None
            ),
            force=str(copts.get("force", "")).lower() == "true",
        )

    def _resolve(name):
        if name not in catalog:
            raise ValueError(
                f"table {name!r} not in catalog (have {sorted(catalog)})"
            )
        if catalog[name][0] == "view":
            raise ValueError(
                f"{name!r} is a view — write verbs need a table"
            )
        return catalog[name]

    if head == "ALTER":
        m = _ALTER_RE.match(text)
        if not m:
            raise ValueError(f"cannot parse ALTER TABLE: {sql!r}")
        fmt, path = _resolve(m.group("target"))
        rest = m.group("rest").strip()
        am = _ADD_COLS_RE.match(rest)
        if am:
            cols = (am.group("pcols") or am.group("bcols")).strip()
            if fmt == "delta":
                from census_asc5_data_pipeline_spark.sources.delta_io import (
                    add_delta_columns,
                )

                return add_delta_columns(spark, path, cols)
            from census_asc5_data_pipeline_spark.sources.iceberg_io import (
                add_iceberg_columns,
            )

            return add_iceberg_columns(path, cols)
        pm = _SET_PROPS_RE.match(rest)
        if pm:
            props = _parse_props(pm.group("props"))
            if fmt == "delta":
                from census_asc5_data_pipeline_spark.sources.delta_io import (
                    set_delta_properties,
                )

                return set_delta_properties(spark, path, props)
            from census_asc5_data_pipeline_spark.sources.iceberg_io import (
                set_iceberg_properties,
            )

            return set_iceberg_properties(path, props)
        um = _UNSET_PROPS_RE.match(rest)
        if um:
            keys = re.findall(r"'((?:[^'\\]|\\.)*)'", um.group("keys"))
            if not keys:
                raise ValueError(
                    f"cannot parse UNSET TBLPROPERTIES keys "
                    f"{um.group('keys')!r}"
                )
            props = {k: None for k in keys}
            if fmt == "delta":
                from census_asc5_data_pipeline_spark.sources.delta_io import (
                    set_delta_properties,
                )

                return set_delta_properties(spark, path, props)
            from census_asc5_data_pipeline_spark.sources.iceberg_io import (
                set_iceberg_properties,
            )

            return set_iceberg_properties(path, props)
        acm = re.match(
            r"^ADD\s+CONSTRAINT\s+(?P<name>\w+)\s+CHECK\s*"
            r"\((?P<expr>.+)\)\s*$",
            rest,
            re.IGNORECASE | re.DOTALL,
        )
        dcm = re.match(
            r"^DROP\s+CONSTRAINT\s+(?:IF\s+EXISTS\s+)?(?P<name>\w+)\s*$",
            rest,
            re.IGNORECASE,
        )
        if acm or dcm:
            # ALTER TABLE t ADD CONSTRAINT n CHECK (...) / DROP
            # CONSTRAINT n — delta-spark's CHECK-constraint DDL
            # (r16): sugar over the delta.constraints.* property
            # route, which validates existing rows on ADD
            if fmt != "delta":
                raise ValueError(
                    "CHECK constraints are a Delta feature "
                    "(delta.constraints.* table properties)"
                )
            from census_asc5_data_pipeline_spark.sources.delta_io import (
                set_delta_properties,
            )

            if acm:
                return set_delta_properties(
                    spark,
                    path,
                    {
                        f"delta.constraints.{acm.group('name').lower()}":
                            acm.group("expr").strip()
                    },
                )
            return set_delta_properties(
                spark,
                path,
                {f"delta.constraints.{dcm.group('name').lower()}": None},
            )
        actm = re.match(
            r"^ALTER\s+COLUMN\s+(?P<col>\w+)\s+TYPE\s+"
            r"(?P<typ>[\w()\s,]+?)\s*$",
            rest,
            re.IGNORECASE,
        )
        if actm:
            # ALTER TABLE t ALTER COLUMN c TYPE <wider> — Delta type
            # widening WRITE (r16)
            if fmt != "delta":
                raise NotImplementedError(
                    "ALTER COLUMN TYPE is implemented for Delta "
                    "(type widening); Iceberg type promotion is out "
                    "of scope"
                )
            from census_asc5_data_pipeline_spark.sources.delta_io import (
                alter_delta_column_type,
            )

            return alter_delta_column_type(
                spark, path, actm.group("col"), actm.group("typ")
            )
        cbm = re.match(
            r"^CLUSTER\s+BY\s*\((?P<cols>[^)]*)\)\s*$",
            rest,
            re.IGNORECASE,
        )
        if cbm:
            # ALTER TABLE t CLUSTER BY (c1, c2) — re-stamp the
            # delta.clustering domain (r16 liquid clustering WRITE)
            if fmt != "delta":
                raise ValueError(
                    "CLUSTER BY is Delta liquid clustering in this "
                    "engine — use WRITE ORDERED BY for Iceberg"
                )
            from census_asc5_data_pipeline_spark.sources.delta_io import (
                set_clustering_columns,
            )

            cols = [
                c.strip()
                for c in cbm.group("cols").split(",")
                if c.strip()
            ]
            return set_clustering_columns(spark, path, cols)
        wom = _WRITE_ORDERED_RE.match(rest)
        if wom:
            # ALTER TABLE t WRITE ORDERED BY (c [ASC|DESC] [NULLS
            # FIRST|LAST], ...) | WRITE UNORDERED — the Spark-Iceberg
            # sort-order DDL (r13)
            if fmt != "iceberg":
                raise ValueError(
                    "WRITE ORDERED BY is an Iceberg sort-order "
                    "feature"
                )
            from census_asc5_data_pipeline_spark.sources.iceberg_io import (
                update_sort_order,
            )

            if wom.group("unordered"):
                return update_sort_order(path, [])
            entries = [
                e.strip()
                for e in _split_top(wom.group("cols"))
                if e.strip()
            ]
            return update_sort_order(path, entries)
        pfm = _PARTITION_FIELD_RE.match(rest)
        if pfm:
            # ALTER TABLE t ADD|DROP PARTITION FIELD <transform> —
            # Spark-Iceberg's partition-evolution DDL (r13): compose
            # the default spec's entries +/- the named field and
            # register the result as a new default spec
            if fmt != "delta" and fmt != "iceberg":
                raise ValueError(f"unknown format {fmt!r}")
            if fmt == "delta":
                raise ValueError(
                    "partition evolution is an Iceberg feature — "
                    "Delta partitioning is fixed at creation"
                )
            from census_asc5_data_pipeline_spark.sources.iceberg_io import (
                _current_metadata,
                _schema_of,
                partition_by_entries,
                update_partition_spec,
            )

            _v, imeta = _current_metadata(path)
            entries = partition_by_entries(imeta)
            token = pfm.group("field").strip()
            if pfm.group("verb").upper() == "ADD":
                entries = entries + [token]
            else:
                _s, ifields = _schema_of(imeta)
                from census_asc5_data_pipeline_spark.sources.iceberg_io import (  # noqa: E501
                    _parse_partition_by,
                )

                want = _parse_partition_by([token])[0]
                before = len(entries)
                kept_entries = []
                for e in entries:
                    p = _parse_partition_by([e])[0]
                    if (
                        p["transform"] == want["transform"]
                        and p["source"] == want["source"]
                    ):
                        continue
                    kept_entries.append(e)
                if len(kept_entries) == before:
                    raise ValueError(
                        f"DROP PARTITION FIELD {token!r}: no matching "
                        f"field in the default spec ({entries})"
                    )
                entries = kept_entries
            return update_partition_spec(path, entries)
        rm = _RENAME_COL_RE.match(rest)
        if rm:
            if fmt == "delta":
                from census_asc5_data_pipeline_spark.sources.delta_io import (
                    rename_delta_column,
                )

                return rename_delta_column(
                    spark, path, rm.group("old"), rm.group("new")
                )
            from census_asc5_data_pipeline_spark.sources.iceberg_io import (
                rename_iceberg_column,
            )

            return rename_iceberg_column(
                path, rm.group("old"), rm.group("new")
            )
        dm = _DROP_COLS_RE.match(rest)
        if dm:
            cols = [
                c.strip()
                for c in (dm.group("pcols") or dm.group("bcols")).split(",")
                if c.strip()
            ]
            if fmt == "delta":
                from census_asc5_data_pipeline_spark.sources.delta_io import (
                    drop_delta_columns,
                )

                return drop_delta_columns(spark, path, cols)
            from census_asc5_data_pipeline_spark.sources.iceberg_io import (
                drop_iceberg_columns,
            )

            return drop_iceberg_columns(path, cols)
        raise ValueError(
            f"unsupported ALTER TABLE clause {rest!r} "
            "(ADD COLUMN(S) | RENAME COLUMN | DROP COLUMN(S) | "
            "SET TBLPROPERTIES)"
        )
    if head == "OPTIMIZE":
        m = _OPTIMIZE_RE.match(text)
        if not m:
            raise ValueError(f"cannot parse OPTIMIZE: {sql!r}")
        fmt, path = _resolve(m.group("target"))
        zcols = [
            c.strip() for c in (m.group("zcols") or "").split(",")
            if c.strip()
        ]
        if fmt == "delta":
            from census_asc5_data_pipeline_spark.sources.delta_io import (
                optimize_delta,
            )

            return optimize_delta(
                spark, path, zorder_by=zcols or None
            ).get("version")
        from census_asc5_data_pipeline_spark.sources.iceberg_io import (
            rewrite_data_files,
        )

        return rewrite_data_files(
            spark, path, zorder_by=zcols or None
        ).get("snapshot_id")
    if head == "RESTORE":
        # delta-spark's RESTORE TABLE t TO VERSION|TIMESTAMP AS OF —
        # routed to restore_delta (new commit re-instating version N's
        # live set, history preserved) / rollback_iceberg (metadata
        # version moving current-snapshot-id back; r13)
        m = _RESTORE_RE.match(text)
        if not m:
            raise ValueError(
                f"cannot parse RESTORE: {sql!r} (supported: RESTORE "
                "[TABLE] t TO VERSION AS OF n | TIMESTAMP AS OF ts)"
            )
        fmt, path = _resolve(m.group("target"))
        ver, ts = m.group("ver"), m.group("ts")
        if ts is not None:
            from census_asc5_data_pipeline_spark.sources.delta_stream_source import (
                _parse_ts_ms,
            )

            ms = _parse_ts_ms(ts[1:-1] if ts.startswith("'") else ts)
        if fmt == "delta":
            from census_asc5_data_pipeline_spark.sources.delta_io import (
                restore_delta,
                version_as_of_timestamp_delta,
            )

            v = (
                int(ver)
                if ver is not None
                else version_as_of_timestamp_delta(path, ms)
            )
            return restore_delta(spark, path, v)
        from census_asc5_data_pipeline_spark.sources.iceberg_io import (
            rollback_iceberg,
            snapshot_as_of_timestamp_iceberg,
        )

        sid = (
            int(ver)
            if ver is not None
            else snapshot_as_of_timestamp_iceberg(path, ms)
        )
        return rollback_iceberg(path, sid)
    if head == "VACUUM":
        m = _VACUUM_RE.match(text)
        if not m:
            raise ValueError(f"cannot parse VACUUM: {sql!r}")
        fmt, path = _resolve(m.group("target"))
        keep = int(m.group("keep")) if m.group("keep") else 2
        hours = (m.group("unit") or "").upper() == "HOURS"
        retain_ms = keep * 3_600_000 if hours else None
        if fmt == "delta":
            from census_asc5_data_pipeline_spark.sources.delta_io import (
                vacuum_delta,
            )

            if hours:
                vacuum_delta(spark, path, retain_ms=retain_ms)
            else:
                vacuum_delta(spark, path, keep_versions=keep)
            return None
        from census_asc5_data_pipeline_spark.sources.iceberg_io import (
            expire_snapshots,
        )

        if hours:
            expire_snapshots(path, older_than_ms=retain_ms, spark=spark)
        else:
            expire_snapshots(path, keep_snapshots=keep, spark=spark)
        return None

    if head == "INSERT":
        m = _INSERT_RE.match(text)
        if not m:
            raise ValueError(
                f"cannot parse INSERT statement: {sql!r} (supported: "
                "INSERT INTO t [(cols)] SELECT ...|VALUES ...)"
            )
        fmt, path = _resolve(m.group("target"))
        return _insert_into(
            spark,
            fmt,
            path,
            m.group("cols"),
            m.group("body"),
            mode="overwrite" if m.group("over") else "append",
        )
    if head == "UPDATE":
        m = _UPDATE_RE.match(text)
        if not m:
            raise ValueError(f"cannot parse UPDATE statement: {sql!r}")
        fmt, path = _resolve(m.group("target"))
        sets = {}
        for item in _split_top(m.group("sets")):
            k, _, v = item.partition("=")
            sets[k.strip()] = v.strip()
        pred = m.group("pred") or "true"
        return update_where(spark, fmt, path, pred, sets)
    if head == "DELETE":
        m = _DELETE_RE.match(text)
        if not m:
            raise ValueError(f"cannot parse DELETE statement: {sql!r}")
        fmt, path = _resolve(m.group("target"))
        pred = m.group("pred") or "true"
        if fmt == "delta":
            from census_asc5_data_pipeline_spark.sources.delta_io import (
                delete_delta_where,
            )

            return delete_delta_where(spark, path, pred)
        from census_asc5_data_pipeline_spark.sources.iceberg_io import (
            delete_iceberg_positions,
        )

        return delete_iceberg_positions(spark, path, pred)
    if head == "CALL":
        # the Iceberg stored-procedure spellings for the ref
        # lifecycle (r13 — Spark-Iceberg's CALL catalog.system.*):
        # CALL create_branch(t, 'name'[, snapshot_id]) /
        # create_tag(t, 'name'[, snapshot_id]) / drop_ref(t, 'name') /
        # fast_forward(t, 'target', 'source') — the WAP flow is now
        # SQL end-to-end (audit reads via VERSION AS OF 'name')
        m = _CALL_RE.match(text)
        if not m:
            raise ValueError(
                f"cannot parse CALL: {sql!r} (supported: CALL "
                "[catalog.][system.]create_branch|create_tag|"
                "drop_ref|fast_forward(table, args...))"
            )
        proc = m.group("proc").lower()
        args = [
            a.strip() for a in _split_top(m.group("args")) if a.strip()
        ]
        if not args:
            raise ValueError("CALL needs at least the table argument")
        fmt, path = _resolve(args[0].strip("'\""))
        if fmt != "iceberg":
            raise ValueError(
                f"CALL {proc} targets Iceberg tables — {args[0]!r} is "
                f"{fmt}"
            )

        def _lit(s: str) -> str:
            s = s.strip()
            return s[1:-1] if s and s[0] in "'\"" else s

        from census_asc5_data_pipeline_spark.sources import (
            iceberg_io as ice,
        )

        if proc == "create_branch":
            return ice.create_branch(
                path,
                _lit(args[1]),
                snapshot_id=int(args[2]) if len(args) > 2 else None,
            )
        if proc == "create_tag":
            return ice.tag_snapshot(
                path,
                _lit(args[1]),
                snapshot_id=int(args[2]) if len(args) > 2 else None,
            )
        if proc == "drop_ref":
            return ice.drop_ref(path, _lit(args[1]))
        if proc == "fast_forward":
            return ice.fast_forward(path, _lit(args[1]), _lit(args[2]))
        if proc == "compute_table_stats":
            # Spark-Iceberg's ComputeTableStats procedure (r15): one
            # distributed distinct aggregate → Puffin ndv sidecar →
            # statistics registration (analyze_iceberg_ndv)
            return ice.analyze_iceberg_ndv(
                spark,
                path,
                columns=[_lit(a) for a in args[1:]] or None,
            )
        if proc == "remove_orphan_files":
            res = ice.remove_orphan_files(
                path,
                **(
                    {"older_than_ms": int(_lit(args[1]))}
                    if len(args) > 1
                    else {}
                ),
                spark=spark,
            )
            return res["orphans_removed"]
        raise ValueError(
            f"unknown procedure {proc!r} "
            "(create_branch|create_tag|drop_ref|fast_forward|"
            "compute_table_stats|remove_orphan_files)"
        )
    raise ValueError(
        f"unsupported DML statement {head!r} "
        "(CREATE|MERGE|INSERT|UPDATE|DELETE|ALTER|OPTIMIZE|VACUUM|"
        "RESTORE|CALL)"
    )
