"""Per-file column statistics + stats-based data skipping for the
spec-level Delta writer/reader (delta-io PROTOCOL.md §Per-file
Statistics) — the capability delta-spark calls *data skipping*.

Writer half (:func:`file_stats_json`): every data file staged by
``delta_io._stage_adds`` gets a ``stats`` JSON string on its add
action — ``numRecords`` plus ``minValues`` / ``maxValues`` /
``nullCount`` for the first ``n_cols`` top-level leaf columns
(delta-spark's ``delta.dataSkippingNumIndexedCols`` default of 32).
The numbers come from the parquet FOOTER's row-group statistics — a
metadata read, no data pages — aggregated across row groups.  Types
whose JSON round-trip is exact are bounded (integers, floats,
strings, dates, timestamps, booleans, decimals); binary and nested
columns are left unbounded.  Float/double columns rely on the
parquet writer's NaN discipline: row groups containing NaN omit
min/max, so a NaN-polluted column simply never prunes.  Strings are
stored UNtruncated (always spec-valid: the recorded min/max are the
exact extremes), sidestepping the truncate-and-increment dance
delta-spark does for its 32-char prefix cap.

Reader half (:func:`parse_skip_predicate` + :func:`skip_files`):
``read_delta(predicate=...)`` prunes the live-file list BEFORE Spark
plans the scan — at 100 TB the win is not just I/O, it is the
PLANNING surface: a needle-in-haystack query over a 1M-file table
plans a scan over only the files whose [min, max] interval can hold
matches.  The evaluator is deliberately CONSERVATIVE: it understands
AND-conjunctions of ``col <op> literal`` / ``literal <op> col``
atoms (``= != <> < <= > >=``), ``col IS [NOT] NULL``, ``col IN
(...)`` and ``col BETWEEN a AND b``; anything it cannot prove keeps
the file, and anything it cannot PARSE (ORs, nested parens,
functions) disables pruning entirely — the caller still applies the
full predicate as a Spark filter, so skipping is purely a pruning
optimization and can never change results.  Partition columns
evaluate against the add action's ``partitionValues`` (min = max =
the value), so one predicate drives partition pruning and stats
skipping uniformly.

All-null files (``nullCount == numRecords``) fail every comparison
atom (SQL three-valued logic: ``NULL <op> v`` is never TRUE), and
``IS NULL`` / ``IS NOT NULL`` prune on the null counts alone —
min/max-free columns still skip.
"""

from __future__ import annotations

import datetime as _dt
import json
import re
from decimal import Decimal

from pyspark.sql import types as T

# delta-spark's delta.dataSkippingNumIndexedCols default
DEFAULT_INDEXED_COLS = 32

__all__ = [
    "add_survives",
    "prep_atoms",
    "DEFAULT_INDEXED_COLS",
    "file_stats_json",
    "parse_skip_predicate",
    "skip_files",
]


# ---------------------------------------------------------------- writer


def _encode(v):
    """JSON-encodable form of a footer statistic value, or None when
    the type has no exact JSON round-trip (binary)."""
    if isinstance(v, bool) or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    return None


def file_stats_json(
    file_path: str, n_cols: int = DEFAULT_INDEXED_COLS
) -> str | None:
    """The add action's ``stats`` string for one staged parquet file,
    from its footer only. None when the footer is unreadable (the
    add action simply carries no stats — never a write failure)."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(file_path).metadata
    except Exception:
        return None
    num_records = md.num_rows
    # first n_cols TOP-LEVEL leaf columns, in file-schema order;
    # nested leaves surface as dotted path_in_schema and are skipped
    # (delta-spark indexes nested fields too; this engine's writer
    # gate already refuses tables whose skipping-relevant metadata
    # hides in nested fields)
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, object] = {}
    seen: list[str] = []
    for j in range(md.num_columns):
        name = md.row_group(0).column(j).path_in_schema if md.num_row_groups else None
        if name is None:
            break
        if "." in name:
            continue
        if name not in seen:
            if len(seen) >= n_cols:
                continue
            seen.append(name)
        lo = hi = None
        nc = 0
        bounded = True
        null_known = True
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(j).statistics
            if st is None:
                bounded = False
                null_known = False
                break
            if st.null_count is None:
                null_known = False
            else:
                nc += st.null_count
            n_in_group = md.row_group(i).num_rows
            all_null_group = (
                st.null_count is not None
                and st.null_count == n_in_group
            )
            try:
                has_mm = st.has_min_max
                gmin = _encode(st.min) if has_mm else None
                gmax = _encode(st.max) if has_mm else None
            except Exception:
                # pyarrow cannot cast statistics for some physical
                # types (e.g. INT96) — leave the column unbounded
                bounded = False
                continue
            if not has_mm:
                # an all-null row group legitimately has no min/max
                # and must not unbound the file's other groups
                if not all_null_group:
                    bounded = False
                continue
            if gmin is None or gmax is None:
                bounded = False
                continue
            lo = gmin if lo is None or _lt(gmin, lo) else lo
            hi = gmax if hi is None or _lt(hi, gmax) else hi
        if bounded and lo is not None:
            mins[name] = lo
            maxs[name] = hi
        if null_known:
            nulls[name] = nc
    return json.dumps(
        {
            "numRecords": num_records,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        },
        separators=(",", ":"),
        default=str,
    )


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False


# ---------------------------------------------------------------- parser

_LIT = (
    r"(?:DATE\s*'[^']*'|TIMESTAMP\s*'[^']*'|'(?:[^']|'')*'"
    r"|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|TRUE|FALSE)"
)
_ID = r"(?:`[^`]+`|[A-Za-z_][A-Za-z_0-9]*)"
_OPS = {"=", "==", "!=", "<>", "<", "<=", ">", ">="}
_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=",
         "==": "==", "!=": "!=", "<>": "<>"}

_ATOM_CMP = re.compile(
    rf"^\s*({_ID})\s*(=|==|!=|<>|<=|>=|<|>)\s*({_LIT})\s*$",
    re.IGNORECASE,
)
_ATOM_CMP_REV = re.compile(
    rf"^\s*({_LIT})\s*(=|==|!=|<>|<=|>=|<|>)\s*({_ID})\s*$",
    re.IGNORECASE,
)
_ATOM_NULL = re.compile(
    rf"^\s*({_ID})\s+IS\s+(NOT\s+)?NULL\s*$", re.IGNORECASE
)
_ATOM_IN = re.compile(
    rf"^\s*({_ID})\s+IN\s*\(\s*({_LIT}(?:\s*,\s*{_LIT})*)\s*\)\s*$",
    re.IGNORECASE,
)
_BETWEEN = re.compile(
    rf"\b({_ID})\s+BETWEEN\s+({_LIT})\s+AND\s+({_LIT})",
    re.IGNORECASE,
)
_LIT_SPLIT = re.compile(rf"{_LIT}", re.IGNORECASE)


def _strip_quoted(s: str) -> str:
    return re.sub(r"'(?:[^']|'')*'", "''", s)


def _parse_literal(tok: str):
    """(kind, value): kind ∈ num/str/date/ts/bool."""
    t = tok.strip()
    up = t.upper()
    if up.startswith("DATE"):
        return ("date", _dt.date.fromisoformat(t[t.index("'") + 1 : -1]))
    if up.startswith("TIMESTAMP"):
        raw = t[t.index("'") + 1 : -1]
        return ("ts", _dt.datetime.fromisoformat(raw.replace("Z", "+00:00")))
    if t.startswith("'"):
        return ("str", t[1:-1].replace("''", "'"))
    if up in ("TRUE", "FALSE"):
        return ("bool", up == "TRUE")
    if "." in t or "e" in t or "E" in t:
        return ("num", float(t))
    return ("num", int(t))


def _ident(tok: str) -> str:
    t = tok.strip()
    return t[1:-1] if t.startswith("`") else t


def parse_skip_predicate(predicate: str) -> list[tuple] | None:
    """Parse an AND-conjunction of supported atoms into
    ``[(col, op, value-or-values), ...]``; ``op`` ∈ comparison ops,
    ``'in'``, ``'isnull'``, ``'notnull'``.  None = not provable by
    this evaluator (caller keeps every file and relies on the
    post-scan filter)."""
    if not predicate or not predicate.strip():
        return None
    # ORs / NOTs / parens / functions are beyond interval logic
    bare = _strip_quoted(predicate)
    if re.search(r"\bOR\b|\bNOT\s+[^N]|\(|\)", bare, re.IGNORECASE):
        # parens are allowed only as the IN-list, which lives inside
        # an atom; detect IN before bailing
        without_in = re.sub(
            rf"{_ID}\s+IN\s*\([^()]*\)", "x = 1", bare, flags=re.IGNORECASE
        )
        if re.search(
            r"\bOR\b|\bNOT\s+[^N]|\(|\)", without_in, re.IGNORECASE
        ):
            return None
    # mask quoted literals FIRST so the BETWEEN rewrite can never
    # touch text inside a string (e.g. name = 'x BETWEEN 1 AND 2');
    # placeholders stay quoted-string-shaped so BETWEEN bounds that
    # ARE string literals still rewrite, then restore per-chunk
    _masked: list[str] = []

    def _mask(m: re.Match) -> str:
        _masked.append(m.group(0))
        return f"'\x00{len(_masked) - 1}\x00'"

    pred = re.sub(r"'(?:[^']|'')*'", _mask, predicate)
    pred = _BETWEEN.sub(r"\1 >= \2 AND \1 <= \3", pred)

    def _unmask(chunk: str) -> str:
        return re.sub(
            "'\x00(\\d+)\x00'", lambda m: _masked[int(m.group(1))], chunk
        )

    # split on ANDs OUTSIDE quoted strings: replace literals with
    # placeholders, split, then map chunks back by position
    chunks: list[str] = []
    depth = 0
    cur: list[str] = []
    i = 0
    s = pred
    while i < len(s):
        c = s[i]
        if c == "'":
            j = i + 1
            while j < len(s):
                if s[j] == "'" and j + 1 < len(s) and s[j + 1] == "'":
                    j += 2
                    continue
                if s[j] == "'":
                    break
                j += 1
            cur.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if (
            depth == 0
            and s[i : i + 3].upper() == "AND"
            and (i == 0 or not s[i - 1].isalnum() and s[i - 1] != "_")
            and (
                i + 3 >= len(s)
                or (not s[i + 3].isalnum() and s[i + 3] != "_")
            )
        ):
            chunks.append("".join(cur))
            cur = []
            i += 3
            continue
        cur.append(c)
        i += 1
    chunks.append("".join(cur))

    atoms: list[tuple] = []
    for ch in chunks:
        ch = _unmask(ch)
        m = _ATOM_CMP.match(ch)
        if m:
            try:
                _k, v = _parse_literal(m.group(3))
            except (ValueError, IndexError):
                return None
            atoms.append((_ident(m.group(1)), m.group(2), v))
            continue
        m = _ATOM_CMP_REV.match(ch)
        if m:
            try:
                _k, v = _parse_literal(m.group(1))
            except (ValueError, IndexError):
                return None
            atoms.append((_ident(m.group(3)), _FLIP[m.group(2)], v))
            continue
        m = _ATOM_NULL.match(ch)
        if m:
            atoms.append(
                (
                    _ident(m.group(1)),
                    "notnull" if m.group(2) else "isnull",
                    None,
                )
            )
            continue
        m = _ATOM_IN.match(ch)
        if m:
            try:
                vals = [
                    _parse_literal(t)[1]
                    for t in _LIT_SPLIT.findall(m.group(2))
                ]
            except (ValueError, IndexError):
                return None
            atoms.append((_ident(m.group(1)), "in", vals))
            continue
        return None
    return atoms


# ---------------------------------------------------------------- skipper


def _decode(v, dtype: T.DataType):
    """Stats-JSON value → comparable Python domain value for dtype."""
    if v is None:
        return None
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(v)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(v)
    if isinstance(dtype, T.BooleanType):
        return bool(v) if not isinstance(v, str) else v.lower() == "true"
    if isinstance(dtype, T.StringType):
        return str(v)
    if isinstance(dtype, T.DateType):
        # a foreign writer may have stamped a full timestamp string
        # for a date-typed column; the first 10 chars are the date
        return _dt.date.fromisoformat(str(v)[:10])
    if isinstance(dtype, T.TimestampType):
        return _norm_ts(
            _dt.datetime.fromisoformat(str(v).replace("Z", "+00:00"))
        )
    if isinstance(dtype, T.DecimalType):
        return Decimal(str(v))
    raise TypeError(f"unbounded stats type {dtype}")


def _norm_ts(v: _dt.datetime) -> _dt.datetime:
    if v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def _coerce_lit(v, dtype: T.DataType, tz: str):
    """Predicate literal → the same comparable domain as
    :func:`_decode`; naive timestamp literals resolve in the
    SESSION's timezone (the time-travel ``_parse_ts_ms`` rule)."""
    if isinstance(dtype, T.TimestampType):
        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                try:
                    from zoneinfo import ZoneInfo

                    v = v.replace(tzinfo=ZoneInfo(tz))
                except Exception:
                    v = v.replace(tzinfo=_dt.timezone.utc)
            return _norm_ts(v)
        if isinstance(v, str):
            return _coerce_lit(
                _dt.datetime.fromisoformat(v.replace("Z", "+00:00")),
                dtype,
                tz,
            )
        raise TypeError(f"timestamp atom vs {type(v)}")
    if isinstance(dtype, T.DateType):
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return v
        if isinstance(v, str):
            return _dt.date.fromisoformat(v)
        raise TypeError(f"date atom vs {type(v)}")
    if isinstance(dtype, T.BooleanType):
        if isinstance(v, bool):
            return v
        raise TypeError(f"boolean atom vs {type(v)}")
    if isinstance(
        dtype,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
        ),
    ):
        # Keep the literal AS-IS: Python int/float/Decimal
        # cross-compare exactly, so `x < 1.5` on an int column prunes
        # soundly without ever truncating the literal.  A non-numeric
        # literal (string/bool/date) proves nothing about a numeric
        # column — raise so the atom is dropped and the file kept.
        if isinstance(v, bool) or not isinstance(v, (int, float, Decimal)):
            raise TypeError(f"numeric atom vs {type(v)}")
        return v
    if isinstance(dtype, T.StringType):
        # Spark compares `string_col > 5` numerically (casting the
        # column); a lexicographic min/max compare is unsound — only
        # string literals may face string stats.
        if not isinstance(v, str):
            raise TypeError(f"string atom vs {type(v)}")
        return v
    return _decode(v, dtype)


def _atom_allows(atom: tuple, lo, hi, nc, nrec) -> bool:
    """False = PROVEN no row in the file satisfies the atom."""
    _col, op, v = atom
    all_null = nc is not None and nrec is not None and nrec > 0 and nc == nrec
    if op == "isnull":
        return nc is None or nc > 0
    if op == "notnull":
        return not all_null
    if all_null:
        return False
    if op == "in":
        if lo is None and hi is None:
            return True
        return any(
            not (
                (lo is not None and _lt(x, lo))
                or (hi is not None and _lt(hi, x))
            )
            for x in v
        )
    if op in ("=", "=="):
        if lo is not None and _lt(v, lo):
            return False
        if hi is not None and _lt(hi, v):
            return False
        return True
    if op in ("!=", "<>"):
        # only an all-one-value file (min == max == v, no nulls to
        # speak of: null rows never satisfy != either) is skippable
        return not (lo is not None and hi is not None and lo == hi == v)
    if op == "<":
        return lo is None or _lt(lo, v)
    if op == "<=":
        return lo is None or not _lt(v, lo)
    if op == ">":
        return hi is None or _lt(v, hi)
    if op == ">=":
        return hi is None or not _lt(hi, v)
    return True


def skip_files(
    adds: list[dict],
    atoms: list[tuple],
    schema: T.StructType,
    pcols: list[str],
    physical_of: dict[str, str] | None,
    session_tz: str = "UTC",
) -> list[dict]:
    """The live adds that MAY hold predicate matches. Partition
    columns evaluate against partitionValues (min = max = value);
    data columns against the add's ``stats`` JSON. Any decode/coerce
    surprise keeps the file — conservative by construction."""
    lits = prep_atoms(atoms, schema, session_tz)
    if lits is None:
        return adds
    dtypes = {f.name: f.dataType for f in schema.fields}
    return [
        a
        for a in adds
        if add_survives(a, lits, dtypes, pcols, physical_of)
    ]


def prep_atoms(
    atoms: list[tuple],
    schema: T.StructType,
    session_tz: str = "UTC",
) -> list[tuple] | None:
    """Coerce parsed atoms' literals into the comparable domain of
    their column's type. Uncoercible atoms (kind mismatches) are
    dropped — they prove nothing. None = nothing prunable."""
    dtypes = {f.name: f.dataType for f in schema.fields}
    rel = [a for a in atoms if a[0] in dtypes]
    if not rel:
        return None
    lits: list[tuple] = []
    for col, op, v in rel:
        try:
            if op == "in":
                v = [_coerce_lit(x, dtypes[col], session_tz) for x in v]
            elif v is not None:
                v = _coerce_lit(v, dtypes[col], session_tz)
        except (TypeError, ValueError, ArithmeticError):
            continue  # uncoercible atom proves nothing
        lits.append((col, op, v))
    return lits or None


def add_survives(
    a: dict,
    lits: list[tuple],
    dtypes: dict[str, T.DataType],
    pcols: list[str],
    physical_of: dict[str, str] | None,
) -> bool:
    """True unless the add's stats/partitionValues PROVE the
    conjunction matches no row. Shared verbatim by the driver-side
    loop (:func:`skip_files`) and the distributed mapInPandas path
    (``delta_io._pruned_ckpt_adds``) so both paths prune
    identically by construction."""
    st = a.get("stats")
    if isinstance(st, str):
        try:
            st = json.loads(st)
        except (ValueError, TypeError):
            st = None
    st = st if isinstance(st, dict) else {}
    nrec = st.get("numRecords")
    pv = a.get("partitionValues") or {}
    for col, op, v in lits:
        phys = physical_of.get(col, col) if physical_of else col
        try:
            if col in pcols:
                raw = pv.get(phys)
                if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
                    lo = hi = None
                    nc, n = 1, 1  # all-null partition value
                else:
                    lo = hi = _decode(raw, dtypes[col])
                    nc, n = 0, nrec if nrec is not None else 1
                    n = n or 1
                if not _atom_allows((col, op, v), lo, hi, nc, n):
                    return False
                continue
            mv = (st.get("minValues") or {}).get(phys)
            xv = (st.get("maxValues") or {}).get(phys)
            nc = (st.get("nullCount") or {}).get(phys)
            lo = _decode(mv, dtypes[col]) if mv is not None else None
            hi = _decode(xv, dtypes[col]) if xv is not None else None
            if not _atom_allows((col, op, v), lo, hi, nc, nrec):
                return False
        except (TypeError, ValueError, ArithmeticError):
            continue
    return True
