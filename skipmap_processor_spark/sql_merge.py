"""MERGE INTO SQL surface over LakeTable.

The reference's single most important operator is a SQL-surfaced upsert
(/root/reference/src/io/PostGISDataStore.ts:829-850 — INSERT .. ON
CONFLICT DO UPDATE). This module gives the bespoke lake layer the same
front door: the canonical CDC ``MERGE INTO`` statement (the exact text
``formats.iceberg_merge_sql`` would submit to a real Iceberg catalog)
parses onto ``LakeTable.merge_batch`` — so a deployment can author its
upsert once, in SQL, and run it unchanged against either format.

Scope: the parser accepts the CDC upsert GRAMMAR, not arbitrary MERGE —
key-conjunction ON clause, an optional op='delete' matched-DELETE branch,
UPDATE SET */explicit ord-gated sets, INSERT */explicit columns. Anything
else raises with the supported shape. That is a deliberate contract: the
lake's merge is ord-gated LWW by design, and a MERGE whose semantics
disagree with that (e.g. unconditional UPDATE) must not be silently
accepted and then executed with different semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skipmap_processor_spark.lake import KEY_COLS, LakeTable

_WS = r"\s+"


def _norm(sql: str) -> str:
    return re.sub(r"\s+", " ", sql.strip().rstrip(";")).strip()


_MERGE_RE = re.compile(
    r"^MERGE INTO (?P<target>[\w.:/\-]+)(?: AS)? (?P<talias>\w+) "
    r"USING (?P<source>[\w.]+)(?: AS)? (?P<salias>\w+) "
    r"ON (?P<on>.+?) "
    r"(?P<clauses>WHEN .+)$",
    re.IGNORECASE,
)

_WHEN_RE = re.compile(
    r"WHEN (?P<kind>NOT MATCHED|MATCHED)(?: AND (?P<guard>.+?))? "
    r"THEN (?P<action>DELETE|UPDATE SET .+?|INSERT .+?)(?= WHEN |$)",
    re.IGNORECASE,
)


def _parse_on(on: str, talias: str, salias: str) -> list[str]:
    """ON must be the key-column conjunction (any order)."""
    keys = []
    for part in re.split(r"(?i)\s+AND\s+", on.strip()):
        m = re.fullmatch(
            rf"(?:{talias}|{salias})\.(\w+)\s*=\s*(?:{talias}|{salias})\.(\w+)",
            part.strip(), re.IGNORECASE)
        if not m or m.group(1).lower() != m.group(2).lower():
            raise ValueError(
                f"unsupported ON term {part!r}: the lake MERGE joins on the "
                f"table key {KEY_COLS} (t.<key> = s.<key> conjunction)")
        keys.append(m.group(1).lower())
    if sorted(keys) != sorted(KEY_COLS):
        raise ValueError(
            f"ON clause keys {sorted(keys)} != table key {sorted(KEY_COLS)}")
    return keys


def _delete_guard(guard: str | None, salias: str) -> bool:
    """True iff the guard (if any) is the canonical s.op = 'delete' test
    (possibly AND-ed with the ord-newer test, which merge_batch enforces
    anyway)."""
    if guard is None:
        return False
    return bool(re.search(
        rf"(?i)\b{salias}\.op\s*=\s*'delete'", guard))


def execute_merge_into(
    spark: SparkSession,
    sql: str,
    tables: dict[str, LakeTable] | None = None,
    epoch: int | None = None,
    source_df: DataFrame | None = None,
) -> dict:
    """Execute a canonical CDC MERGE INTO statement against a LakeTable.

    ``tables`` maps target names as written in the SQL to LakeTable
    instances (the catalog). The source is resolved as a temp view /
    registered table via ``spark.table`` unless ``source_df`` is given.
    ``epoch`` threads through to the exactly-once gate. Returns
    merge_batch's stats dict.

    The statement must be the ord-gated LWW upsert shape (see module
    docstring; ``formats.iceberg_merge_sql`` emits exactly this text) —
    semantically different MERGEs raise instead of executing wrongly.
    """
    text = _norm(sql)
    m = _MERGE_RE.match(text)
    if not m:
        raise ValueError(
            "unsupported MERGE shape; expected: MERGE INTO <tbl> t USING "
            "<view> s ON t.repo = s.repo AND t.path = s.path WHEN MATCHED "
            "[AND s.op = 'delete' ...] THEN DELETE WHEN MATCHED [AND ...] "
            "THEN UPDATE SET ... WHEN NOT MATCHED [AND ...] THEN INSERT ...")
    target, talias = m.group("target"), m.group("talias")
    source, salias = m.group("source"), m.group("salias")
    _parse_on(m.group("on"), talias, salias)

    saw_update = saw_insert = saw_delete = False
    for wm in _WHEN_RE.finditer(m.group("clauses")):
        kind = wm.group("kind").upper()
        action = wm.group("action").upper()
        if kind == "MATCHED" and action == "DELETE":
            if not _delete_guard(wm.group("guard"), salias):
                raise ValueError(
                    "MATCHED ... DELETE must be guarded by s.op = 'delete' "
                    "(the lake's delete signal); an unguarded DELETE would "
                    "tombstone every matched key")
            saw_delete = True
        elif kind == "MATCHED" and action.startswith("UPDATE SET"):
            saw_update = True
        elif kind == "NOT MATCHED" and action.startswith("INSERT"):
            saw_insert = True
        else:
            raise ValueError(f"unsupported WHEN clause: {wm.group(0)!r}")
    if not (saw_update and saw_insert):
        raise ValueError(
            "MERGE must carry both WHEN MATCHED ... UPDATE and WHEN NOT "
            "MATCHED ... INSERT (the lake upsert is total per key)")

    lake = (tables or {}).get(target)
    if lake is None:
        raise ValueError(f"unknown target table {target!r}; pass it in "
                         "`tables` (the catalog mapping)")
    src = source_df if source_df is not None else spark.table(source)
    if "op" not in src.columns:
        if saw_delete:
            raise ValueError("source has no `op` column but the MERGE has a "
                             "s.op = 'delete' branch")
        src = src.withColumn("op", F.lit("upsert"))
    return lake.merge_batch(src, epoch=epoch)


# ------------------------------------------------------- row-level DML SQL

_DELETE_RE = re.compile(
    r"^DELETE FROM (?P<target>[\w.:/\-]+) WHERE (?P<where>.+)$",
    re.IGNORECASE,
)

_UPDATE_RE = re.compile(
    r"^UPDATE (?P<target>[\w.:/\-]+) SET (?P<sets>.+?) WHERE (?P<where>.+)$",
    re.IGNORECASE,
)


def _resolve_target(target: str, tables: dict[str, LakeTable] | None):
    lake = (tables or {}).get(target)
    if lake is None:
        raise ValueError(f"unknown target table {target!r}; pass it in "
                         "`tables` (the catalog mapping)")
    return lake


def _split_assignments(sets: str) -> dict[str, str]:
    """Split ``a = expr, b = expr`` on top-level commas only (commas inside
    parens or single-quoted strings belong to the expression)."""
    parts = _split_top(sets)
    out: dict[str, str] = {}
    for part in parts:
        m = re.fullmatch(r"\s*(\w+)\s*=\s*(.+?)\s*", part, re.DOTALL)
        if not m:
            raise ValueError(f"unsupported SET assignment {part!r}; "
                             "expected <column> = <expression>")
        out[m.group(1).lower()] = m.group(2)
    if not out:
        raise ValueError("UPDATE requires at least one SET assignment")
    return out


def execute_delete_from(
    spark: SparkSession,
    sql: str,
    tables: dict[str, LakeTable] | None = None,
    epoch: int | None = None,
) -> dict:
    """``DELETE FROM <tbl> WHERE <predicate>`` -> LakeTable.delete_where.
    The predicate is any Spark SQL boolean expression over the live-row
    schema; matched rows are tombstoned via self-generated CDC delete
    events (see delete_where for the ord argument)."""
    m = _DELETE_RE.match(_norm(sql))
    if not m:
        raise ValueError(
            "unsupported DELETE shape; expected: DELETE FROM <tbl> WHERE "
            "<predicate> (an unfiltered DELETE FROM would tombstone the "
            "whole table — say WHERE true if that is really intended)")
    lake = _resolve_target(m.group("target"), tables)
    return lake.delete_where(m.group("where"), epoch=epoch)


def execute_update(
    spark: SparkSession,
    sql: str,
    tables: dict[str, LakeTable] | None = None,
    epoch: int | None = None,
) -> dict:
    """``UPDATE <tbl> SET col = expr[, ...] WHERE <predicate>`` ->
    LakeTable.update_where (assignments evaluate over the original row;
    key/ord columns are rejected there)."""
    m = _UPDATE_RE.match(_norm(sql))
    if not m:
        raise ValueError(
            "unsupported UPDATE shape; expected: UPDATE <tbl> SET <col> = "
            "<expr>[, ...] WHERE <predicate> (WHERE is mandatory — say "
            "WHERE true for a full-table update)")
    lake = _resolve_target(m.group("target"), tables)
    return lake.update_where(m.group("where"),
                             _split_assignments(m.group("sets")),
                             epoch=epoch)


# ------------------------------------------- CREATE MATERIALIZED VIEW SQL

_CMV_RE = re.compile(
    r"^CREATE MATERIALIZED VIEW (?P<name>\w+) AS SELECT (?P<select>.+?) "
    r"FROM (?P<target>[\w.:/\-]+) GROUP BY (?P<group>.+)$",
    re.IGNORECASE,
)

_AGG_RE = re.compile(
    r"^(?P<fn>COUNT|SUM|MIN|MAX)\s*\(\s*(?P<distinct>DISTINCT\s+)?"
    r"(?P<arg>.+?)\s*\)\s+AS\s+(?P<alias>\w+)$",
    re.IGNORECASE | re.DOTALL,
)


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (commas inside parens or single-quoted
    strings belong to the expression)."""
    parts, depth, in_str, buf = [], 0, False, []
    for ch in s:
        if in_str:
            buf.append(ch)
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


def create_materialized_view(
    spark: SparkSession,
    sql: str,
    tables: dict[str, LakeTable],
    views_root: str,
    dim_path: str | None = None,
    dim_on: list[str] | None = None,
):
    """``CREATE MATERIALIZED VIEW <name> AS SELECT <group cols + aggs>
    FROM <tbl> GROUP BY <cols>`` -> an ``IncrementalView`` rooted at
    ``{views_root}/{name}`` (caller drives ``refresh()``).

    Supported aggregates — exactly the incrementally-maintainable set:

    - ``COUNT(*) AS a`` / ``COUNT(expr) AS a``  (signed; non-null count)
    - ``SUM(expr) AS a``                        (signed; ZERO identity —
      a surviving group whose non-null values were all retracted reports
      0 where ANSI SUM reports NULL; pair with COUNT(expr) to tell the
      cases apart)
    - ``MIN(expr) / MAX(expr) AS a``            (fold + bounded recompute)
    - ``COUNT(DISTINCT expr) AS a``             (signed aux multiset)

    Anything else (AVG, percentiles, window functions, HAVING, ORDER BY)
    raises with the supported shape — a view the engine cannot maintain
    exactly must not be silently accepted and then refreshed wrongly.
    Every aggregate requires an ``AS`` alias (the state schema is the
    user's contract); bare select items must be GROUP BY columns.
    ``dim_path``/``dim_on`` pass through to the star-join enrichment.
    """
    from skipmap_processor_spark.changefeed import IncrementalView

    m = _CMV_RE.match(_norm(sql))
    if not m:
        raise ValueError(
            "unsupported CREATE MATERIALIZED VIEW shape; expected: CREATE "
            "MATERIALIZED VIEW <name> AS SELECT <group cols>, <agg AS "
            "alias>[, ...] FROM <tbl> GROUP BY <cols>")
    lake = _resolve_target(m.group("target"), tables)
    group_cols = [c.strip() for c in _split_top(m.group("group"))]
    for c in group_cols:
        if not re.fullmatch(r"\w+", c):
            raise ValueError(
                f"unsupported GROUP BY term {c!r}: group keys must be "
                "plain columns (alias expressions in the fact table or a "
                "dimension instead)")
    metrics: dict[str, str] = {}
    extrema: dict[str, tuple[str, str]] = {}
    distinct: dict[str, str] = {}
    seen_group: list[str] = []
    for item in _split_top(m.group("select")):
        if re.fullmatch(r"\w+", item):
            if item not in group_cols:
                raise ValueError(
                    f"bare select column {item!r} is not in GROUP BY")
            seen_group.append(item)
            continue
        am = _AGG_RE.match(item)
        if not am:
            raise ValueError(
                f"unsupported select item {item!r}; supported aggregates: "
                "COUNT(*|expr|DISTINCT expr), SUM(expr), MIN(expr), "
                "MAX(expr) — each AS <alias> (AVG and friends are not "
                "exactly maintainable; derive them from SUM/COUNT on read)")
        fn = am.group("fn").upper()
        arg, alias = am.group("arg").strip(), am.group("alias")
        if alias in metrics or alias in extrema or alias in distinct:
            raise ValueError(
                f"duplicate alias {alias!r}: each aggregate needs a "
                "distinct output name (a repeated alias would silently "
                "drop the earlier aggregate)")
        if alias in group_cols:
            raise ValueError(
                f"alias {alias!r} shadows a GROUP BY column — the state "
                "would carry duplicate columns")
        if am.group("distinct"):
            if fn != "COUNT":
                raise ValueError(f"DISTINCT is only supported under COUNT "
                                 f"(got {fn} in {item!r})")
            distinct[alias] = arg
        elif fn == "COUNT":
            metrics[alias] = ("1" if arg == "*"
                              else f"IF(({arg}) IS NOT NULL, 1, 0)")
        elif fn == "SUM":
            metrics[alias] = arg
        else:
            extrema[alias] = (fn.lower(), arg)
    if set(seen_group) != set(group_cols):
        missing = sorted(set(group_cols) - set(seen_group))
        raise ValueError(f"GROUP BY columns missing from SELECT: {missing}")
    if not (metrics or extrema or distinct):
        raise ValueError("the view has no aggregates — nothing to maintain")
    import os

    return IncrementalView(
        spark, lake, os.path.join(views_root, m.group("name")),
        group_cols=group_cols, metrics=metrics,
        extrema=extrema or None, distinct=distinct or None,
        dim_path=dim_path, dim_on=dim_on)


# --------------------------------------------------- ALTER TABLE DDL SQL

_DDL_RES = [
    ("add", re.compile(
        r"^ALTER TABLE (?P<target>[\w.:/\-]+) ADD COLUMN (?P<col>\w+)"
        r"(?: (?P<type>\w+))?$", re.IGNORECASE)),
    ("rename", re.compile(
        r"^ALTER TABLE (?P<target>[\w.:/\-]+) RENAME COLUMN (?P<col>\w+) "
        r"TO (?P<to>\w+)$", re.IGNORECASE)),
    ("drop", re.compile(
        r"^ALTER TABLE (?P<target>[\w.:/\-]+) DROP COLUMN (?P<col>\w+)$",
        re.IGNORECASE)),
    ("widen", re.compile(
        r"^ALTER TABLE (?P<target>[\w.:/\-]+) ALTER COLUMN (?P<col>\w+) "
        r"TYPE (?P<type>\w+)$", re.IGNORECASE)),
]


def execute_alter_table(
    sql: str,
    tables: dict[str, LakeTable] | None = None,
) -> dict:
    """ALTER TABLE DDL onto the lake's metadata-only schema evolution:

    - ``ADD COLUMN <name> [<type>]``       -> ``add_column`` (default string)
    - ``RENAME COLUMN <a> TO <b>``         -> ``rename_column`` (by field id)
    - ``DROP COLUMN <name>``               -> ``drop_column``
    - ``ALTER COLUMN <name> TYPE <type>``  -> ``widen_column`` (lossless
      promotions only; narrowing raises there)

    All four are metadata-only commits via the optimistic rebase loop;
    the returned dict carries ``applied`` (False = no-op, e.g. the column
    already exists) and the action echo.
    """
    text = _norm(sql)
    for action, rx in _DDL_RES:
        m = rx.match(text)
        if not m:
            continue
        lake = _resolve_target(m.group("target"), tables)
        col = m.group("col")
        if action == "add":
            applied = lake.add_column(col, m.group("type") or "string")
        elif action == "rename":
            applied = lake.rename_column(col, m.group("to"))
        elif action == "drop":
            applied = lake.drop_column(col)
        else:
            applied = lake.widen_column(col, m.group("type"))
        return {"action": action, "column": col, "applied": bool(applied)}
    raise ValueError(
        "unsupported ALTER TABLE shape; expected one of: ADD COLUMN <name> "
        "[<type>] | RENAME COLUMN <a> TO <b> | DROP COLUMN <name> | ALTER "
        "COLUMN <name> TYPE <type>")
