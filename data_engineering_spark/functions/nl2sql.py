"""UD4 — deterministic natural-language → Spark SQL template layer.

Reference parity: ``Openapi/openai_elasticsearch.py:71-157`` turns one
natural-language request into exactly one validated Elasticsearch query
(LLM-prompted, with hard rules: only one query, only existing fields, a
fixed output format). This module keeps that contract but swaps the LLM
for a deterministic grammar over the registered warehouse views — the
right engineering default for a pipeline component: reproducible,
testable, and oracle-checkable. ``compile_nl`` is the single seam a
model-backed implementation would replace; everything downstream
(validation, execution) is shared.

Supported request forms (case-insensitive):

- ``count [rows in] TABLE [where COND]``
- ``AGG MEASURE by DIM [and DIM2] in TABLE [where COND] [having CMP
  N] [top N]`` with AGG ∈ total/sum/average/avg/min/max/count and CMP ∈
  over/under/at least/at most/>=/<=/>/<  (having = the ES
  min_doc_count / bucket-selector threshold; allowed for the
  order-exact aggregates count/min/max only — a float sum/avg at a
  threshold boundary is nondeterministic)
- ``AGG MEASURE in TABLE [where COND]`` (scalar, no group-by — the
  reference's single-metric answer)
- ``count distinct COL by DIM in TABLE [where COND] [top N]`` (the ES
  cardinality aggregation: unique X per Y)
- ``daily|monthly|yearly AGG [MEASURE] in TABLE [by DATECOL] [where
  COND]`` (the ES date_histogram aggregation: calendar-bucketed trend;
  the date column is inferred when the table has exactly one)
- ``distinct COL[, COL...] from TABLE [where COND]`` (the terms-facet
  request: enumerate a field's values)
- ``show COL[, COL...] from TABLE [where COND] [limit N]``
- ``show COLS from TABLE [where COND] with [its] DIM info`` (the
  reference's cross-index flow: hits from one index + a keyed lookup
  merging a second index's fields — compiled to one broadcast lookup
  join; the (fk, pk) pair is inferred from the two schemas)
- ``top N TABLE by MEASURE``

COND is ``col OP value`` terms joined by ``and``; OP ∈ = != > >= < <=
contains (→ LIKE) between‑and (→ BETWEEN, the reference's gte/lte range
clause). Every table and column is validated against the supplied
schema — unknown names raise ``NLQueryError`` (the reference's "avoid
using fields that do not exist" rule, enforced instead of prompted).
"""

from __future__ import annotations

import re
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

__all__ = ["NLQueryError", "compile_nl", "run_nl"]


class NLQueryError(ValueError):
    """Request doesn't parse, or references unknown tables/columns."""


_AGGS = {
    "total": "sum",
    "sum": "sum",
    "average": "avg",
    "avg": "avg",
    "min": "min",
    "max": "max",
    "count": "count",
}

_OPS = {"=": "=", "!=": "<>", ">": ">", ">=": ">=", "<": "<", "<=": "<=", "is": "="}


def _ident(name: str, known: list[str], kind: str) -> str:
    if name not in known:
        raise NLQueryError(f"unknown {kind} '{name}' — known: {sorted(known)}")
    return name


def _value_sql(v: str) -> str:
    v = v.strip().strip("'\"")
    if re.fullmatch(r"-?\d+(\.\d+)?", v):
        return v
    return "'" + v.replace("'", "''") + "'"


def _cond_sql(cond: str, cols: list[str], qual: str = "") -> str:
    raw = re.split(r"\s+and\s+", cond.strip(), flags=re.I)
    # Re-join range terms the "and" split broke apart: "x between 1 and 5"
    # splits into ["x between 1", "5"] — the reference's range filters
    # (Openapi/openai_elasticsearch.py gte/lte bool clauses) read this way.
    # Only re-join when the next raw term is a bare value token, so a
    # malformed range ("b between 2 and c = 3") errors on its own term
    # instead of swallowing the following predicate. BETWEEN bounds must
    # therefore be space-free (numbers, dates, bare words).
    terms: list[str] = []
    i = 0
    while i < len(raw):
        t = raw[i]
        if (
            re.fullmatch(r"\s*\w+\s+between\s+\S+\s*", t, flags=re.I)
            and i + 1 < len(raw)
            and re.fullmatch(r"\S+", raw[i + 1].strip())
        ):
            terms.append(f"{t.strip()} and {raw[i + 1].strip()}")
            i += 2
        else:
            terms.append(t)
            i += 1
    parts = []
    for t in terms:
        m = re.fullmatch(
            r"\s*(\w+)\s+between\s+(\S+)\s+and\s+(\S+)\s*", t, flags=re.I
        )
        if m:
            col = m.group(1)
            _ident(col, cols, "column")
            parts.append(
                f"{qual}{col} BETWEEN {_value_sql(m.group(2))} AND {_value_sql(m.group(3))}"
            )
            continue
        m = re.fullmatch(
            r"\s*(\w+)\s*(>=|<=|!=|=|>|<|is\s+not|is|contains)\s*(.+?)\s*",
            t,
            flags=re.I,
        )
        if not m:
            raise NLQueryError(f"cannot parse condition term '{t.strip()}'")
        col, op, val = m.group(1), re.sub(r"\s+", " ", m.group(2).lower()), m.group(3)
        _ident(col, cols, "column")
        if op == "contains":
            # LIKE wildcards in the user value must match literally. '!'
            # is the escape char because '\' is itself an escape inside
            # Spark SQL string literals but not DuckDB's — '!' reads the
            # same in both engines.
            needle = (
                val.strip().strip("'\"").replace("'", "''")
                .replace("!", "!!").replace("%", "!%").replace("_", "!_")
            )
            parts.append(f"{qual}{col} LIKE '%{needle}%' ESCAPE '!'")
        elif op in ("is", "is not") and val.strip().strip("'\"").lower() == "null":
            parts.append(f"{qual}{col} IS {'NOT ' if op == 'is not' else ''}NULL")
        elif op == "is not":
            parts.append(f"{qual}{col} <> {_value_sql(val)}")
        else:
            parts.append(f"{qual}{col} {_OPS[op]} {_value_sql(val)}")
    return " AND ".join(parts)


def _infer_join_key(
    fact: str, fact_cols: list[str], dim: str, dim_cols: list[str]
) -> tuple[str, str]:
    """Resolve the ONE (fk, pk) pair linking two tables from their schemas.

    Two deterministic conventions cover the warehouse: TPC-H prefixed
    keys (``o_custkey`` ↔ ``c_custkey`` — same suffix after the table
    prefix, suffix contains 'key') and identical ``*_id``/key column
    names (``doc_id`` ↔ ``doc_id``). Zero or multiple candidates raise
    ``NLQueryError`` — the compiler never picks a join key silently,
    mirroring the reference's only-existing-fields rule."""

    def suf(c: str) -> str:
        return c.split("_", 1)[1] if "_" in c else c

    pairs: list[tuple[str, str]] = []
    for fc in fact_cols:
        for dc in dim_cols:
            if fc == dc and (fc.endswith("_id") or "key" in fc):
                pairs.append((fc, dc))
            elif fc != dc and "key" in suf(fc) and suf(fc) == suf(dc):
                pairs.append((fc, dc))
    uniq = sorted(set(pairs))
    if len(uniq) != 1:
        raise NLQueryError(
            f"cannot infer a unique join key between '{fact}' and '{dim}': "
            f"candidates {uniq or 'none'}"
        )
    return uniq[0]


def compile_nl(text: str, schemas: Mapping[str, list[str]]) -> str:
    """Compile one constrained NL request to one Spark-SQL string.

    ``schemas`` maps table name → column list (what the reference ships
    to the model as "Index/Mapping Information"). Aliases are
    deterministic (``agg_measure``, ``n``) so downstream consumers —
    and the DuckDB oracle — see stable column names."""
    return _compile(text, schemas)[0]


def _compile(text: str, schemas: Mapping[str, list[str]]) -> tuple[str, list[str]]:
    """Compile and report which tables the query references — every arm
    already resolves its table(s) via ``_ident``, so callers (``run_nl``)
    never have to re-derive references by regexing the generated SQL
    (which would also match table names inside string literals)."""
    req = text.strip().rstrip("?.!").strip()

    # -- count [rows in] TABLE [where COND] ---------------------------
    m = re.fullmatch(
        r"count\s+(?:rows\s+in\s+)?(\w+)(?:\s+where\s+(.+))?", req, flags=re.I
    )
    if m:
        table = _ident(m.group(1).lower(), list(schemas), "table")
        where = f" WHERE {_cond_sql(m.group(2), schemas[table])}" if m.group(2) else ""
        return f"SELECT count(*) AS n FROM {table}{where}", [table]

    # -- top N TABLE by MEASURE ---------------------------------------
    m = re.fullmatch(r"top\s+(\d+)\s+(\w+)\s+by\s+(\w+)", req, flags=re.I)
    if m:
        table = _ident(m.group(2).lower(), list(schemas), "table")
        measure = _ident(m.group(3), schemas[table], "column")
        return (
            f"SELECT * FROM {table} ORDER BY {measure} DESC LIMIT {int(m.group(1))}",
            [table],
        )

    # -- count distinct COL by DIM in TABLE [where COND] [top N] ------
    # (the reference's ES cardinality aggregation: how many unique X per Y)
    m = re.fullmatch(
        r"count\s+(?:distinct|unique)\s+(\w+)\s+by\s+(\w+(?:\s+and\s+\w+)*)"
        r"\s+(?:in|from)\s+(\w+)(?:\s+where\s+(.+?))?(?:\s+top\s+(\d+))?",
        req,
        flags=re.I,
    )
    if m:
        table = _ident(m.group(3).lower(), list(schemas), "table")
        cols = schemas[table]
        measure = _ident(m.group(1), cols, "column")
        dims = [_ident(d, cols, "column") for d in re.split(r"\s+and\s+", m.group(2), flags=re.I)]
        alias = f"n_distinct_{measure}"
        where = f" WHERE {_cond_sql(m.group(4), cols)}" if m.group(4) else ""
        dim_list = ", ".join(dims)
        sql = (
            f"SELECT {dim_list}, count(DISTINCT {measure}) AS {alias} "
            f"FROM {table}{where} GROUP BY {dim_list}"
        )
        if m.group(5):
            sql += f" ORDER BY {alias} DESC, {dim_list} LIMIT {int(m.group(5))}"
        return sql, [table]

    # -- AGG MEASURE by DIM [and DIM2] in TABLE [where COND]
    #    [having CMP N] [top N] -- (having = the ES min_doc_count /
    #    bucket-selector knob: keep only buckets whose aggregate clears
    #    a threshold)
    m = re.fullmatch(
        r"(total|sum|average|avg|min|max|count)\s+(\w+)\s+by\s+(\w+(?:\s+and\s+\w+)*)"
        r"\s+(?:in|from)\s+(\w+)(?:\s+where\s+(.+?))?"
        r"(?:\s+having\s+(over|under|at\s+least|at\s+most|>=|<=|>|<)\s+(-?\d+(?:\.\d+)?))?"
        r"(?:\s+top\s+(\d+))?",
        req,
        flags=re.I,
    )
    if m:
        agg = _AGGS[m.group(1).lower()]
        table = _ident(m.group(4).lower(), list(schemas), "table")
        cols = schemas[table]
        measure = _ident(m.group(2), cols, "column")
        dims = [_ident(d, cols, "column") for d in re.split(r"\s+and\s+", m.group(3), flags=re.I)]
        alias = f"{agg}_{measure}"
        where = f" WHERE {_cond_sql(m.group(5), cols)}" if m.group(5) else ""
        dim_list = ", ".join(dims)
        sql = (
            f"SELECT {dim_list}, {agg}({measure}) AS {alias} "
            f"FROM {table}{where} GROUP BY {dim_list}"
        )
        if m.group(6):
            if agg in ("sum", "avg"):
                # a float sum/avg compared to a threshold is
                # order-nondeterministic at the boundary (the exact
                # hazard the module's determinism contract exists to
                # exclude); count/min/max are order-exact
                raise NLQueryError(
                    "having thresholds support count/min/max only — a "
                    f"{agg} threshold is nondeterministic at the boundary; "
                    "filter on count or pre-round the measure"
                )
            op = {
                "over": ">", "under": "<", "at least": ">=", "at most": "<=",
            }.get(re.sub(r"\s+", " ", m.group(6).lower()), m.group(6))
            # full aggregate expression, not the alias: HAVING-on-alias
            # resolution differs between engines
            sql += f" HAVING {agg}({measure}) {op} {m.group(7)}"
        if m.group(8):
            # Dims are a unique key of the grouped result, so appending
            # them makes the top-N cutoff deterministic when aggregate
            # values tie (otherwise two engines can legally pick
            # different rows at the LIMIT boundary).
            sql += f" ORDER BY {alias} DESC, {dim_list} LIMIT {int(m.group(8))}"
        return sql, [table]

    # -- daily|monthly|yearly AGG [MEASURE] in TABLE [by DATECOL] -----
    # (the ES date_histogram aggregation: bucket by calendar interval,
    # aggregate per bucket — the reference's dashboard-trend request).
    # The date column may be named with `by COL`; otherwise it is
    # inferred, and inference must be UNIQUE — two date-like columns
    # without an explicit choice is an error, not a guess.
    m = re.fullmatch(
        r"(daily|monthly|yearly)\s+(total|sum|average|avg|min|max|count)"
        r"(?:\s+of)?(?:\s+(\w+))?\s+(?:in|from)\s+(\w+)"
        r"(?:\s+by\s+(\w+))?(?:\s+where\s+(.+))?",
        req,
        flags=re.I,
    )
    if m:
        unit = m.group(1).lower()
        agg = _AGGS[m.group(2).lower()]
        table = _ident(m.group(4).lower(), list(schemas), "table")
        cols = schemas[table]
        if m.group(5):
            date_col = _ident(m.group(5), cols, "column")
        else:
            cands = [c for c in cols if re.search(r"date|_dt$|^ts$|_ts$|time", c)]
            if len(cands) != 1:
                raise NLQueryError(
                    f"table {table}: cannot infer the date column "
                    f"(candidates {cands}); name it with 'by <column>'"
                )
            date_col = cands[0]
        fmt = {"daily": "yyyy-MM-dd", "monthly": "yyyy-MM", "yearly": "yyyy"}[unit]
        bucket = {"daily": "day", "monthly": "month", "yearly": "year"}[unit]
        if agg == "count" and not m.group(3):
            sel, alias = "count(*)", "n"
        else:
            if not m.group(3):
                raise NLQueryError(f"{agg} needs a measure column")
            measure = _ident(m.group(3), cols, "column")
            sel, alias = f"{agg}({measure})", f"{agg}_{measure}"
        where = f" WHERE {_cond_sql(m.group(6), cols)}" if m.group(6) else ""
        expr = f"date_format({date_col}, '{fmt}')"
        return (
            f"SELECT {expr} AS {bucket}, {sel} AS {alias} FROM {table}{where} "
            f"GROUP BY {expr}",
            [table],
        )

    # -- distinct COL[, COL...] from TABLE [where COND] ---------------
    # (the reference's terms-facet request: enumerate a field's values)
    m = re.fullmatch(
        r"(?:distinct|unique)\s+([\w,\s]+?)\s+(?:from|in)\s+(\w+)(?:\s+where\s+(.+))?",
        req,
        flags=re.I,
    )
    if m:
        table = _ident(m.group(2).lower(), list(schemas), "table")
        cols = schemas[table]
        sel = [_ident(c.strip(), cols, "column") for c in m.group(1).split(",")]
        where = f" WHERE {_cond_sql(m.group(3), cols)}" if m.group(3) else ""
        return f"SELECT DISTINCT {', '.join(sel)} FROM {table}{where}", [table]

    # -- AGG MEASURE in TABLE [where COND] (scalar — no group-by) -----
    # (the reference's single-metric answer: one aggregated value)
    m = re.fullmatch(
        r"(total|sum|average|avg|min|max|count)\s+(\w+)\s+(?:in|from)\s+(\w+)"
        r"(?:\s+where\s+(.+))?",
        req,
        flags=re.I,
    )
    if m:
        agg = _AGGS[m.group(1).lower()]
        table = _ident(m.group(3).lower(), list(schemas), "table")
        cols = schemas[table]
        measure = _ident(m.group(2), cols, "column")
        alias = f"{agg}_{measure}"
        where = f" WHERE {_cond_sql(m.group(4), cols)}" if m.group(4) else ""
        return f"SELECT {agg}({measure}) AS {alias} FROM {table}{where}", [table]

    # -- show COLS from TABLE [where COND] with [its] DIM info --------
    # (the reference's cross-index flow: top search hits from one index,
    # then a keyed lookup into a second index whose fields merge into the
    # result — Openapi/openai_elasticsearch.py:224-292. Compiled as ONE
    # broadcast lookup join over the registered views; the join key pair
    # is inferred from the schemas, never guessed from the text.)
    m = re.fullmatch(
        r"show\s+([\w,\s]+?)\s+from\s+(\w+)(?:\s+where\s+(.+?))?"
        r"\s+with\s+(?:its\s+)?(\w+)\s+info",
        req,
        flags=re.I,
    )
    if m:
        fact = _ident(m.group(2).lower(), list(schemas), "table")
        dim = _ident(m.group(4).lower(), list(schemas), "table")
        fcols, dcols = schemas[fact], schemas[dim]
        sel = [_ident(c.strip(), fcols, "column") for c in m.group(1).split(",")]
        fk, pk = _infer_join_key(fact, fcols, dim, dcols)
        where = f" WHERE {_cond_sql(m.group(3), fcols, qual='f.')}" if m.group(3) else ""
        # BROADCAST hint: the dim side of the reference's lookup is a
        # point-query-sized index; at warehouse scale it's the small
        # side, so the join must never shuffle the fact. DuckDB parses
        # /*+ … */ as a plain block comment, so the twin runs verbatim.
        fact_sel = ", ".join(f"f.{c}" for c in sel)
        # dim columns must not collide with the emitted fact columns —
        # under the identical-name key convention (fk == pk) the dim key
        # duplicates a selected fact column and the result would carry
        # two same-named columns (ambiguous downstream, breaks the
        # oracle's by-name compare). The join key is dropped when its
        # value is already present (f.fk = d.pk on an inner join);
        # any other same-named dim column keeps its value under a
        # dim-prefixed alias.
        dim_parts = []
        for c in dcols:
            if c == pk and fk == pk and fk in sel:
                continue
            dim_parts.append(f"d.{c} AS {dim}_{c}" if c in sel else f"d.{c}")
        all_sel = ", ".join([fact_sel, *dim_parts]) if dim_parts else fact_sel
        return (
            f"SELECT /*+ BROADCAST(d) */ {all_sel} "
            f"FROM {fact} f JOIN {dim} d ON f.{fk} = d.{pk}{where}",
            [fact, dim],
        )

    # -- show COL[, COL...] from TABLE [where COND] [limit N] ---------
    m = re.fullmatch(
        r"show\s+([\w,\s]+?)\s+from\s+(\w+)(?:\s+where\s+(.+?))?(?:\s+limit\s+(\d+))?",
        req,
        flags=re.I,
    )
    if m:
        table = _ident(m.group(2).lower(), list(schemas), "table")
        cols = schemas[table]
        sel = [_ident(c.strip(), cols, "column") for c in m.group(1).split(",")]
        where = f" WHERE {_cond_sql(m.group(3), cols)}" if m.group(3) else ""
        limit = f" LIMIT {int(m.group(4))}" if m.group(4) else ""
        return f"SELECT {', '.join(sel)} FROM {table}{where}{limit}", [table]

    raise NLQueryError(
        f"cannot parse request '{text}' — supported forms: count/top/agg-by/show"
    )


class _LazySchemas(Mapping):
    """Table → column-list mapping that probes a parquet footer only when
    a table is actually referenced. ``compile_nl`` validates the ONE
    table a request names; eagerly loading all ten warehouse schemas per
    request cost ~5 s of footer/dtype probing at the 10× sweep — pure
    overhead for a single-table query. A real ``Mapping`` (not a dict
    with placeholder values) so every access path — ``[]``, ``get``,
    ``items``, ``values`` — goes through the lazy loader."""

    def __init__(self, spark: SparkSession, sf_dir: str, tables: list[str]):
        self._tables = list(tables)
        self._cache: dict[str, list[str]] = {}
        self._spark, self._sf_dir = spark, sf_dir

    def __getitem__(self, table: str) -> list[str]:
        from ..catalog import load_table

        if table not in self._tables:
            raise KeyError(table)
        if table not in self._cache:
            self._cache[table] = load_table(self._spark, self._sf_dir, table).columns
        return self._cache[table]

    def __iter__(self):
        return iter(self._tables)

    def __len__(self) -> int:
        return len(self._tables)


def run_nl(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Compile and execute one NL request against the warehouse views
    (the reference's end-to-end demo flow: request → query → search).
    Only the tables the compiled SQL references are registered — one
    footer probe per request, not ten."""
    from ..catalog import TABLES, load_table

    schemas = _LazySchemas(spark, sf_dir, list(TABLES))
    sql, tables = _compile(text, schemas)
    dfs = {}
    for t in tables:
        dfs[t] = load_table(spark, sf_dir, t)
        dfs[t].createOrReplaceTempView(t)
    if "/*+ BROADCAST(d) */" in sql and len(tables) == 2:
        # The join intent's dim (second referenced table) scales with
        # the corpus — same trap as the flagship's forced dim
        # broadcasts (SCALE §6b-r7): past the gate, drop the hint and
        # let AQE pick the join. DuckDB parses the hint as a comment
        # either way, so the oracle semantics are unchanged.
        from ..operators.joins import BROADCAST_GATE_BYTES, input_bytes

        nbytes = input_bytes(dfs[tables[1]])
        if nbytes is None or nbytes > BROADCAST_GATE_BYTES:
            # first occurrence only: the real hint always directly
            # follows SELECT; a user value could legally contain the
            # same characters inside a quoted literal
            sql = sql.replace("/*+ BROADCAST(d) */ ", "", 1)
    return spark.sql(sql)
