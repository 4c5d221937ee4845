"""Redshift → Spark SQL dialect shim (SURVEY §4 "custom work").

The reference ships SQL *text* to Redshift (``Talent_Opportunity_Platform/
AWS_GLUE_ETL.py:91-106``) and wraps exports in ``UNLOAD ($$…$$) TO 's3://…'``
(``Elastic_indexing.py:103-166``). To run that text verbatim on Spark we do a
small, purely textual rewrite — no parser, no Catalyst rule needed:

- ``UNLOAD ($$ sql $$) TO 's3://…' …options`` → inner SQL + parsed sink opts
- ``listagg(distinct x, 'sep') within group (order by …)`` / plain
  ``listagg`` → ``array_join(array_sort(collect_set(x)), 'sep')``
- ``to_char(ts, 'YYYYMMDD')`` → ``date_format(ts, 'yyyyMMdd')``
- ``getdate()`` / ``sysdate`` → ``current_timestamp()``
- ``nvl`` passes through (Spark SQL has it natively).

This is best-effort text rewriting for the reference's observed dialect
surface, not a general translator.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["rewrite_redshift_sql", "parse_unload", "UnloadSpec"]

_FMT_MAP = [
    ("YYYYMMDD", "yyyyMMdd"),
    ("YYYY-MM-DD", "yyyy-MM-dd"),
    ("YYYYMM", "yyyyMM"),
    ("YYYY", "yyyy"),
    ("HH24:MI:SS", "HH:mm:ss"),
    ("HH:MI:SS", "HH:mm:ss"),
]


@dataclass
class UnloadSpec:
    """Parsed ``UNLOAD`` statement: inner query + sink options
    (reference options at ``Elastic_indexing.py:161-165``)."""

    sql: str
    target: str | None = None
    options: dict[str, str] = field(default_factory=dict)


def _rewrite_to_char(sql: str) -> str:
    def repl(m: re.Match) -> str:
        fmt = m.group(2)
        for rs, sp in _FMT_MAP:
            fmt = fmt.replace(rs, sp).replace(rs.lower(), sp)
        return f"date_format({m.group(1)}, '{fmt}')"

    # arg may contain one nested call level, e.g. to_char(max(o_orderdate), 'YYYYMMDD')
    return re.sub(
        r"to_char\s*\(\s*((?:[^,()']|\([^()]*\))+?)\s*,\s*'([^']+)'\s*\)", repl, sql, flags=re.I
    )


def _rewrite_listagg(sql: str) -> str:
    # listagg(distinct col, 'sep') [within group (order by ...)]
    pat = re.compile(
        r"listagg\s*\(\s*(distinct\s+)?([A-Za-z0-9_.]+)\s*(?:,\s*'([^']*)')?\s*\)"
        r"(?:\s*within\s+group\s*\(\s*order\s+by[^)]*\))?",
        re.I,
    )

    def repl(m: re.Match) -> str:
        distinct, col, sep = m.group(1), m.group(2), m.group(3) or ""
        inner = f"collect_set({col})" if distinct else f"collect_list({col})"
        return f"array_join(array_sort({inner}), '{sep}')"

    return pat.sub(repl, sql)


def rewrite_redshift_sql(sql: str) -> str:
    """Rewrite the reference's Redshift dialect into Spark SQL text."""
    out = sql.strip().rstrip(";")  # the reference strips ';' too (AWS_GLUE_ETL.py:92)
    out = _rewrite_to_char(out)
    out = _rewrite_listagg(out)
    out = re.sub(r"\bgetdate\s*\(\s*\)", "current_timestamp()", out, flags=re.I)
    out = re.sub(r"\bsysdate\b", "current_timestamp()", out, flags=re.I)
    return out


def parse_unload(sql: str) -> UnloadSpec:
    """Split ``UNLOAD ($$…$$) TO 'uri' opt…`` into query + sink spec.

    The reference's options (``Elastic_indexing.py:161-165``):
    ``json parallel OFF gzip allowoverwrite``. ``parallel OFF`` maps to
    ``coalesce(1)``, ``gzip`` to the codec option — see
    ``sources/writers.py:write_unload``.
    """
    m = re.search(
        r"UNLOAD\s*\(\s*\$\$(.*?)\$\$\s*\)\s*TO\s*'([^']+)'(.*)$",
        sql,
        re.I | re.S,
    )
    if not m:
        return UnloadSpec(sql=rewrite_redshift_sql(sql))
    inner, target, tail = m.group(1), m.group(2), m.group(3)
    opts: dict[str, str] = {}
    tail_l = tail.lower()
    if "json" in tail_l:
        opts["format"] = "json"
    if re.search(r"parallel\s+off", tail_l):
        opts["parallel"] = "off"
    if "gzip" in tail_l:
        opts["compression"] = "gzip"
    if "allowoverwrite" in tail_l:
        opts["mode"] = "overwrite"
    return UnloadSpec(sql=rewrite_redshift_sql(inner), target=target, options=opts)
