"""Scalar-function pack (SURVEY §2.8, F1-F17).

Every helper returns a Column built from JVM-side built-ins — nothing here
leaves WholeStageCodegen. The reference reaches these semantics through
Redshift SQL text (``nvl``/``to_char``/``||``) or driver-side Python
(``re.sub`` chains); we re-express each as `pyspark.sql.functions`
compositions so the whole projection stays codegen'd.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "nvl",
    "to_char_yyyymmdd",
    "kst_now",
    "scrub_to_null",
    "case_like_normalize",
    "rebuild_timestamp",
    "clean_text",
    "listagg_distinct",
    "listagg_ordered",
]


def nvl(col: Column | str, default) -> Column:
    """F1 — ``nvl(col, default)`` (20+ uses, reference
    ``Talent_Opportunity_Platform/Elastic_indexing.py:109-129``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def to_char_yyyymmdd(col: Column | str) -> Column:
    """F9 — Redshift ``to_char(ts,'YYYYMMDD')`` → ``date_format``
    (reference ``Elastic_indexing.py:130``, ``BkupRs.py:238,246``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd")


def kst_now() -> Column:
    """F11 — the reference's pervasive UTC→KST shift
    (``AWS_GLUE_ETL.py:119``: ``current_timestamp() + INTERVAL 9 HOURS``)."""
    return F.current_timestamp() + F.expr("INTERVAL 9 HOURS")


def scrub_to_null(col: Column | str, *sentinels: str) -> Column:
    """P10 — map placeholder strings ('-', '[]', 'N/A', '') to NULL
    (reference ``log_screen.py:186-198``, ``ETL_esrd.py:104-107``)."""
    c = F.col(col) if isinstance(col, str) else col
    sentinels = sentinels or ("-",)
    return F.when(c.isin(*sentinels), F.lit(None)).otherwise(c)


def case_like_normalize(
    col: Column | str,
    rules: Sequence[tuple[str, str]],
    default: Column | str | None = None,
) -> Column:
    """F8 — nested CASE WHEN … LIKE canonicalization chain (the ~20-branch
    screen-name normalizer, reference ``log_screen.py:253-291``).

    ``rules`` is an ordered list of (LIKE-pattern, replacement); first match
    wins, like SQL CASE.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for pattern, value in rules:
        cond = c.like(pattern)
        expr = F.when(cond, F.lit(value)) if expr is None else expr.when(cond, F.lit(value))
    if expr is None:
        return c
    if default is None:
        return expr.otherwise(c)
    return expr.otherwise(default if isinstance(default, Column) else F.lit(default))


def rebuild_timestamp(date8: Column | str, time8: Column | str) -> Column:
    """F10 — parse a timestamp rebuilt from string parts. The reference
    assembles ``substring(dt,1,8) || ' ' || substring(tm,1,8)`` then
    ``to_timestamp`` (``log_screen.py:292``); a single to_timestamp with an
    explicit format replaces the substring chain.

    ``concat`` (NULL-propagating, matching SQL ``||``), NOT
    ``concat_ws`` (NULL-SKIPPING): with a NULL time part concat_ws
    emitted the bare date, which to_timestamp under Spark 4's default
    ANSI mode rejects as CANNOT_PARSE_TIMESTAMP — a single NULL part
    crashed the whole query at runtime where the reference's ``||``
    yields NULL (r12 functions review; invisible to the f10 oracle,
    whose inputs derive non-null from ts)."""
    d = F.col(date8) if isinstance(date8, str) else date8
    t = F.col(time8) if isinstance(time8, str) else time8
    return F.to_timestamp(F.concat(d, F.lit(" "), t), "yyyyMMdd HH:mm:ss")


def clean_text(col: Column | str) -> Column:
    """F14 — the Korean-NLP pre-clean regex chain (reference
    ``Keyword.py:205-207``): strip non-word symbols, collapse runs of
    whitespace, trim. Kept unicode-safe."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[^A-Za-z0-9가-힣!?,\. ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def listagg_distinct(col: Column | str, sep: str = ",") -> Column:
    """A1 — Redshift ``listagg(distinct x, sep)`` (reference
    ``Elastic_indexing.py:135,144``). Both systems leave ordering
    unspecified; we canonicalize with ``array_sort`` so results are
    deterministic and oracle-comparable. Executes as a partial
    (map-side) collect_set → merge — no extra shuffle beyond the groupBy.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_set(c)), sep)


def listagg_ordered(col: Column | str, sep: str = ", ") -> Column:
    """A2 — ``array_join(collect_list(x), sep)`` (reference
    ``Keyword.py:178``). collect_list order after a shuffle is
    nondeterministic, so we sort elements — same canonicalization the
    tests would otherwise need."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_list(c)), sep)
