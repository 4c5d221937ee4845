"""quality_micro's O(1) boundary-empty correction must be byte-identical
to the full ``array_remove(tokens, '')`` strip for ALL inputs.

The r11 review fix stripped empties with an array pass whose re-inlined
copies regressed corpus_prepare 1.85x; the r12 form subtracts the (at
most two, boundary-only) empties via element_at probes. This test pins
the structural claim that makes the O(1) form valid: ``tokens()`` =
``split(trim(lower), '\\s+')`` can produce '' only at positions 1 and
-1 (trim strips only ASCII space; the regex collapses interior runs),
so count-of-empties == lead + trail and any-empty == lead|trail.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from data_engineering_spark.operators.text import micro_ratio, quality_micro, tokens


def _qm_full_strip() -> F.Column:
    """Reference form: strip every '' then score (the r11 semantics)."""
    toks = F.array_remove(tokens("text"), "")
    n = F.size(toks).cast("long")
    d = F.size(F.array_distinct(toks)).cast("long")
    num = F.lit(200).cast("long") * d + n * F.least(n, F.lit(200).cast("long"))
    den = F.lit(400).cast("long") * n
    return F.when(n == 0, F.lit(0).cast("long")).otherwise(micro_ratio(num, den))


ADVERSARIAL = [
    "",
    " ",
    "   ",
    "\t",
    "\t\t",
    "\n\n\n",
    "\x0b",
    "\f\r",
    "a",
    " a ",
    "\ta",
    "a\n",
    "\ta b\n",
    "a  b  a",
    "the the the",
    " \t \n mixed ws\x0b doc \f",
    "ends with tab\t",
    "\nstarts with newline",
    "UPPER Case MiXeD",
    "unicode nbsp is a token char",
]


def test_quality_micro_equals_full_strip_adversarial(spark):
    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], "text string")
    got = [r[0] for r in df.select(quality_micro("text")).collect()]
    want = [r[0] for r in df.select(_qm_full_strip()).collect()]
    assert got == want


def test_quality_micro_equals_full_strip_random(spark):
    rng = random.Random(12)
    alphabet = string.ascii_lowercase[:4] + " \t\n\x0b\f\r"
    rows = [
        ("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30))),)
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r[0] for r in df.select(quality_micro("text")).collect()]
    want = [r[0] for r in df.select(_qm_full_strip()).collect()]
    assert got == want


def test_blank_docs_score_zero_and_fail_keep(spark):
    from data_engineering_spark.operators.text import quality_score

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\t\n"), (4, "a real document with words")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_score(df).collect()}
    for i in (1, 2, 3):
        assert out[i]["quality"] == 0.0 and not out[i]["keep"]
    assert out[4]["quality"] > 0.0
