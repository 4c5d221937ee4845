"""quality_micro's guard-free form (arithmetic zero-guard via
``den = greatest(400n, 1)``) must be byte-identical to the r11
when-guarded strip form for ALL inputs.

The r11 blank-doc fix regressed corpus_prepare 1.85x — not from the
``array_remove`` strip itself but from its ``when(n==0)`` guard, whose
conditional execution disqualified the whole key from codegen
subexpression elimination in multi-evaluation consumers. The r12 form
keeps the strip and removes the CONDITIONAL: the floored denominator
makes the blank case ``(2e6*0 + 1) div 2 = 0`` arithmetically. These
tests pin the equivalence against the guarded reference form on
adversarial whitespace shapes and randomized strings, plus the
production contract (blank docs score 0 and fail keep).
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
