"""Text-analysis operators over the ``documents`` table (SURVEY §2.10
north-star: text_stats / language-ID / quality scoring / token counting /
fingerprinting).

Grounded in the reference's NLP surface — the tokenize→clean→score pipeline
of ``Talent_Opportunity_Platform/Keyword.py:192-228`` and the pynori
analyzer demo (``pynori_test.py:4-27``) — but re-expressed as pure
JVM-side column expressions: no UDF, no collect, whole-stage codegen end to
end. Every op is embarrassingly parallel (per-row), so it scales linearly
with input splits at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count_regex",
    "text_stats",
    "fingerprint",
    "winnow_fingerprints",
    "lang_id",
    "micro_ratio",
    "quality_micro",
    "quality_score",
    "query_string_rank",
    "match_phrase_rank",
    "phrase_merge_rounds",
    "phrase_merge_rounds_batched",
    "significant_terms",
    "more_like_this",
    "percolate",
    "highlight_snippets",
]

# BPE-ish pre-tokenizer: word pieces or single non-space symbols.
# Same regex is used verbatim in the DuckDB oracle (both engines use
# RE2-compatible syntax for this subset).
TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Marker words for the n-gram language-ID heuristic. On real corpora these
# would be per-language stopword lists; the heuristic structure (count
# marker hits → argmax) is the operator under test.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "fast"),
    "und": (),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text (the reference's
    CountVectorizer input shape, ``Keyword.py:82-89``).

    CONTRACT NOTE: on empty/whitespace-only text this returns the split
    artifact ``['']`` (size 1), identically in Spark and DuckDB's
    ``string_split_regex`` — every oracle pair shares the quirk, so
    counts stay cross-engine consistent. Consumers whose SEMANTICS
    require "no tokens" for a blank doc must strip it explicitly the
    way :func:`quality_micro` does (``array_remove(toks, '')`` +
    zero-guard)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count_regex(col: Column | str, pattern: str = TOKEN_REGEX) -> Column:
    """Token counting with a BPE-ish regex (words + punctuation symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: token count, distinct tokens, type-token ratio,
    average token length, char count. One projection — no shuffle."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("type_token_ratio"),
        F.round(
            (F.length(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", "")))
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    md5 is bit-identical across Spark and DuckDB, which makes the
    fingerprint oracle-checkable (unlike xxhash64). Used as the exact-dedup
    grouping key in ``operators/dedup.py``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def _marker_hits(text: Column, word: str) -> Column:
    # occurrences of ` word ` as a standalone token; padded ends so edge
    # tokens count too. length-delta trick is portable to the oracle.
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (F.length(padded) - F.length(F.regexp_replace(padded, needle, " "))) / (
        len(needle) - 1
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Language-ID heuristic: marker-token hit rate → threshold.

    Shape of a real n-gram lang-ID (count class-marker n-grams, argmax)
    with a deterministic, oracle-expressible scorer. Per-row only — scales
    with splits.
    """
    text = F.col(text_col)
    en_hits = sum(
        (_marker_hits(text, w) for w in LANG_MARKERS["en"]),
        F.lit(0.0),
    )
    n_toks = F.size(tokens(text))
    score = F.round(en_hits / n_toks, 6)
    return df.select(
        F.col(id_col),
        score.alias("en_marker_ratio"),
        F.when(score >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
    )


def micro_ratio(numer: Column, denom: Column) -> Column:
    """Half-up 1e-6 fixed point of ``numer/denom`` as exact int64 — the
    engine-portable ratio key: ``(2e6*numer + denom) div (2*denom)`` in
    pure integer arithmetic. Use for any ratio that RANKS, FILTERS, or
    GROUPS (quality keys, repetition fractions, band cuts): a
    ``round(double, 6)`` key can flip across engines when the double's
    shortest-decimal repr and exact binary value straddle a rounding
    boundary, and at 1e9+ rows a within-ulp boundary hit is an expected
    event. Requires 0 ≤ numer and 0 < denom with
    ``2e6*numer + denom < 2^63`` — the full int64 range, and the
    multiply fails LOUDLY under ANSI beyond it. (An earlier version
    floor-divided via double, ``(a - a%b)/b``, which silently loses
    ulps once ``a ≥ 2^53`` — docs over ~11M tokens would produce a key
    off by 1 micro from the oracle's true integer ``//`` with no error
    raised; Spark's integral ``div`` has no such window.)"""
    a = F.lit(2000000).cast("long") * numer.cast("long") + denom.cast("long")
    b = F.lit(2).cast("long") * denom.cast("long")
    return F.call_function("div", a, b).cast("long")


def quality_micro(text_col: str = "text") -> Column:
    """The corpus quality key ``0.5*ttr + 0.5*min(n/200, 1)`` as an
    EXACT int64 in 1e-6 fixed point: with ``d`` distinct of ``n`` tokens
    it equals ``(200*d + n*min(n,200)) / (400*n)``, and the half-up
    micro rounding is the pure-integer ``(2e6*num + den) div (2*den)``.
    Shared by every consumer that RANKS, FILTERS, or GROUPS on quality
    (keep_best_dedup, token_budget_select, quality_score's keep flag):
    a 6-dp double ``round`` key is not engine-portable — JVM
    shortest-decimal vs exact-binary rounding flips boundary micros, and
    at 1e9+ documents a within-ulp boundary hit is an EXPECTED event,
    not a tail risk (≈4e-10 per value; the round-8 driver red row was
    exactly this flip reordering a greedy prefix).

    Blank documents score 0, not 0.5025: ``tokens('')`` returns the
    split artifact ``['']`` (size 1), which used to give every empty or
    whitespace-only document ttr = 1 and a PASSING quality verdict (the
    r11 whole-file review — invisible to the oracle because DuckDB's
    string_split_regex shares the artifact). The zero-token guard is
    ARITHMETIC, not a CaseWhen: ``den = greatest(400n, 1)`` makes the
    blank case ``(2e6·0 + 1) div 2 = 0`` with no conditional — the r11
    form's ``when(n == 0, ...)`` put every branch expression under
    conditional execution, which DISQUALIFIES them from whole-stage
    codegen's subexpression elimination, so consumers that evaluate the
    key several times per row (filter-pushdown substitutes the whole
    tree into the scan predicate AND both output columns) recomputed
    the tokenize+strip per reference. That, not the strip itself, was
    the 1.85× ``corpus_prepare`` bench regression the r11 verdict
    priced: measured at sf0.1 in the quality_score+filter shape — r10
    unguarded 0.38 s, r11 when-guard 0.89 s, this form 0.45 s; pure
    one-column projection 0.15 s vs r10's 0.15 s. Residual ~0.07 s in
    the filter shape is the array_remove copy — the priced cost of the
    blank-doc fix. Byte-identical to the guarded strip form on
    adversarial + randomized inputs (tests/test_text_quality.py)."""
    toks = F.array_remove(tokens(text_col), "")
    n = F.size(toks).cast("long")
    d = F.size(F.array_distinct(toks)).cast("long")
    num = F.lit(200).cast("long") * d + n * F.least(n, F.lit(200).cast("long"))
    den = F.greatest(F.lit(400).cast("long") * n, F.lit(1).cast("long"))
    return micro_ratio(num, den)


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document quality scoring à la pretraining-data filters: combines
    length, mean token length, and lexical diversity into one bounded
    score. Weights are illustrative; the operator contract is the
    deterministic per-row projection.

    The keep VERDICT compares the exact integer micro key (≥ 300000),
    never a rounded double — see :func:`quality_micro`; the emitted
    ``quality`` double is ``micro / 1e6``, a single identical IEEE
    division in any engine, so it hashes cross-engine too."""
    micro = quality_micro(text_col)
    return df.select(
        F.col(id_col),
        F.col(text_col),
        (micro / F.lit(1000000.0)).alias("quality"),
        (micro >= F.lit(300000)).alias("keep"),
    )


def winnow_fingerprints(col: Column | str, k: int = 8, window: int = 4) -> Column:
    """Winnowed rolling-hash document fingerprints (the MOSS scheme): a
    polynomial rolling hash over every ``k``-char gram, then the minimum
    of each ``window`` of consecutive gram hashes — a position-robust
    fingerprint set whose overlap localizes shared passages (unlike the
    whole-document md5 ``fingerprint``, which any edit breaks).

    Implemented as an Arrow-batched pandas_udf (NumPy O(n) rolling hash +
    vectorized window minima) rather than array expressions: Catalyst's
    CollapseProject re-inlines a gram-array subexpression into every
    window element, turning the expression form O(n²) per document. The
    udf is a pure projection — no shuffle until someone joins on the
    exploded fingerprints."""
    from pyspark.sql.functions import pandas_udf

    B = 1000003
    # Modulus is 2^64 via uint64 wraparound: NumPy unsigned arithmetic IS
    # mod-2^64, so the polynomial hash needs no explicit reduction and the
    # whole gram-hash computation stays vectorized (k fused multiply-adds
    # over the byte array — no per-byte Python loop; that loop was the
    # dominant CPU cost of the fingerprint path at corpus scale).
    weights = np.array(
        [pow(B, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64
    )

    @pandas_udf("array<long>")
    def winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not isinstance(t, str) or not t:
                out.append([])
                continue
            norm = " ".join(t.lower().split())
            data = norm.encode("utf-8")
            if len(data) < k:
                data = data + b" " * (k - len(data))
            a = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
            n = len(a) - k + 1
            # hash_i = Σ_j a[i+j]·B^(k-1-j)  (mod 2^64), k vector ops total
            hashes = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                hashes += a[j : j + n] * weights[j]
            # window minima via stride trick, then distinct
            if len(hashes) <= window:
                mins = np.array([hashes.min()], dtype=np.uint64)
            else:
                win = np.lib.stride_tricks.sliding_window_view(hashes, window)
                mins = win.min(axis=1)
            out.append(np.unique(mins).astype(np.int64).tolist())
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    return winnow(c)


def query_string_rank(
    df: DataFrame,
    terms: list[str],
    fields: dict[str, int],
    id_col: str = "doc_id",
    fuzziness: int | dict[str, int] = 1,
    k: int = 20,
) -> DataFrame:
    """Elasticsearch ``query_string`` semantics over warehouse columns —
    the knob surface the reference's serving queries expose
    (Openapi/openai_elasticsearch.py:160-170 searches a FIELDS list;
    query_string's per-field boosts and ``term~N`` fuzziness are the two
    ES niceties the r5 verdict listed as missing):

    - **multi-field**: every (field, boost) entry contributes matches;
    - **boosts**: integer per-field weights (integer so the score is an
      exact sum — no float-ordering hazard in the top-k);
    - **fuzziness**: a token matches a query term when
      ``levenshtein(tok, term) <= fuzziness`` (JVM-side expression, the
      same function DuckDB exposes for the oracle). Pass a
      ``{field: N}`` dict for per-field fuzziness (ES sets fuzziness per
      clause); a field at 0 joins on plain equality — a hash join, and
      the discriminative choice for low-cardinality keyword fields whose
      whole value space sits within one edit of itself.

    Scale shape: each field arm explodes tokens inside its scan stage and
    matches against the tiny broadcast term list (``fuzziness``+length
    guard keeps it a cheap constant per token — |terms| levenshtein evals,
    no vocabulary shuffle); the arms union BEFORE the single doc-keyed
    count, so the whole query is ONE partial-agg shuffle plus a
    TakeOrdered. Nothing but (id, boost) pairs leave the scan."""
    if not fields:
        raise ValueError("query_string_rank: `fields` must name at least one (field, boost)")
    if isinstance(fuzziness, dict):
        unknown = sorted(set(fuzziness) - set(fields))
        if unknown:
            raise ValueError(
                f"query_string_rank: fuzziness keys {unknown} are not in `fields` "
                f"{sorted(fields)}"
            )
    spark = df.sparkSession
    terms_df = spark.createDataFrame([(t,) for t in terms], "term string")
    arms = []
    for field, boost in fields.items():
        # ES defaults unlisted clauses to exact match; a field missing
        # from a dict-valued fuzziness gets 0 rather than a KeyError.
        fz = fuzziness.get(field, 0) if isinstance(fuzziness, dict) else fuzziness
        toks = df.select(F.col(id_col), F.explode(tokens(field)).alias("tok"))
        cond = (
            F.col("tok") == F.col("term")
            if fz == 0
            else (F.abs(F.length("tok") - F.length("term")) <= fz)
            & (F.levenshtein(F.col("tok"), F.col("term")) <= fz)
        )
        arms.append(
            toks.join(F.broadcast(terms_df), cond).select(
                F.col(id_col), F.lit(boost).alias("boost")
            )
        )
    matches = arms[0]
    for a in arms[1:]:
        matches = matches.unionByName(a)
    return (
        matches.groupBy(id_col)
        .agg(F.sum("boost").cast("long").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def significant_terms(
    df: DataFrame,
    foreground,
    k: int = 20,
    min_doc_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Elasticsearch ``significant_terms`` aggregation: terms that are
    UNUSUALLY frequent in a foreground slice relative to the whole index
    — ES's "what is this bucket about" primitive, scored with ES's JLH
    heuristic ``(fg% − bg%) · (fg% / bg%)`` over document frequencies.
    ``foreground`` is a boolean Column picking the slice (ES: the bucket
    under a filter agg).

    Portability contract: doc frequencies and set sizes are exact longs;
    the JLH score is a fixed sequence of IEEE divisions/multiplications
    over those integers (each operation correctly rounded by the
    standard, unlike transcendental fns), so ``jlh_micro`` is
    bit-identical in any IEEE engine.

    Scale shape: ONE distinct (doc, term) projection feeds both
    frequency tables (background = vocabulary-keyed partial agg;
    foreground = same under the filter); the fg⋈bg vocabulary join is
    left to AQE — a stratum vocabulary is data-sized, never a safe
    forced broadcast; set sizes ride as a broadcast 1-row agg; ranking
    is a TakeOrdered. Nothing wider than (doc, term) leaves a scan."""
    dt = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term"),
        foreground.alias("_fg"),
    )
    bg = dt.groupBy("term").agg(
        F.count(F.lit(1)).alias("bgc"),
        F.sum(F.col("_fg").cast("long")).alias("fgc"),
    )
    tot = F.broadcast(
        df.agg(
            F.count(F.lit(1)).cast("double").alias("B"),
            F.sum(foreground.cast("long")).cast("double").alias("Fg"),
        )
    )
    fgr = F.col("fgc").cast("double") / F.col("Fg")
    bgr = F.col("bgc").cast("double") / F.col("B")
    return (
        bg.filter(F.col("fgc") >= min_doc_count)
        .join(tot)
        .select(
            "term",
            F.col("fgc").cast("long").alias("fg_docs"),
            F.col("bgc").cast("long").alias("bg_docs"),
            F.round(((fgr - bgr) * (fgr / bgr)) * F.lit(1e6))
            .cast("long")
            .alias("jlh_micro"),
        )
        .orderBy(F.col("jlh_micro").desc(), "term")
        .limit(k)
    )


def more_like_this(
    df: DataFrame,
    like_id: int,
    k: int = 15,
    max_query_terms: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Elasticsearch ``more_like_this`` query: pick the source doc's
    ``max_query_terms`` most distinctive terms (tf·idf, ES's term
    selection), then rank every other doc by the summed idf of the query
    terms it contains — "find documents like this one" without an
    embedding model.

    Portability contract: idf = ln((N+1)/(df+1)) is rounded to 1e-6
    fixed point once, on the source-doc-bounded term table (≤ the
    source's distinct terms — tiny); query-term selection is
    tf·idf_micro, an exact integer product; per-doc scores are exact
    integer sums of matched idf_micro.

    Scale shape: the source doc filters down inside its scan (at 100 TB
    this is a partition-pruned point lookup); its term stats need one
    df count over the corpus' distinct (doc, term) stream SEMI-JOINED to
    the broadcast source vocabulary (the corpus never shuffles more than
    matched rows); scoring joins the same stream to the ≤10-term
    broadcast and runs ONE doc-keyed partial agg + TakeOrdered."""
    dt = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    src_tf = (
        df.filter(F.col(id_col) == like_id)
        .select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = F.broadcast(df.agg(F.count(F.lit(1)).cast("double").alias("N")))
    dfreq = (
        dt.join(F.broadcast(src_tf.select("term")), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    q_terms = (
        src_tf.join(dfreq, "term")
        .join(n_docs)
        .select(
            "term",
            F.round(
                F.log((F.col("N") + F.lit(1.0)) / (F.col("df") + F.lit(1)).cast("double"))
                * F.lit(1e6)
            )
            .cast("long")
            .alias("idf_micro"),
            "tf",
        )
        .orderBy((F.col("tf") * F.col("idf_micro")).desc(), "term")
        .limit(max_query_terms)
    )
    return (
        dt.filter(F.col(id_col) != like_id)
        .join(F.broadcast(q_terms.select("term", "idf_micro")), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
            F.sum("idf_micro").cast("long").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
        .limit(k)
    )


def percolate(
    df: DataFrame,
    queries: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Elasticsearch percolator: REVERSE search — stored queries match
    incoming documents (the alerting/routing primitive: "which saved
    searches fire for this doc"). Each stored query is a bool-must term
    set; a doc matches when it contains EVERY term. Emits (query_id,
    doc_id) match pairs.

    Scale shape: stored queries are user-registered and tiny by
    definition → the term list broadcasts; docs fan out to distinct
    terms inside their scan, join the broadcast, and ONE (doc, query)
    partial agg counts matched terms against the query's requirement.
    The corpus never shuffles more than (matched doc, query) rows —
    exactly how a percolator must behave when the doc stream is the
    100 TB side."""
    spark = df.sparkSession
    # Registration-time validation (r11 review): a query with ZERO terms
    # would vanish from the term/need tables and never fire (ES bool-must
    # with no clauses matches EVERYTHING — silently matching nothing is
    # the opposite contract), and a term containing whitespace can never
    # equal a single whitespace-split token, so the alert would be
    # permanently dead. Both are registration bugs — loud, not silent.
    for qid, terms in queries.items():
        if not terms:
            raise ValueError(
                f"percolate: stored query {qid!r} has no terms — an "
                "empty bool-must is match-all, which this term-set "
                "percolator cannot express"
            )
        for t in terms:
            if not t or t.split() != [t]:
                raise ValueError(
                    f"percolate: stored query {qid!r} term {t!r} is empty "
                    "or contains whitespace — it can never equal a single "
                    "token; register multi-word alerts as separate terms"
                )
    # stored terms are normalized the same way doc tokens are (lowercase)
    # — a mixed-case registered alert must fire, not silently go dead
    qrows = sorted({(qid, t.lower()) for qid, terms in queries.items() for t in terms})
    qdf = spark.createDataFrame(qrows, "query_id string, term string")
    need = qdf.groupBy("query_id").agg(F.count(F.lit(1)).alias("need"))
    dt = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    return (
        dt.join(F.broadcast(qdf), "term")
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(need), "query_id")
        .filter(F.col("n") == F.col("need"))
        .select("query_id", id_col)
    )


def highlight_snippets(
    df: DataFrame,
    term: str,
    k: int = 10,
    window: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Elasticsearch highlight: for the top matching docs, cut a snippet
    around the FIRST occurrence of the query term and wrap the match in
    ``<em>`` tags (ES's default highlighter contract). Ranking is exact
    occurrence count (desc, id tiebreak).

    Pure string expressions (instr/substring/concat — identical 1-based
    semantics in any SQL engine), evaluated inside the scan; the only
    plan steps are a filter and a TakeOrdered. No tokenization, no
    shuffle wider than the top-k."""
    # the term is matched LITERALLY and case-insensitively everywhere:
    # occurrences are counted by length difference under replace() (no
    # regex — 'c++' or 'a.b' are plain strings here, as in ES term-level
    # highlighting), and the same lowercased literal drives instr.
    term = term.lower()
    if not term.strip():
        # loud like the sibling rank operators (r11 review): an empty
        # term divides the hit count by len('') = 0 (a runtime
        # DIVIDE_BY_ZERO under ANSI mode) and instr(text, '') "matches"
        # every document at position 1
        raise ValueError("highlight_snippets: query term must be non-empty")
    low = F.lower(F.col(text_col))
    pos = F.instr(low, term)
    n_hits = (
        (F.length(low) - F.length(F.replace(low, F.lit(term), F.lit(""))))
        / F.lit(len(term))
    ).cast("long")
    start = F.greatest(pos - F.lit(window), F.lit(1))
    snippet = F.concat(
        F.substring(F.col(text_col), start, pos - start),
        F.lit("<em>"),
        F.substring(F.col(text_col), pos, F.lit(len(term))),
        F.lit("</em>"),
        F.substring(F.col(text_col), pos + F.lit(len(term)), F.lit(window)),
    )
    return (
        df.filter(pos > 0)
        .select(
            F.col(id_col),
            n_hits.cast("long").alias("n_hits"),
            snippet.alias("snippet"),
        )
        .orderBy(F.col("n_hits").desc(), F.col(id_col))
        .limit(k)
    )


def match_phrase_rank(
    df: DataFrame,
    phrase: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Elasticsearch ``match_phrase`` (default ``slop=0``): documents
    containing the query terms as CONSECUTIVE tokens, ranked by exact
    occurrence count — the phrase-query half of the reference's search
    surface (Openapi/openai_elasticsearch.py match queries) that plain
    term matching (``query_string_rank``) cannot express because it
    needs token POSITIONS.

    Join-free position-key formulation: token ``t`` at position ``p``
    matching phrase slot ``i`` votes for candidate start ``p − i``; a
    start position where all ``len(phrase)`` distinct slots voted is an
    occurrence. That turns phrase matching into ONE aggregation on
    (doc, start) — no positions self-join chain, which for an n-term
    phrase would be n−1 shuffle joins whose skew tracks the hottest
    term. (ES ``slop>0`` relaxes the start-key equality to a band and,
    at slop≥2, admits transpositions — a different operator; this one
    is the exact default.)

    Scale shape: positions explode inside the scan stage and are
    immediately semi-filtered by the tiny broadcast slot list, so only
    phrase-term hits — (id, start, slot) ints — leave the scan; hashes
    are uniform in doc_id so neither aggregation has a hot key. Shuffle
    budget 3: (doc,start) partial agg → per-doc partial agg →
    TakeOrderedAndProject."""
    if not phrase:
        raise ValueError("match_phrase_rank: `phrase` must name at least one term")
    # Normalize query terms through the SAME tokenizer regex the document
    # side uses — a raw term with punctuation ('c++', 'U.S.') can never
    # equal an alnum-run token and would silently match nothing (r11
    # review). A multi-token term ('new york') expands into consecutive
    # slots, which is exactly ES match_phrase's analyzer behavior.
    import re as _re

    norm = [
        tok
        for term in phrase
        for tok in _re.findall(r"[A-Za-z0-9가-힣]+", term.lower())
    ]
    if not norm:
        raise ValueError(
            f"match_phrase_rank: no query term in {phrase!r} survives "
            "tokenization — the phrase cannot match any document"
        )
    spark = df.sparkSession
    slots = F.broadcast(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(norm)], "slot int, term string"
        )
    )
    pos = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(rf"regexp_extract_all(lower({text_col}), '[A-Za-z0-9가-힣]+', 0)")
        ).alias("p", "tok"),
    )
    hits = (
        pos.join(slots, pos["tok"] == slots["term"])
        .select(id_col, (F.col("p") - F.col("slot")).alias("start"), "slot")
        # (doc, start, slot) is unique by construction — p is unique per
        # token row and start = p − slot — so a plain count equals the
        # distinct-slot count without the extra exchange a two-phase
        # count_distinct plans
        .groupBy(id_col, "start")
        .agg(F.count(F.lit(1)).alias("nslots"))
        .filter(F.col("nslots") == len(norm))
    )
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("phrase_count"))
        .orderBy(F.col("phrase_count").desc(), F.col(id_col))
        .limit(k)
    )


def phrase_merge_rounds(
    df: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """BPE-style iterative pair-merge learning over the token stream —
    the vocabulary-induction algorithm (Sennrich BPE / word2phrase
    collocations) run at corpus level: each round counts ALL adjacent
    token pairs, merges the globally most frequent one (count-desc,
    then lexicographic — fully deterministic), and re-segments, so
    later rounds build multi-token units on top of earlier merges
    ("new_york" + "city" → "new_york_city").

    Exact-replay trick: segmentations join tokens with TWO spaces and
    flank the string with one (" a  b  a  b "); the merge pattern
    " a  b " then consumes each occurrence's own boundary spaces, so
    plain ``replace`` — leftmost, non-overlapping, identical semantics
    in Spark and DuckDB — applies EXACTLY the textbook leftmost-greedy
    BPE merge, including odd-length runs ("a a a" → "a_a a"). A
    single-space encoding under-merges alternating repeats because
    adjacent matches fight over the shared delimiter.

    Scale shape: each round is one pair-explode + count-keyed partial
    agg over the corpus plus a 1-row argmax collect (the per-round
    driver round-trip every BPE trainer has; the collect is O(1)).
    Rounds scan the corpus ``rounds`` times — inherent to BPE's
    sequential dependency; :func:`phrase_merge_rounds_batched` is the
    production trainer that learns k merges per count pass. Each
    round's segmentation persists (MEMORY_AND_DISK), so round k's count
    scans the cached round-(k-1) strings instead of re-executing all
    k-1 earlier replace chains plus the source scan — without it plan
    growth is quadratic in ``rounds``. At most TWO segmentations are
    cached at once: round k's count pass is the action that populates
    segdf_k's cache (reading segdf_{k-1}), after which segdf_{k-1}
    unpersists — a rounds-long chain must not pin rounds× the corpus.

    Underscore is the merge marker: tokens are whitespace-split, so the
    marker can collide only if source tokens already contain '_'
    (harmless for counting; merged units stay distinguishable in the
    word-salad and natural-text corpora this targets)."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    # deliberately NOT _spread: the trainer runs many small per-pass
    # jobs over a persisted segmentation, and fanning a tiny under-split
    # corpus to all cores makes each of them pay 32-task scheduling +
    # exchange overhead (measured 2.6× slower on the 16×64 shape, r14);
    # a 100 TB corpus scans well-split and parallelizes on its own
    segdf = df.select(_bpe_seg0(text_col).alias("seg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    prev = None
    out = []
    for rnd in range(1, rounds + 1):
        # this collect materializes segdf's cache (reading prev's) —
        # prev is dead weight from here on
        rows = _bpe_pair_counts(segdf).limit(1).collect()
        if prev is not None:
            prev.unpersist()
            prev = None
        if not rows:
            # all-degenerate corpus (every doc < 2 tokens): nothing left
            # to merge — return the rounds learned so far, possibly none
            break
        best = rows[0]
        out.append((rnd, best.a, best.b, f"{best.a}_{best.b}", best.c))
        if rnd < rounds:
            prev = segdf
            segdf = segdf.select(
                F.replace(
                    F.col("seg"),
                    F.lit(f" {best.a}  {best.b} "),
                    F.lit(f" {best.a}_{best.b} "),
                ).alias("seg")
            ).persist(StorageLevel.MEMORY_AND_DISK)
    # the result below is a driver-local literal — no lineage back into
    # the cached segmentations, so their storage releases immediately
    segdf.unpersist()
    if prev is not None:
        prev.unpersist()
    return spark.createDataFrame(
        out, "round int, left_tok string, right_tok string, merged string, pair_count long"
    )


def _bpe_seg0(text_col: str) -> Column:
    """Initial double-space BPE segmentation (see phrase_merge_rounds:
    the two-space join + one-space flanks make plain ``replace`` apply
    the exact leftmost-greedy merge in any engine)."""
    return F.concat(
        F.lit(" "),
        F.replace(
            F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "),
            F.lit(" "),
            F.lit("  "),
        ),
        F.lit(" "),
    )


def _bpe_pair_counts(segdf: DataFrame):
    """Adjacent-pair counts over a segmentation frame, ordered by
    (count desc, a, b) — the shared count pass of both BPE trainers.

    The token split is PROJECTED ONCE into its own select before the
    pairing expression touches it. The previous form inlined
    ``split(trim(seg))`` into a ``transform`` lambda whose body indexed
    it twice per element via ``element_at`` — whole-stage codegen
    re-evaluates the inlined split per lambda invocation (no
    cross-lambda subexpression elimination), making each row
    O(tokens² · len). Projected as a child attribute, the split runs
    once per row and the pairing is two O(tokens) array slices zipped —
    measured 13× on the 16×64 trainer's count pass (4.48 s → 0.34 s per
    pass at sf0.1, r14), bit-identical output including the (c desc, a,
    b) tie order. CollapseProject keeps the projection separate because
    the alias is referenced multiple times by non-cheap expressions.
    """
    t = segdf.select(F.split(F.trim(F.col("seg")), "  ").alias("toks"))
    tk = F.col("toks")
    # guard size<2 with a NULL array (explode drops it) — the old
    # greatest(size-1, 1) clamp made slice read past a 1-element array,
    # which ERRORS under ANSI mode (PySpark 4 default) on any
    # single-token or whitespace-only document
    prs = F.when(
        F.size(tk) >= 2,
        F.arrays_zip(
            F.slice(tk, 1, F.size(tk) - 1),
            F.slice(tk, 2, F.size(tk) - 1),
        ),
    )
    return (
        t.select(F.explode(prs).alias("pr"))
        # no null-filter needed: the size>=2 guard means both slices
        # cover valid indices only, so both slots are real tokens
        .select(F.col("pr.0").alias("a"), F.col("pr.1").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy(F.col("c").desc(), "a", "b")
    )


def chained_replace_kernel(pairs: list[tuple[str, str]]):
    """Arrow-batched pandas_udf applying a long ``(search, replace)``
    chain per row — the serving-path BPE APPLY for real vocab sizes
    (guide §4.2: hand the whole batch to native code).

    Exactly equivalent to folding ``F.replace`` over ``pairs`` in order:
    Python ``str.replace`` and Spark's ``UTF8String.replace`` both
    substitute every non-overlapping occurrence scanning left to right,
    and the chain applies the same patterns in the same order — the
    interpreted ``F.aggregate(lit-table, seg, replace)`` fold this
    replaces evaluated a 1024-step expression loop per row with no
    codegen (measured ~9.5 s for the 16×64 apply at sf0.1; the kernel
    runs the same chain as C-level ``str.replace`` calls, ~0.1 ms per
    document). NULL rows pass through as NULL, matching the fold (every
    ``replace`` of a NULL accumulator is NULL)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def apply_chain(seg: pd.Series) -> pd.Series:
        out = []
        for s in seg:
            if not isinstance(s, str):
                out.append(None)
                continue
            for a, b in pairs:
                s = s.replace(a, b)
            out.append(s)
        return pd.Series(out, dtype=object)

    return apply_chain


# Session-bounded memo for trained BPE vocabularies: the learned merge
# table is a DRIVER-LOCAL list (≤ vocab rows — 1024 tuples for the
# 16×64 production shape), so caching the rows themselves is exact and
# storage-trivial. Keyed like the lattice prep registry (semanticHash +
# sameSemantics + params), lock-guarded, capped. Motivation (r11
# verdict #2): nlp_bpe_vocab_16x64 and nlp_bpe_apply_16x64 each trained
# the SAME 1024-merge vocab — 56 s + 50 s of a 329 s bench re-deriving
# identical merges; with the memo the second caller replays the rows.
# Same reuse caveat as every plan-keyed cache: a corpus rewritten in
# place mid-session would replay a stale vocab — such callers keep the
# default memo=False.
_BPE_VOCAB_MEMO_CAP = 4
_BPE_VOCAB_MEMO: list[tuple[int, "DataFrame", tuple, list]] = []
_BPE_VOCAB_MEMO_LOCK = __import__("threading").Lock()


def phrase_merge_rounds_batched(
    df: DataFrame,
    passes: int = 2,
    merges_per_pass: int = 3,
    text_col: str = "text",
    memo: bool = False,
) -> DataFrame:
    """Batched BPE merge learning — the production-vocab trainer shape:
    each COUNT PASS takes the top ``merges_per_pass`` pairs (count-desc,
    then lexicographic) and applies them SEQUENTIALLY in rank order as
    one chained-replace projection, so a 32k-vocab induction costs
    vocab/k corpus scans instead of vocab (every real trainer —
    sentencepiece, HF tokenizers — makes exactly this trade). The
    intermediate counts for ranks 2..k are from BEFORE rank 1's
    application (stale by construction): when rank 1 consumes a token
    that rank 2's pattern needed, the sequential leftmost-greedy replay
    resolves it deterministically — both engines chain the same
    ``replace`` calls in the same order, so a SQL twin reproduces the
    whole batch bit-for-bit (the single-merge
    :func:`phrase_merge_rounds` stays as the textbook-exact oracle
    twin). Per-pass segmentations persist and release like the
    single-merge path — at most two cached at once (the predecessor
    unpersists as soon as the successor's count pass materializes it).

    Emits one row per applied merge: (pass_no, merge_rank, left_tok,
    right_tok, merged, pair_count) — pair_count is the count-pass frequency the
    rank was chosen on, i.e. the pre-batch count.

    ``memo=True`` returns the session-cached merge rows when the same
    (input plan, passes, merges_per_pass, text_col) was already trained
    this session — see ``_BPE_VOCAB_MEMO``."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    schema = (
        "pass_no int, merge_rank int, left_tok string, right_tok string, "
        "merged string, pair_count long"
    )
    params = (passes, merges_per_pass, text_col)
    h = None
    if memo:
        try:
            h = df.semanticHash()
        except Exception:  # noqa: BLE001 — memo is an optimization, never a gate
            h = None
        if h is not None:
            with _BPE_VOCAB_MEMO_LOCK:
                for entry in list(_BPE_VOCAB_MEMO):
                    eh, esrc, eparams, erows = entry
                    if eh == h and eparams == params:
                        try:
                            if not esrc.sameSemantics(df):
                                continue
                        except Exception:  # noqa: BLE001
                            continue
                        # LRU refresh
                        _BPE_VOCAB_MEMO.remove(entry)
                        _BPE_VOCAB_MEMO.append(entry)
                        return spark.createDataFrame(erows, schema)
    # deliberately NOT _spread — same small-per-pass-job rationale as
    # phrase_merge_rounds (measured 2.6× slower with the fan-out, r14)
    segdf = df.select(_bpe_seg0(text_col).alias("seg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    prev = None
    out = []
    for p in range(1, passes + 1):
        rows = _bpe_pair_counts(segdf).limit(merges_per_pass).collect()
        if prev is not None:
            prev.unpersist()
            prev = None
        if not rows:
            break
        # TakeOrdered returns rows in order; re-sort defensively so the
        # application order never depends on collect()'s transport
        rows.sort(key=lambda r: (-r.c, r.a, r.b))
        seg = F.col("seg")
        for rank, r in enumerate(rows, 1):
            out.append((p, rank, r.a, r.b, f"{r.a}_{r.b}", r.c))
            seg = F.replace(
                seg, F.lit(f" {r.a}  {r.b} "), F.lit(f" {r.a}_{r.b} ")
            )
        if p < passes:
            prev = segdf
            segdf = segdf.select(seg.alias("seg")).persist(
                StorageLevel.MEMORY_AND_DISK
            )
    segdf.unpersist()
    if prev is not None:
        prev.unpersist()
    if memo and h is not None:
        with _BPE_VOCAB_MEMO_LOCK:
            _BPE_VOCAB_MEMO.append((h, df, params, out))
            while len(_BPE_VOCAB_MEMO) > _BPE_VOCAB_MEMO_CAP:
                _BPE_VOCAB_MEMO.pop(0)
    return spark.createDataFrame(out, schema)
