"""Corpus-curation query pack: the training-data pipeline stages between
raw text and training shards (PII redaction, repetition filtering,
deterministic sampling, benchmark decontamination, mixture reweighting,
sequence packing), each oracle-checked against DuckDB where the
semantics are SQL-expressible.

PII note: the synthetic corpus contains no PII, so the redaction query
*plants* deterministic PII (derived from ``doc_id``, identically in both
engines) before redacting — the oracle then verifies the redaction
semantics on text where every pattern provably fires (a no-op redaction
would be a vacuous pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.curation import (
    PII_PATTERNS,
    boilerplate_strip,
    domain_cap,
    chunk_sliding,
    dsir_weights,
    hash_bucket,
    weighted_sample,
    mixture_temperature,
    mixture_waterfill,
    mixture_weights,
    ngram_decontaminate,
    pack_concat,
    pack_ffd,
    pii_redact,
    repetition_stats,
    shard_shuffle,
    stratified_sample,
    token_budget_select,
    unigram_nll,
    word_dropout,
)
from .registry import query

_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"
_EMAIL, _IP, _PHONE = (p for p, _ in PII_PATTERNS)

# Planted-PII expression, byte-identical in Spark and DuckDB.
_PLANT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com"
    " or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7'"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _planted(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.7"),
        ).alias("text"),
    )


@query(
    "curate_pii_redact",
    f"""WITH planted AS (SELECT doc_id, {_PLANT_SQL} AS text FROM documents),
        -- n_pii mirrors the interleaved count-then-replace: each pattern
        -- is counted on the text AFTER earlier patterns redacted, so an
        -- overlapped span (an IP inside an email) counts once
        r1 AS (SELECT doc_id, text,
                      regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g') AS t1
               FROM planted),
        r2 AS (SELECT *, regexp_replace(t1, '{_IP}', '<IP>', 'g') AS t2 FROM r1)
        SELECT doc_id,
               regexp_replace(t2, '{_PHONE}', '<PHONE>', 'g') AS clean_text,
               CAST(len(regexp_extract_all(text, '{_EMAIL}'))
                  + len(regexp_extract_all(t1, '{_IP}'))
                  + len(regexp_extract_all(t2, '{_PHONE}')) AS INTEGER) AS n_pii
        FROM r2""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/curation.py:pii_redact) over planted
    emails/phones/IPs — pure regexp projection, zero shuffle."""
    return pii_redact(_planted(_docs(spark, sf_dir)))


@query(
    "curate_quality_repetition",
    f"""WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok,
                 generate_subscripts({_TOKS}, 1) AS ord
          FROM documents
        ), grams AS (
          SELECT doc_id,
                 tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS g
          FROM toks
        ), g2 AS (
          SELECT doc_id,
                 (2000000 * (count(g) - count(DISTINCT g)) + count(g))
                     // (2 * count(g)) AS g2m
          FROM grams WHERE g IS NOT NULL GROUP BY doc_id
        ), t2 AS (
          SELECT doc_id,
                 (2000000 * (len({_TOKS}) - len(list_distinct({_TOKS}))) + len({_TOKS}))
                     // (2 * len({_TOKS})) AS tm
          FROM documents
        )
        -- LEFT + coalesce(0): a 1-token doc has no non-NULL bigram row,
        -- but Spark's shingles() whole-doc fallback gives it frac 0 —
        -- the inner join silently dropped such docs (review finding)
        SELECT doc_id, tm / 1000000.0 AS dup_token_frac,
               coalesce(g2m, 0) / 1000000.0 AS dup_2gram_frac,
               (tm <= 600000 AND coalesce(g2m, 0) <= 50000) AS keep
        FROM t2 LEFT JOIN g2 USING (doc_id)""",
)
def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-shaped repetition filter (operators/curation.py:
    repetition_stats). The Spark form is a zero-shuffle array projection;
    the oracle needs a window + two aggregates for the same answer. Keep
    verdicts compare exact integer micro ratios; the emitted fracs are
    micro/1e6 (identical IEEE division both engines)."""
    return repetition_stats(_docs(spark, sf_dir))


@query(
    "curate_sample_stratified",
    """SELECT doc_id, lang,
              CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS BIGINT) AS bucket
       FROM documents
       WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100
             < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END)""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (operators/curation.py:
    stratified_sample): md5-bucket per doc_id, per-language keep rates —
    reproducible across engines, retries, and incremental appends.
    The contract is "en 50%, EVERY other stratum 20%" expressed via
    default_rate, exactly mirroring the oracle's ELSE branch — the r11
    review found the old explicit 5-language dict silently dropped any
    sixth language (default 0) while the oracle kept it at 20%."""
    return stratified_sample(
        _docs(spark, sf_dir), {"en": 50}, default_rate=20
    ).select("doc_id", "lang", "bucket")


@query(
    "curate_decontaminate",
    f"""WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok,
                 generate_subscripts({_TOKS}, 1) AS ord
          FROM documents
        ), grams AS (
          SELECT doc_id,
                 tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                     || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w
                     || ' ' || lead(tok, 5) OVER w || ' ' || lead(tok, 6) OVER w
                     || ' ' || lead(tok, 7) OVER w AS g
          FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
        ), dg AS (
          -- short docs (<8 tokens) contribute their whole token string as
          -- one gram, mirroring shingle_hashes' fold-what-you-have
          -- fallback (review finding)
          SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id, g FROM grams WHERE g IS NOT NULL
            UNION ALL
            SELECT doc_id, array_to_string({_TOKS}, ' ') AS g
            FROM documents WHERE len({_TOKS}) < 8)
        ),
        bench AS (SELECT DISTINCT g FROM dg WHERE doc_id % 10 = 0),
        hits AS (
          SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n
          FROM dg d JOIN bench b USING (g) WHERE d.doc_id % 10 <> 0
          GROUP BY d.doc_id
        )
        SELECT c.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_shared_grams,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM documents c LEFT JOIN hits h ON c.doc_id = h.doc_id
        WHERE c.doc_id % 10 <> 0""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-gram benchmark decontamination (operators/curation.py:
    ngram_decontaminate). Pseudo-benchmark = every 10th doc; the planted
    near-dup passages in the corpus make the overlap real (6 contaminated
    docs at sf0.01). Benchmark gram set broadcasts; the corpus is never
    shuffled for the probe."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return ngram_decontaminate(corpus, bench, n=8)


@query(
    "curate_mixture_weights",
    f"""WITH per AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY lang
        ), tot AS (
          SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens,
                 CAST(count(*) AS DOUBLE) AS n_strata
          FROM per
        )
        SELECT lang, n_docs, n_tokens,
               round(n_tokens / total_tokens, 6) AS token_share,
               round((1.0 / n_strata) / (n_tokens / total_tokens), 6) AS weight
        FROM per, tot""",
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting (operators/curation.py:mixture_weights):
    per-language token share and the weight that flattens the mixture.
    One tiny-domain partial agg + a broadcast 1-row total."""
    return mixture_weights(_docs(spark, sf_dir))


@query(
    "curate_pack_concat",
    f"""WITH n AS (
          SELECT doc_id, CAST(len({_TOKS}) AS INTEGER) AS n_tokens FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                    / 256) AS BIGINT) AS bin_id
        FROM n""",
)
def q_pack_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split sequence packing (operators/curation.py:
    pack_concat) — the deterministic oracle baseline; the scale path is
    ``curate_pack_ffd`` (per-partition, no global window)."""
    return pack_concat(_docs(spark, sf_dir), capacity=256)


@query(
    "curate_chunk_sliding",
    f"""WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents
                   WHERE trim(text) <> ''),
        s AS (
          SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), 48)) AS start
          FROM d)
        SELECT doc_id,
               CAST(start // 48 AS BIGINT) AS chunk_id,
               CAST(len(toks[start + 1 : start + 64]) AS BIGINT) AS n_chunk_tokens,
               array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text
        FROM s WHERE len(toks[start + 1 : start + 64]) > 0""",
)
def q_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (operators/curation.py:
    chunk_sliding): 64-token chunks every 48 tokens — the long-document
    → training-sequence fan-out, as pure array expressions."""
    return chunk_sliding(_docs(spark, sf_dir), window=64, stride=48)


@query(
    "curate_unigram_nll",
    f"""WITH tok AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
               CAST(sum(CAST(round(-ln(cnt / total) * 1000000) AS BIGINT))
                    // count(*) AS BIGINT) AS nll_micro
        FROM tok JOIN freq USING (tok), tot
        GROUP BY doc_id""",
)
def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram negative log-likelihood per doc (operators/
    curation.py:unigram_nll) — the perplexity-filter shape: flags
    rare-token soup (high NLL) and boilerplate (low NLL) without a
    model artifact. nll_micro is a per-term-quantized exact integer
    mean: the old round(avg(double), 6) summed doubles in shuffle-fetch
    arrival order — nondeterministic even Spark-vs-Spark (r11 review);
    the integer sum is order-free and the residual cross-engine risk is
    one ln ulp per TERM (the accepted M2 class)."""
    return unigram_nll(_docs(spark, sf_dir))


@query("curate_pack_ffd")  # rows-only: spark_partition_id bin namespaces
# are execution artifacts; the FFD recursion itself is hash-proven by
# curate_pack_ffd_portable's md5-partitioned twin
def q_pack_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing packing, parallel form (operators/curation.py:
    pack_ffd): each partition packs independently, bin ids namespaced by
    partition. Invariants (no bin overflow, every doc packed once)
    asserted in tests/test_curation.py."""
    return pack_ffd(_docs(spark, sf_dir), capacity=256, num_partitions=8)


# The per-group FFD loop as a DuckDB recursive CTE: state = (group, rank,
# open-bin remaining-capacity list); each step consumes the group's next
# doc in (tokens DESC, id) order, puts it in the FIRST bin that fits
# (NULLIF(list_position(...), 0) — DuckDB signals "no fit" as 0) or opens
# a new bin, and re-derives the same 4096-doc block reset the kernel uses
# to bound its scan. Bin ids namespace as (md5-pid << 40) + local index,
# exactly the kernel's arithmetic.
_PACK_FFD_PORTABLE_ORACLE = r"""
WITH RECURSIVE
d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS t,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 8 AS pid
  FROM documents),
rk AS (
  SELECT doc_id, t, pid,
         row_number() OVER (PARTITION BY pid ORDER BY t DESC, doc_id) AS r
  FROM d),
st AS (
  SELECT pid, CAST(0 AS BIGINT) AS r, CAST([] AS BIGINT[]) AS bins,
         CAST(0 AS BIGINT) AS bin_base,
         CAST(NULL AS BIGINT) AS local_bin, CAST(NULL AS BIGINT) AS doc_id,
         CAST(NULL AS BIGINT) AS t
  FROM (SELECT DISTINCT pid FROM rk)
  UNION ALL
  SELECT u.pid, u.r,
         CASE WHEN u.idx IS NULL THEN list_append(u.ebins, greatest(256 - u.t, 0))
              ELSE list_concat(list_concat(u.ebins[1:u.idx-1], [u.ebins[u.idx] - u.t]),
                               u.ebins[u.idx+1:]) END AS bins,
         u.ebase AS bin_base,
         CASE WHEN u.idx IS NULL THEN u.ebase + len(u.ebins)
              ELSE u.ebase + u.idx - 1 END AS local_bin,
         u.doc_id, u.t
  FROM (
    SELECT s.pid, k.r, k.doc_id, k.t,
           CASE WHEN s.r > 0 AND s.r % 4096 = 0 THEN CAST([] AS BIGINT[]) ELSE s.bins END AS ebins,
           CASE WHEN s.r > 0 AND s.r % 4096 = 0 THEN s.bin_base + len(s.bins) ELSE s.bin_base END AS ebase,
           NULLIF(list_position(
             list_transform(CASE WHEN s.r > 0 AND s.r % 4096 = 0
                                 THEN CAST([] AS BIGINT[]) ELSE s.bins END,
                            x -> x >= k.t), true), 0) AS idx
    FROM st s JOIN rk k ON k.pid = s.pid AND k.r = s.r + 1
  ) u)
SELECT doc_id, CAST(t AS INTEGER) AS n_tokens, (pid << 40) + local_bin AS bin_id
FROM st WHERE doc_id IS NOT NULL
"""


@query("curate_pack_ffd_portable", _PACK_FFD_PORTABLE_ORACLE)
def q_pack_ffd_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence packing with a HARD oracle over the
    packing recursion — the second 'sequential ⇒ no SQL twin' claim
    retired this round (after LTTB). The only engine-specific piece of
    `pack_ffd` was the `spark_partition_id` bin namespace; swapping it
    for the md5 doc-id bucket (`partition_impl="portable"`) makes every
    bin id a pure function of the data, and a DuckDB RECURSIVE CTE
    replays the exact greedy loop — size-sorted order, first-fit scan,
    open-bin state, oversized-doc zero-capacity bins, the 4096-doc
    block reset — so the driver hash-compares (doc, n_tokens, bin_id)
    triples. Same single group-key exchange and O(docs × block) kernel
    as production; the md5 grouping is also what a rerun-stable
    deployment should use (bin membership survives repartitioning)."""
    return pack_ffd(
        _docs(spark, sf_dir), capacity=256, num_partitions=8, partition_impl="portable"
    )


@query(
    "curate_split_train_val",
    """WITH b AS (
         SELECT lang,
                CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
                     % 100 AS BIGINT) AS bucket
         FROM documents)
       SELECT lang,
              CASE WHEN bucket < 80 THEN 'train'
                   WHEN bucket < 90 THEN 'val'
                   ELSE 'test' END AS split,
              CAST(count(*) AS BIGINT) AS n_docs
       FROM b GROUP BY 1, 2""",
)
def q_curate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10 by md5 bucket of
    the document id) with per-(lang, split) counts — the dataset-freeze
    step of every training run. The split is a pure projection
    (reproducible across reruns, backfills, engines — same md5 bucket the
    stratified sampler uses), so membership never flaps when the corpus
    is appended to: a doc's split depends only on its id. One partial-agg
    groupBy; zero extra shuffles at any corpus size."""
    docs = _docs(spark, sf_dir)
    bucket = hash_bucket("doc_id", 100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@query(
    "curate_sample_weighted",
    """WITH keyed AS (
         SELECT doc_id, lang, n_chars,
                -ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                          AS BIGINT) % 16777216 AS DOUBLE) + 1.0) / 16777216.0)
                / n_chars AS es_raw
         FROM documents
         WHERE n_chars IS NOT NULL AND n_chars > 0)
       SELECT doc_id, lang, n_chars, round(es_raw, 6) AS es_key
       FROM keyed ORDER BY es_raw, doc_id LIMIT 100""",
)
def q_curate_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/curation.py:weighted_sample — Efraimidis-Spirakis A-ES
    with an md5-derived uniform): longer documents are proportionally
    more likely to enter the 100-doc sample, and membership is a pure
    function of the doc id (stable across retries, repartitions, and
    corpus appends). Selection is a TakeOrdered top-k — k rows per
    partition cross the wire; ranking uses the unrounded key (absolute
    rounding would quantize the whole top-k to ties at corpus scale) and
    only the emitted column rounds for the cross-engine hash."""
    return weighted_sample(_docs(spark, sf_dir), k=100).select(
        "doc_id", "lang", "n_chars", "es_key"
    )


@query(
    "curate_mixture_temperature",
    f"""WITH per AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY lang
        ), tot AS (
          SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens FROM per
        ), sq AS (
          SELECT lang, n_docs, n_tokens, total_tokens,
                 CAST(round(sqrt(n_tokens / total_tokens) * 1e9) AS BIGINT) AS sq9
          FROM per, tot
        ), z AS (SELECT CAST(sum(sq9) AS DOUBLE) AS z9 FROM sq)
        SELECT lang, n_docs, n_tokens,
               round(n_tokens / total_tokens, 6) AS token_share,
               round(sq9 / z9, 6) AS temp_weight,
               round((sq9 / z9) / (n_tokens / total_tokens), 6) AS boost
        FROM sq, z""",
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (operators/curation.py:
    mixture_temperature, alpha=0.5): sampling weight ∝ sqrt(token share)
    — the mT5-style up-sampling of small languages. sqrt (IEEE-exact in
    both engines) + integer-quantized normalizer keep the rounded hash
    order-stable; the corpus sees one partial-agg groupBy, everything
    downstream is |strata|-row broadcasts."""
    return mixture_temperature(_docs(spark, sf_dir))


def _waterfill_pass(k: int) -> str:
    """One unrolled waterfill pass as DuckDB CTEs: pool/allocated
    aggregate, the exact two-term proportional share, the availability
    cap, and the refreshed capped flag (mirrors
    operators/curation.py:mixture_waterfill round-for-round)."""
    i, o = k - 1, k
    return f"""p{o} AS (
          SELECT CAST(sum(alloc) AS BIGINT) AS allocated,
                 CAST(sum(CASE WHEN NOT capped THEN w ELSE 0 END) AS BIGINT) AS pool
          FROM s{i}c
        ), s{o} AS (
          SELECT lang, w, avail, budget,
                 alloc + CASE WHEN capped OR pool <= 0 OR (budget - allocated) <= 0
                              THEN 0
                              ELSE least(((budget - allocated) // pool) * w
                                         + (((budget - allocated) % pool) * w) // pool,
                                         avail - alloc) END AS alloc
          FROM s{i}c, p{o}
        ), s{o}c AS (
          SELECT lang, w, avail, budget, alloc, alloc >= avail AS capped FROM s{o}
        )"""


@query(
    "curate_mixture_waterfill",
    f"""WITH per AS (
          SELECT lang, CAST(greatest(1, 1000000 // count(*)) AS BIGINT) AS w,
                 CAST(sum(len({_TOKS})) AS BIGINT) AS avail
          FROM documents GROUP BY lang
        ), tot AS (
          SELECT CAST(sum(avail) * 3 // 5 AS BIGINT) AS budget FROM per
        ), s0c AS (
          SELECT lang, w, avail, budget,
                 CAST(0 AS BIGINT) AS alloc, false AS capped
          FROM per, tot
        ), {_waterfill_pass(1)}, {_waterfill_pass(2)}, {_waterfill_pass(3)}
        SELECT lang, avail AS avail_tokens, w AS weight_docs,
               alloc AS alloc_tokens, capped
        FROM s3c""",
)
def q_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waterfill budget allocation (operators/curation.py:
    mixture_waterfill): split 3/5 of the corpus token budget across
    languages by INVERSE document frequency (balance-toward-uniform
    upsampling — small languages get big weights), cap each language at
    the tokens it HAS, redistribute overflow across the uncapped — 3
    unrolled passes the DuckDB twin replays CTE-for-CTE. On this corpus
    the small languages genuinely cap out and spill to en, so the
    redistribution arithmetic (not just the proportional split) is what
    the hash proves. The step between choosing a mixture and freezing a
    dataset: applying caps without redistribution silently under-fills
    the budget. Exact int64 throughout, including the two-term
    multiply-div that avoids rem·w overflow at corpus scale; ONE corpus
    exchange, then |langs|-row algebra."""
    return mixture_waterfill(_docs(spark, sf_dir))


@query(
    "curate_token_budget",
    f"""WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ), q AS (
          -- ft strips the [''] split artifact; a blank doc scores 0
          -- (quality_micro's r11 blank-doc guard)
          SELECT doc_id, list_filter(toks, x -> x <> '') AS ft,
                 CAST(len(toks) AS INTEGER) AS n_tokens
          FROM t
        ), m AS (
          SELECT doc_id,
                 CASE WHEN len(ft) = 0 THEN 0 ELSE
                   (2000000 * CAST(200 * len(list_distinct(ft))
                        + len(ft) * least(len(ft), 200) AS BIGINT)
                    + CAST(400 * len(ft) AS BIGINT))
                   // (2 * CAST(400 * len(ft) AS BIGINT))
                 END AS quality_micro,
                 n_tokens
          FROM q
        ), c AS (
          SELECT doc_id, quality_micro, n_tokens,
                 CAST(SUM(CAST(n_tokens AS BIGINT))
                          OVER (ORDER BY quality_micro DESC, doc_id)
                      AS BIGINT) AS cum_tokens
          FROM m
        )
        SELECT doc_id, quality_micro, n_tokens, cum_tokens
        FROM c WHERE cum_tokens <= 15000""",
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-first selection under a 15k-token budget
    (operators/curation.py:token_budget_select) — the "best N tokens"
    dataset freeze. The ranking key is an EXACT int64 micro-quality
    (half-up rational ``(2e6*num + den) div (2*den)``), so both engines
    rank and hash identical integers — the double ``round(…, 6)`` key
    this replaces was the round-8 driver red row (JVM vs exact-binary
    rounding flipped a boundary micro and reordered the greedy prefix).
    The round-9 red had a second, oracle-side cause: DuckDB returns
    integer window SUMs as HUGEINT (int128), which pandas materializes
    as float64, so the driver's stringify-then-hash canonicalization
    compared ``"14997.0"`` against Spark's int64 ``"14997"``. The
    oracle therefore CASTs the window sum back to BIGINT.
    The oracle's global ordered window is exactly what the production
    path must NOT do (it single-partitions the corpus); the Spark side
    runs the distributed prefix sum instead (range-partition →
    per-partition offsets → in-order Arrow pass), so the hash-equality
    here proves the scalable cumsum equals the textbook window at any
    partitioning — on integers only."""
    return token_budget_select(_docs(spark, sf_dir), budget=15000)


@query(
    "curate_boilerplate_strip",
    f"""WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents WHERE trim(text) <> ''
        ), c AS (
          SELECT doc_id, CAST(s // 8 AS BIGINT) AS chunk_id,
                 array_to_string(toks[s + 1 : s + 8], ' ') AS blk
          FROM t, unnest(range(0, greatest(len(toks), 1), 8)) AS u(s)
          WHERE len(toks[s + 1 : s + 8]) > 0
        ), f AS (
          SELECT blk, count(DISTINCT doc_id) AS df FROM c GROUP BY blk
        ), m AS (
          SELECT c.doc_id, c.chunk_id, c.blk, (f.df >= 3) AS bp
          FROM c JOIN f USING (blk)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_bp_blocks,
               string_agg(CASE WHEN NOT bp THEN blk END, ' ' ORDER BY chunk_id)
                   AS clean_text
        FROM m GROUP BY doc_id""",
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent boilerplate removal (operators/curation.py:
    boilerplate_strip): 8-token blocks appearing in ≥3 documents are
    stripped — the CCNet/RefinedWeb paragraph-dedup stage per-document
    filters cannot express. On this corpus the planted near-dup passages
    make the signal real (17 boilerplate blocks at sf0.01; exact-dup
    clusters strip to NULL). Three corpus-scaling exchanges, none wider
    than (id, 8-token block)."""
    return boilerplate_strip(_docs(spark, sf_dir))


@query(
    "curate_dsir_select",
    f"""WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ), u AS (
          SELECT doc_id,
                 ('0x' || substr(md5(g), 1, 6))::BIGINT % 4096 AS b
          FROM (
            SELECT doc_id, unnest(toks) AS g FROM t
            UNION ALL
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
            FROM t, unnest(range(1, len(toks))) AS r(i)
          )
        ), q AS (
          SELECT b, count(*) AS qc FROM u GROUP BY b
        ), p AS (
          SELECT b, count(*) AS pc
          FROM u JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b
        ), tot AS (
          SELECT (SELECT sum(qc) FROM q)::DOUBLE AS qt,
                 (SELECT sum(pc) FROM p)::DOUBLE AS pt
        ), term AS (
          SELECT q.b,
                 CAST(round((ln(coalesce(pc, 0) + 1) - ln(pt + 4096)
                             - ln(qc + 1) + ln(qt + 4096)) * 1e6) AS BIGINT) AS t
          FROM q LEFT JOIN p USING (b), tot
        ), s AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_feats,
                 CAST(sum(t) AS BIGINT) AS logw_micro
          FROM u JOIN term USING (b) GROUP BY doc_id
        )
        SELECT s.doc_id, d.lang, s.n_feats, s.logw_micro
        FROM s JOIN documents d USING (doc_id)
        ORDER BY s.logw_micro DESC, s.doc_id LIMIT 200""",
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/curation.py:dsir_weights): score
    every corpus doc by its hashed-bigram importance weight toward the
    English-language target slice, keep the top 200. The weight math is
    1e-6 fixed point on the parameter-bounded bucket table, so the
    per-doc integer sums hash-match DuckDB exactly; selection is a
    TakeOrdered (no global sort), and the 200 survivors broadcast back
    for the lang column."""
    docs = _docs(spark, sf_dir)
    w = dsir_weights(docs, docs.filter(F.col("lang") == "en"), buckets=4096)
    top = w.orderBy(F.col("logw_micro").desc(), "doc_id").limit(200)
    return top.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "n_feats", "logw_micro"
    )


@query(
    "curate_shard_shuffle",
    """WITH r AS (
          SELECT doc_id,
                 row_number() OVER (
                     ORDER BY md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)),
                              doc_id) - 1 AS idx
          FROM documents
        )
        SELECT doc_id,
               CAST(idx // 64 AS BIGINT) AS shard,
               CAST(idx % 64 AS BIGINT) AS pos_in_shard
        FROM r""",
)
def q_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle → 64-doc training shards
    (operators/curation.py:shard_shuffle): seeded md5 permutation ranked
    by the distributed prefix sum, so the 100 TB-safe range-partitioned
    rank hash-matches the oracle's textbook single-partition
    row_number() window exactly."""
    return shard_shuffle(_docs(spark, sf_dir), shard_size=64)


@query(
    "curate_word_dropout",
    f"""WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ), tok AS (
          SELECT doc_id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) AS ord,
                 len(toks) AS n_tokens
          FROM t
        ), kept AS (
          SELECT doc_id, tok, ord, n_tokens,
                 (('0x' || substr(md5('aug-v1:' || CAST(doc_id AS VARCHAR)
                     || ':' || CAST(ord AS VARCHAR)), 1, 6))::BIGINT % 100 >= 10)
                     AS keep
          FROM tok
        )
        SELECT doc_id,
               string_agg(CASE WHEN keep THEN tok END, ' ' ORDER BY ord)
                   AS aug_text,
               CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
               CAST(any_value(n_tokens) AS BIGINT) AS n_tokens
        FROM kept GROUP BY doc_id""",
)
def q_word_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word-dropout augmentation (operators/curation.py:
    word_dropout): every token flips an md5(seed:id:pos) coin at 10% —
    reproducible augmentation, zero shuffles (the oracle needs the
    unnest + ordered string_agg; the columnar form is a pure array
    filter in the scan)."""
    return word_dropout(_docs(spark, sf_dir), rate_pct=10)


@query(
    "corpus_pipeline_e2e",
    rf"""WITH corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
        ), bench AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
        ), ctoks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok,
                 generate_subscripts({_TOKS}, 1) AS ord
          FROM corpus
        ), g2 AS (
          SELECT doc_id,
                 (2000000 * (count(g) - count(DISTINCT g)) + count(g))
                     // (2 * count(g)) AS g2m
          FROM (SELECT doc_id,
                       tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS g
                FROM ctoks)
          WHERE g IS NOT NULL GROUP BY doc_id
        ), t2 AS (
          SELECT doc_id,
                 (2000000 * (len({_TOKS}) - len(list_distinct({_TOKS}))) + len({_TOKS}))
                     // (2 * len({_TOKS})) AS tm
          FROM corpus
        ), q1 AS (
          -- LEFT + coalesce(0) mirrors shingles()'s whole-doc fallback
          -- for 1-token docs (review finding: inner join dropped them);
          -- verdicts compare exact integer micro ratios (never rounded
          -- doubles — the round-8 cross-engine flip class)
          SELECT c.doc_id, c.text
          FROM corpus c JOIN t2 USING (doc_id) LEFT JOIN g2 USING (doc_id)
          WHERE tm <= 600000 AND coalesce(g2m, 0) <= 50000
        ), survivors AS (
          SELECT min(doc_id) AS doc_id FROM (
            SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
            FROM q1) GROUP BY fp
        ), q2 AS (SELECT q1.* FROM q1 JOIN survivors USING (doc_id)),
        qgrams AS (
          SELECT doc_id,
                 tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                     || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w
                     || ' ' || lead(tok, 5) OVER w || ' ' || lead(tok, 6) OVER w
                     || ' ' || lead(tok, 7) OVER w AS g
          FROM (SELECT doc_id, unnest({_TOKS}) AS tok,
                       generate_subscripts({_TOKS}, 1) AS ord FROM q2)
          WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
        ), bgrams AS (
          SELECT DISTINCT tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                     || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w
                     || ' ' || lead(tok, 5) OVER w || ' ' || lead(tok, 6) OVER w
                     || ' ' || lead(tok, 7) OVER w AS g
          FROM (SELECT doc_id, unnest({_TOKS}) AS tok,
                       generate_subscripts({_TOKS}, 1) AS ord FROM bench)
          WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
        ), dirty AS (
          -- short docs (<8 tokens) contribute their whole token string as
          -- one gram, mirroring shingle_hashes' fold-what-you-have
          -- fallback (review finding: the lead-chain alone yields NULL
          -- for them and short cross-boundary dups went undetected)
          SELECT DISTINCT c.doc_id
          FROM (SELECT doc_id, g FROM qgrams WHERE g IS NOT NULL
                UNION ALL
                SELECT doc_id, array_to_string({_TOKS}, ' ') AS g
                FROM q2 WHERE len({_TOKS}) < 8) c
          JOIN (SELECT g FROM bgrams WHERE g IS NOT NULL
                UNION ALL
                SELECT array_to_string({_TOKS}, ' ') AS g
                FROM bench WHERE len({_TOKS}) < 8) b USING (g)
        ), q3 AS (SELECT q2.* FROM q2 ANTI JOIN dirty USING (doc_id)),
        r AS (
          SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                 row_number() OVER (
                     ORDER BY md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)),
                              doc_id) - 1 AS idx
          FROM q3
        )
        SELECT doc_id, CAST(idx // 64 AS BIGINT) AS shard,
               CAST(idx % 64 AS BIGINT) AS pos_in_shard, n_tokens
        FROM r""",
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-data pipeline as one composed plan — the job a
    100 TB corpus build runs nightly: Gopher-shaped repetition filter
    (fused into the scan as array expressions — no self-join for a
    per-row verdict), exact dedup keeping the min-id survivor WITH its
    text via struct-min (one (fp, ·) shuffle, no join-back),
    8-gram benchmark decontamination (bench gram set broadcasts, corpus
    emits only dirty ids, LEFT ANTI to survive), and the deterministic
    md5 shard shuffle on the survivors (distributed prefix-sum rank).
    Every stage is individually oracle-proven elsewhere; this row proves
    the COMPOSITION end to end against one chained DuckDB CTE."""
    from .operators.dedup import shingle_hashes, shingles
    from .operators.text import tokens

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    # stage 1 — quality filter, fused per-row expressions
    # (operators/curation.py:repetition_stats semantics, inlined so the
    # verdict rides the same scan that feeds the next stage); verdicts
    # compare exact integer micro ratios — a float-boundary flip here
    # changes which documents survive (round-8 failure class)
    from .operators.text import micro_ratio

    toks = tokens("text")
    n = F.size(toks)
    n_grams = F.greatest(n - 1, F.lit(1))
    tok_micro = micro_ratio(n - F.size(F.array_distinct(toks)), n)
    g2_micro = micro_ratio(n_grams - F.size(shingles("text", 2)), n_grams)
    q1 = corpus.filter((tok_micro <= 600000) & (g2_micro <= 50000))

    # stage 2 — exact dedup, min-id survivor carried with its text
    from .operators.text import fingerprint

    q2 = (
        q1.groupBy(fingerprint("text").alias("fp"))
        .agg(F.min(F.struct("doc_id", "text")).alias("s"))
        .select(F.col("s.doc_id").alias("doc_id"), F.col("s.text").alias("text"))
    )

    # stage 3 — benchmark decontamination (broadcast gram set, anti join)
    bench_grams = bench.select(F.explode(shingle_hashes("text", 8)).alias("g")).distinct()
    dirty = (
        q2.select("doc_id", F.explode(shingle_hashes("text", 8)).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
    )
    q3 = q2.join(dirty, "doc_id", "left_anti")

    # stage 4 — deterministic shard shuffle of the survivors (the SAME
    # operator the standalone query proves — review finding: an inline
    # copy here would drift from future shard_shuffle fixes)
    with_tokens = q3.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return shard_shuffle(with_tokens, shard_size=64, keep_cols=("n_tokens",)).select(
        "doc_id", "shard", "pos_in_shard", "n_tokens"
    )


@query(
    "curate_domain_cap",
    """WITH ranked AS (
         SELECT doc_id, source, n_chars,
                row_number() OVER (
                  PARTITION BY source
                  ORDER BY n_chars DESC, doc_id) AS domain_rank
         FROM documents)
       SELECT doc_id, source, n_chars, CAST(domain_rank AS BIGINT) AS domain_rank
       FROM ranked WHERE domain_rank <= 10""",
)
def q_curate_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (operators/curation.py:domain_cap):
    keep at most 10 documents per source, longest-first, id-tiebroken —
    the crawl-curation stage that stops boilerplate-heavy domains from
    dominating the corpus. The cap bites at every SF (sources carry
    ≳25 docs at sf0.01), so the oracle exercises the cut, not a no-op.
    ONE domain-keyed window over an (id, domain, n_chars) projection;
    hot-domain note and the cap·partitions two-phase bound live on the
    operator."""
    capped = domain_cap(load_table(spark, sf_dir, "documents"), cap=10)
    return capped.select(
        "doc_id", "source", "n_chars", F.col("domain_rank").cast("long")
    )


@query(
    "curate_split_dedup_aware",
    r"""WITH fpd AS (
         SELECT doc_id,
                md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
         FROM documents),
       labeled AS (
         SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS cluster_id
         FROM fpd)
       SELECT doc_id, cluster_id,
              CASE WHEN CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 6)
                        AS BIGINT) % 100 < 90
                   THEN 'train' ELSE 'val' END AS split
       FROM labeled""",
)
def q_curate_split_dedup_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-consistent train/val split: the split key is the
    DUPLICATE CLUSTER, not the document, so no two copies of the same
    text can land on opposite sides — the leakage mode a plain id-bucket
    split (`curate_split_train_val`) cannot rule out, and the reason
    dedup must precede splitting in a training pipeline. Clusters here
    are exact-duplicate groups (min doc id per normalized-text md5, the
    `dedup_exact` key); for NEAR-dup awareness swap cluster_id for the
    minhash canonical labels (`dedup_minhash_canonical` — both halves
    separately oracle-proven; composed here they'd pay the label-
    propagation cost on every split rebuild, so production materializes
    labels once and joins).

    Scale: ONE fp-keyed window over an (id, 32-byte fp) projection; the
    split itself is a pure md5-bucket projection, append-stable in the
    cluster id."""
    from data_engineering_spark.operators.text import fingerprint

    docs = _docs(spark, sf_dir)
    # the CANONICAL fingerprint helper, not an inline copy: the dedup
    # family and this split must agree on normalization forever, or two
    # copies of one text can land on opposite sides (r11 review)
    fpd = docs.select("doc_id", fingerprint("text").alias("fp"))
    from pyspark.sql import Window

    labeled = fpd.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("fp")).alias("cluster_id"),
    )
    split = F.when(hash_bucket("cluster_id", 100) < 90, F.lit("train")).otherwise(
        F.lit("val")
    )
    return labeled.select("doc_id", "cluster_id", split.alias("split"))
