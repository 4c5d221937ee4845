"""Query pack #3: UDF/NLP layer (§2.10 UD1-UD3), streaming-window
semantics as batch-checkable queries (§2.9), and multimodal plumbing.

Streaming note: ``F.window`` / ``F.session_window`` compute identical
results in batch mode, so the window operators get full DuckDB oracles
here; the *incremental* behavior (watermarks, AvailableNow, foreachBatch)
is exercised in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.multimodal import (
    audio_frame_features,
    extract_features,
    media_metadata,
    resize_images,
    sample_frames,
    synthetic_audio,
    synthetic_media,
)
from .operators.graph import pagerank_integer
from .operators.nlp import (
    embed_text,
    keyword_extract,
    split_sentences,
    tfidf_keywords,
    tokenize_pandas,
)
from .registry import query


_SCRATCH_DIRS: list[str] = []


def _scratch_lake_dir(prefix: str) -> str:
    """Fresh scratch path for a lake-table demo query, removed at
    process exit: each invocation writes a full table copy, and the
    pre-r9 bare mkdtemp leaked one copy per bench/sweep run (ADVICE r8).
    Cleanup is atexit (not try/finally) because the returned DataFrame
    reads the files LAZILY — the driver consumes it after the query
    function returns."""
    import atexit
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix=prefix)
    # LakeTable.create asserts a fresh path; mkdtemp pre-creates it
    shutil.rmtree(base, ignore_errors=True)
    if not _SCRATCH_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH_DIRS]
        )
    _SCRATCH_DIRS.append(base)
    return base


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.10 UDF / NLP
# ---------------------------------------------------------------------------


@query(
    "nlp_tfidf_keywords",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         FROM documents),
       tf AS (
         SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         FROM tok WHERE length(tok) > 2 GROUP BY doc_id, tok),
       dfreq AS (
         SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
       scored AS (
         SELECT tf.doc_id, tf.tok, tf.tf,
                round(tf.tf * ln(((SELECT count(*) FROM documents) + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
         FROM tf JOIN dfreq ON tf.tok = dfreq.tok)
       SELECT doc_id, tok AS keyword,
              CAST(kw_rank AS BIGINT) AS kw_rank, tfidf
       FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                          ORDER BY tfidf DESC, tok) AS kw_rank
             FROM scored) t
       WHERE kw_rank <= 3""",
)
def q_nlp_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD2's scoring as pure DataFrame TF-IDF (operators/nlp.py:
    tfidf_keywords) — no UDF, fully codegen'd."""
    return tfidf_keywords(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "nlp_keyword_extract",
    """WITH g AS (
         SELECT CAST(CAST('0x' || substr(md5(source), 1, 6) AS BIGINT)
                     % 16777216 AS BIGINT) AS group_id, text
         FROM documents),
       tok AS (
         SELECT group_id,
                unnest(regexp_extract_all(lower(text), '[A-Za-z0-9가-힣]+')) AS kw
         FROM g),
       c AS (
         SELECT group_id, kw, count(*) AS cnt
         FROM tok WHERE length(kw) > 2 GROUP BY 1, 2),
       r AS (
         SELECT group_id, kw AS keyword,
                row_number() OVER (PARTITION BY group_id
                                   ORDER BY cnt DESC, kw) AS kw_rank
         FROM c)
       SELECT group_id, keyword, CAST(kw_rank AS BIGINT) AS kw_rank
       FROM r WHERE kw_rank <= 3""",
)
def q_nlp_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD2 — grouped-map keyword extraction keyed by source (the
    reference's per-employee loop, Keyword.py:192-228, on executors).

    Oracle-checked: the grouped-map's scoring is deterministic (token
    counts, (-count, token) tie-break), so a window-SQL twin verifies
    the applyInPandas path end-to-end. The group key uses the
    engine-portable md5 bucket (operators/curation.py:hash_bucket
    scheme) instead of Spark's Murmur3 ``hash()``, which DuckDB cannot
    reproduce."""
    from .operators.curation import hash_bucket

    docs = _t(spark, sf_dir, "documents").withColumn(
        "group_id", hash_bucket("source", 16777216).cast("long")
    )
    return keyword_extract(docs, "group_id", "text")


_EMBED_SUMS = ", ".join(
    f"coalesce(sum(CASE WHEN bucket = {j} THEN sign END), 0.0) AS v{j}"
    for j in range(16)
)
_EMBED_NORM = " + ".join(f"v{j} * v{j}" for j in range(16))
_EMBED_VALS = ", ".join(f"v{j} / nrm" for j in range(16))

_EMBED_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[A-Za-z0-9가-힣]+')) AS tok
  FROM documents),
h AS (
  SELECT doc_id,
         list_reduce(
           list_concat([CAST(2166136261 AS BIGINT)],
                       list_transform(range(1, length(tok) + 1),
                                      i -> CAST(unicode(tok[i]) AS BIGINT))),
           (acc, c) -> (xor(acc, c) * 16777619) % 4294967296) AS hv
  FROM tok),
sv AS (
  SELECT doc_id, hv % 16 AS bucket,
         CASE WHEN (hv // 256) % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign
  FROM h),
vec AS (SELECT doc_id, {_EMBED_SUMS} FROM sv GROUP BY doc_id),
normed AS (
  SELECT doc_id,
         [{_EMBED_VALS}] AS vals
  FROM (SELECT *, CASE WHEN {_EMBED_NORM} = 0 THEN 1.0
                       ELSE sqrt({_EMBED_NORM}) END AS nrm
        FROM vec))
SELECT doc_id, CAST(i AS BIGINT) AS dim, round(vals[i + 1], 6) AS val
FROM normed CROSS JOIN (SELECT unnest(range(16)) AS i)
"""


@query("nlp_embed_text", _EMBED_ORACLE)
def q_nlp_embed_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD3 — text → fixed-dim float vector via Arrow pandas_udf.

    Oracle-checked: the feature-hashing embedding is deterministic
    (FNV-1a token hash → signed bucket votes → L2 norm), and FNV-1a
    folds exactly in DuckDB SQL (list_reduce over codepoints — the
    corpus is ASCII, where codepoint == utf-8 byte). The registered
    projection explodes to (doc_id, dim, val) rows because the harness
    canonicalizer can't hash raw array cells; values are bit-identical
    float64 (integer vote sums + one IEEE sqrt) so the 6dp rounding is
    purely cosmetic. The array-native operator (``nlp.embed_text``) is unchanged
    underneath."""
    emb = embed_text(F.col("text"))
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(emb).alias("dim", "val"))
        .select(
            "doc_id",
            F.col("dim").cast("long").alias("dim"),
            F.round(F.col("val").cast("double"), 6).alias("val"),
        )
    )


@query(
    "nlp_tokenize_pandas",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9가-힣]+')) AS BIGINT) AS n_toks,
              array_to_string(regexp_extract_all(lower(text), '[A-Za-z0-9가-힣]+'), ' ') AS toks_str
       FROM documents""",
)
def q_nlp_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD1 — analyzer-shaped pandas_udf tokenizer; compare
    text.tokens() for the no-UDF fast path. Oracle-checked: the UDF is a
    deterministic regex, so DuckDB's regexp_extract_all is an exact twin —
    proving the Arrow path is value-correct, not just runnable.

    Tokens are emitted space-joined (tokens are \\w-class so the join is
    lossless): the harness canonicalizer can't sort/hash raw array cells,
    and string equality here is exactly array equality."""
    toks = tokenize_pandas(F.col("text"))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.concat_ws(" ", toks).alias("toks_str"),
    )


# Greedy longest-match subword segmentation, end to end in SQL: vocab =
# top-24 substrings (len 2..4) of the distinct words weighted by word
# frequency (ties → substring ASC, so the cutoff is deterministic); the
# encoder is a recursive CTE advancing one token per step — the LEFT
# JOIN probes every vocab entry at the current position and
# max(matched length) with a coalesce-to-1 fallback is exactly
# "longest match, else single char".
_SUBWORD_CTES = r"""
w AS (
  SELECT tok AS word, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents)
  GROUP BY 1),
subs AS (
  SELECT substr(word, s, l) AS sub, CAST(sum(wc) AS BIGINT) AS weight
  FROM w
  CROSS JOIN unnest(range(1, len(word) + 1)) AS ss(s)
  CROSS JOIN (SELECT unnest(range(2, 5)) AS l) ll
  WHERE s + l - 1 <= len(word)
  GROUP BY 1),
vocab AS (SELECT sub, len(sub) AS sl FROM subs ORDER BY weight DESC, sub LIMIT 24),
enc AS (
  SELECT word, CAST(1 AS BIGINT) AS pos, CAST([] AS VARCHAR[]) AS toks FROM w
  UNION ALL
  SELECT u.word, u.pos + u.tlen, list_append(u.toks, substr(u.word, u.pos, u.tlen))
  FROM (
    SELECT e.word, e.pos, e.toks,
           coalesce(max(CASE WHEN substr(e.word, e.pos, v.sl) = v.sub THEN v.sl END), 1) AS tlen
    FROM enc e LEFT JOIN vocab v ON substr(e.word, e.pos, v.sl) = v.sub
    WHERE e.pos <= len(e.word)
    GROUP BY e.word, e.pos, e.toks
  ) u),
done AS (SELECT word, toks FROM enc WHERE pos > len(word))
"""

_SUBWORD_ORACLE = f"""
WITH RECURSIVE
{_SUBWORD_CTES}
SELECT d.word, w.wc AS word_freq,
       CAST(len(d.toks) AS BIGINT) AS n_subwords,
       array_to_string(d.toks, '|') AS subtokens
FROM done d JOIN w USING (word)
"""


@query("nlp_subword_tokenize", _SUBWORD_ORACLE)
def q_nlp_subword_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword tokenization (WordPiece's greedy longest-match rule) with
    the vocabulary DERIVED from the corpus and the whole pipeline —
    vocabulary selection AND per-word segmentation — hash-checked
    against a DuckDB twin. Upgrades the regex token counter
    (`text_token_count`) to a real segmenter: `subword_vocab` takes the
    top-24 frequency-weighted substrings (deterministic tie-break), and
    `subword_encode_words` greedily segments each distinct word,
    single-char fallback for uncovered spans.

    Scale shape (operators/nlp.py): the corpus is scanned once for word
    counts; everything downstream — substring explode, vocab top-k,
    the Python encode loop — runs over DISTINCT words (dictionary
    encoding), so cost scales with vocabulary, not tokens. The vocab is
    a bounded TakeOrdered collect riding the UDF closure; swapping in a
    trained BPE/WordPiece list is the production seam (same greedy
    rule). Output is one row per distinct word (word, corpus frequency,
    subword count, '|'-joined segmentation) — the tokenizer's full
    behavior surface, hash-compared."""
    from .operators.nlp import subword_encode_words, subword_vocab_from_words
    from .operators.text import tokens as _tokens

    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("word_freq"))
    )
    # vocab derives from the SAME word-count frame the output reuses —
    # one corpus aggregation per job, not one per consumer
    vocab = subword_vocab_from_words(words, vocab_size=24, max_len=4, weight_col="word_freq")
    enc = subword_encode_words(words, vocab)
    return enc.select(
        "word",
        F.col("word_freq").cast("long").alias("word_freq"),
        F.size("subtokens").cast("long").alias("n_subwords"),
        F.concat_ws("|", "subtokens").alias("subtokens"),
    )


@query(
    "nlp_subword_doc_tokens",
    f"""WITH RECURSIVE
{_SUBWORD_CTES},
wn AS (SELECT word, CAST(len(toks) AS BIGINT) AS n FROM done),
tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wn.n) AS BIGINT) AS n_subwords
FROM tok t JOIN wn USING (word)
GROUP BY t.doc_id""",
)
def q_nlp_subword_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document subword token counts — the number every training
    pipeline actually bills, packs, and mixes by. Demonstrates the
    dictionary-encode-then-join-back pattern at document level: the
    greedy segmenter runs once per DISTINCT word (vocabulary-bounded),
    the resulting (word → n_subwords) map is broadcast (it is the
    vocabulary, small by construction), and the corpus pays one
    explode + broadcast-join + doc-keyed partial agg — two corpus-side
    shuffles total, none proportional to vocabulary size. Oracle: the
    same recursive segmentation CTEs joined back to the exploded token
    stream."""
    from .operators.nlp import subword_encode_words, subword_vocab_from_words
    from .operators.text import tokens as _tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens("text")).alias("word"))
    # one word-keyed aggregation serves both consumers: vocab weights
    # and the distinct-word list the encoder segments
    words = tok.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    vocab = subword_vocab_from_words(words, vocab_size=24, max_len=4)
    wn = subword_encode_words(words.select("word"), vocab).select(
        "word", F.size("subtokens").cast("long").alias("n")
    )
    return (
        tok.join(F.broadcast(wn), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n").cast("long").alias("n_subwords"),
        )
    )


@query(
    "nlp_split_sentences",
    """WITH planted AS (
         SELECT doc_id,
                replace(replace(text, ' table ', '. '), ' query ', '! ') AS text
         FROM documents),
       norm AS (
         SELECT doc_id,
                string_split(replace(replace(text, '!', '.'), '?', '.'), '.') AS parts
         FROM planted WHERE text IS NOT NULL AND text <> ''),
       p AS (
         SELECT doc_id, unnest(parts) AS part,
                generate_subscripts(parts, 1) - 1 AS sent_no
         FROM norm)
       SELECT doc_id, CAST(sent_no AS INTEGER) AS sent_no,
              trim(part, ' ' || chr(9) || chr(10) || chr(13)) AS sentence
       FROM p
       WHERE trim(part, ' ' || chr(9) || chr(10) || chr(13)) <> ''""",
)
def q_nlp_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface — one row per sentence via LATERAL Python table
    function (operators/nlp.py:SplitSentences). The UDTF's naive
    ./!/? splitting is deterministic, so DuckDB's split+unnest is an
    exact oracle: sent_no is the pre-filter part index in both engines,
    proving the lateral-join plumbing preserves per-row ordinals.

    The synthetic corpus contains no punctuation (every doc would be one
    sentence — a vacuous split), so the query *plants* terminators
    deterministically in both engines first: ``' table '`` → ``'. '``
    and ``' query '`` → ``'! '``, which also exercises the !-normalizer
    (~8 sentences/doc at sf0.01)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.replace(
            F.replace(F.col("text"), F.lit(" table "), F.lit(". ")),
            F.lit(" query "),
            F.lit("! "),
        ).alias("text"),
    )
    return split_sentences(docs)


# ---------------------------------------------------------------------------
# §2.9 Streaming window semantics (batch-checkable)
# ---------------------------------------------------------------------------


@query(
    "st_tumbling_counts",
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
              CAST(count(*) AS BIGINT) AS cnt
       FROM events GROUP BY 1, 2""",
)
def q_st_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — tumbling 1h window counts (streaming/streams.py:
    tumbling_counts runs this same groupBy incrementally)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


@query(
    "st_sliding_value_sum",
    """WITH buckets AS (
         SELECT ts, value, event_type,
                time_bucket(INTERVAL '30 minutes', ts) AS b
         FROM events),
       expanded AS (
         SELECT event_type, value, b AS window_start FROM buckets
         UNION ALL
         SELECT event_type, value, b - INTERVAL '30 minutes' AS window_start FROM buckets)
       SELECT window_start, event_type, round(sum(value), 2) AS total_value
       FROM expanded GROUP BY 1, 2""",
)
def q_st_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — sliding window (1h / 30m) sum; the oracle expands each row
    into the two windows that contain it."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "total_value")
    )


@query(
    "st_interval_join",
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
              c.user_id,
              CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_sec
       FROM events c JOIN events p
         ON c.user_id = p.user_id
        AND c.event_type = 'click' AND p.event_type = 'purchase'
        AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '10 minutes'""",
)
def q_st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — stream-stream interval join semantics, batch-checked
    (streaming/streams.py:interval_join; the incremental two-stream
    execution is asserted in tests/test_streaming.py): click →
    purchase attribution per user within a 10-minute window. The range
    predicate is what bounds streaming state; batch-side it is just an
    inner join the oracle replays."""
    from .streaming.streams import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("l_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("r_ts"),
    )
    return interval_join(clicks, purchases).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.col("r_ts").cast("long") - F.col("l_ts").cast("long")).alias("gap_sec"),
    )


@query(
    "st_session_windows",
    """WITH ordered AS (
         SELECT user_id, ts, value,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL '10 minutes'
                     THEN 1 ELSE 0 END AS new_session
         FROM events),
       sessions AS (
         SELECT user_id, ts, value,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_no
         FROM ordered)
       SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS session_value,
              min(ts) AS session_start
       FROM sessions GROUP BY user_id, session_no""",
)
def q_st_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — session windows (10 min gap) per user; oracle via
    gaps-and-islands. session_window end = last_event + gap, so we
    compare on (user, start, count, sum)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "n_events", "session_value", "session_start")
    )


# ---------------------------------------------------------------------------
# Lakehouse transaction log (sources/txlog.py)
# ---------------------------------------------------------------------------


@query(
    "lake_time_travel",
    """SELECT o_orderdate, CAST(count(*) AS BIGINT) AS n_orders,
              round(sum(o_totalprice), 2) AS total_price
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
       GROUP BY o_orderdate""",
)
def q_lake_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-log table format end-to-end (sources/txlog.py:
    LakeTable): create a logged table from pre-1999 orders (range-
    partitioned so files carry disjoint o_orderdate stats), APPEND the
    1999+ orders as a second commit, then read **version 0** with a
    date filter.

    The oracle sees only 1998 rows —
    a hash match proves snapshot isolation (the append is invisible at
    v0) AND that file-level stat pruning changed IO, not results. The
    generalization of the reference's S11-S13 directory-swap writers to
    ACID commits; pruning effectiveness is asserted in
    tests/test_txlog.py."""
    from .sources.txlog import LakeTable

    base = _scratch_lake_dir("lake_tt_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    t = LakeTable(spark, base)
    t.create(
        orders.filter(F.col("o_orderdate") < "1999-01-01").repartitionByRange(
            4, "o_orderdate"
        )
    )
    t.append(
        orders.filter(F.col("o_orderdate") >= "1999-01-01").repartitionByRange(
            2, "o_orderdate"
        )
    )
    return (
        t.scan(version=0, filters=[("o_orderdate", ">=", "1998-01-01")])
        .groupBy("o_orderdate")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "lake_delete_scan",
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
              round(sum(o_totalprice), 2) AS total_price
       FROM orders
       WHERE o_orderdate < TIMESTAMP '2001-01-01'
       GROUP BY o_orderstatus""",
)
def q_lake_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE on immutable storage (sources/txlog.py:
    delete_where): orders land as four date-ranged files, then 2001+
    rows are deleted — the sargable prune restricts the rewrite to the
    files whose stats admit such rows; the rest keep their identity in
    the log. The oracle recomputes from the raw table with the
    equivalent WHERE, so the hash match proves rewrite-DML correctness
    (and old versions still time-travel, asserted in tests)."""
    from .sources.txlog import LakeTable

    base = _scratch_lake_dir("lake_del_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
    )
    t = LakeTable(spark, base)
    t.create(orders.repartitionByRange(4, "o_orderdate"))
    t.delete_where(
        "o_orderdate >= TIMESTAMP '2001-01-01'",
        prune_filters=[("o_orderdate", ">=", "2001-01-01")],
    )
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "lake_dv_delete_scan",
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
              round(sum(o_totalprice), 2) AS total_price
       FROM orders
       WHERE o_orderkey % 97 <> 11
       GROUP BY o_orderstatus""",
)
def q_lake_dv_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors (sources/txlog.py:
    delete_where_dv — the Delta DV design): a sparse ~1% of orders
    (o_orderkey % 97 = 11, spread across every file) is deleted as
    committed ROW POSITIONS — zero data files move, and the scan
    applies each file's vector through a broadcast anti-join on
    (basename, parquet row_index). The oracle recomputes from the raw
    table with the complementary WHERE, so the hash match proves the
    position capture AND the DV-aware read end-to-end. This is the
    100 TB delete shape: a 0.001% GDPR-style erasure costs one commit,
    not a file-rewrite pass (``lake_delete_scan`` stays the
    copy-on-write twin for DENSE deletes)."""
    from .sources.txlog import LakeTable

    base = _scratch_lake_dir("lake_dv_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
    )
    t = LakeTable(spark, base)
    t.create(orders.repartitionByRange(4, "o_orderdate"))
    n_files = len(t.files())
    t.delete_where_dv("o_orderkey % 97 = 11")
    # merge-on-read invariant, enforced in the query itself (a raise,
    # not assert — the oracle's complementary WHERE matches either way,
    # so this check is the ONLY thing distinguishing merge-on-read from
    # a copy-on-write regression, and asserts vanish under python -O)
    if len(t.files()) != n_files:
        raise RuntimeError(
            f"lake_dv_delete_scan: expected zero file rewrites, file count "
            f"moved {n_files} -> {len(t.files())} (copy-on-write regression)"
        )
    if not t.deletion_vectors():
        raise RuntimeError(
            "lake_dv_delete_scan: delete_where_dv committed no deletion vectors"
        )
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "lake_zorder_scan",
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
              round(sum(o_totalprice), 2) AS total_price
       FROM orders
       WHERE o_custkey >= 1400 AND o_totalprice >= 150000.0
       GROUP BY o_orderstatus""",
)
def q_lake_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering end-to-end (operators/zorder.py +
    sources/txlog.py): orders written as 8 Morton-clustered files in a
    logged table, then scanned with a two-column box filter — the log's
    per-file stats prune on BOTH o_custkey and o_totalprice (a linear
    sort serves only its sort column; quantified in tests/
    test_zorder.py). The oracle is the plain filtered aggregate, so the
    hash match proves clustering + pruning changed IO, never results."""
    from .operators.zorder import zorder_layout
    from .sources.txlog import LakeTable

    base = _scratch_lake_dir("lake_z_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t = LakeTable(spark, base)
    t.create(zorder_layout(orders, ["o_custkey", "o_totalprice"], num_files=8))
    return (
        t.scan(
            filters=[("o_custkey", ">=", 1400), ("o_totalprice", ">=", 150000.0)]
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only — no media table in the oracle views)
# ---------------------------------------------------------------------------


@query(
    "mm_media_metadata",
    """WITH ids AS (SELECT unnest(range(64)) AS i),
       dims AS (
         SELECT i,
                CASE WHEN i % 3 <> 1 THEN 64 + (i % 8) * 16 END AS width,
                CASE WHEN i % 3 <> 1 THEN 48 + (i % 8) * 12 END AS height
         FROM ids),
       m AS (
         SELECT CAST(i AS BIGINT) AS media_id,
                ['image', 'audio', 'video'][(i % 3) + 1] AS kind,
                CASE i % 3 WHEN 0 THEN
                    encode('P6' || chr(10) || CAST(width AS VARCHAR) || ' '
                           || CAST(height AS VARCHAR) || chr(10) || '255'
                           || chr(10))
                    || unhex(substring(
                         repeat(sha256('media-' || CAST(i AS VARCHAR)),
                                CAST(ceil(width * height * 3 / 32.0) AS INTEGER)),
                         1, width * height * 3 * 2))
                ELSE repeat(unhex(sha256('media-' || CAST(i AS VARCHAR))),
                            CAST(4 + i % 4 AS INTEGER))
                END AS content,
                CASE i % 3 WHEN 0 THEN 'image/x-portable-pixmap'
                           WHEN 1 THEN 'audio/wav'
                           ELSE 'video/mp4' END AS mime,
                width, height
         FROM dims)
       SELECT media_id, kind, mime,
              CAST(octet_length(content) AS INTEGER) AS n_bytes,
              hex(content) AS content_hex,
              CASE WHEN height IS NOT NULL AND height > 0
                   THEN round(width * 1.0 / height, 4) END AS aspect
       FROM m""",
)
def q_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — typed metadata over opaque binary media columns.
    Oracle-checked: the synthetic payload generator is reproducible in
    SQL — image rows are real binary PPMs (ASCII header + a seeded
    sha256 pixel stream, rebuilt via header concat + hex-domain
    repeat/substring), audio/video rows are the plain repeated-digest
    stream — so payload bytes, sizes, and aspect math all get hard
    verification. The registered projection uses ``digest="hex"``
    because DuckDB cannot md5 a BLOB; the md5 path stays the operator
    default."""
    return media_metadata(synthetic_media(spark, 64), digest="hex")


@query(
    "mm_pixel_features",
    """WITH ids AS (SELECT unnest(range(64)) AS i),
       imgs AS (SELECT CAST(i AS BIGINT) AS media_id,
                       64 + (i % 8) * 16 AS w, 48 + (i % 8) * 12 AS h,
                       sha256('media-' || CAST(i AS VARCHAR)) AS dg
                FROM ids WHERE i % 3 = 0),
       px AS (
         SELECT media_id, w, h, ty.y AS y, tx.x AS x,
                ('0x'||substr(dg, 2*(((ty.y*w+tx.x)*3+0)%32)+1, 2))::BIGINT AS b0,
                ('0x'||substr(dg, 2*(((ty.y*w+tx.x)*3+1)%32)+1, 2))::BIGINT AS b1,
                ('0x'||substr(dg, 2*(((ty.y*w+tx.x)*3+2)%32)+1, 2))::BIGINT AS b2
         FROM imgs, unnest(range(h)) ty(y), unnest(range(w)) tx(x)),
       s AS (
         SELECT media_id, w, h,
                sum(b0) AS s0, sum(b1) AS s1, sum(b2) AS s2,
                sum(b0+b1+b2) AS sg, sum((b0+b1+b2)*(b0+b1+b2)) AS sg2,
                sum(CASE WHEN y < h//2 AND x < w//2 THEN b0+b1+b2 ELSE 0 END) AS g0,
                sum(CASE WHEN y < h//2 AND x >= w//2 THEN b0+b1+b2 ELSE 0 END) AS g1,
                sum(CASE WHEN y >= h//2 AND x < w//2 THEN b0+b1+b2 ELSE 0 END) AS g2,
                sum(CASE WHEN y >= h//2 AND x >= w//2 THEN b0+b1+b2 ELSE 0 END) AS g3
         FROM px GROUP BY 1, 2, 3),
       f AS (
         SELECT media_id,
                s0/255.0/(w*h) AS f0, s1/255.0/(w*h) AS f1, s2/255.0/(w*h) AS f2,
                sqrt(sg2/(765.0*765.0)/(w*h)
                     - (sg/765.0/(w*h))*(sg/765.0/(w*h))) AS f3,
                g0/765.0/((h//2)*(w//2)) AS f4,
                g1/765.0/((h//2)*(w-w//2)) AS f5,
                g2/765.0/((h-h//2)*(w//2)) AS f6,
                g3/765.0/((h-h//2)*(w-w//2)) AS f7
         FROM s)
       SELECT media_id, CAST(d AS BIGINT) AS dim,
              round(CAST(v AS REAL)::DOUBLE, 6) AS val
       FROM f, LATERAL (VALUES (0, f0), (1, f1), (2, f2), (3, f3),
                               (4, f4), (5, f5), (6, f6), (7, f7)) t(d, v)""",
)
def q_mm_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — the REAL pixel-statistics feature path of
    `extract_features`, hash-checked: the image subset of the synthetic
    media corpus decodes to sha256-stream pixels the SQL twin rebuilds
    byte-for-byte, then every feature derives from INTEGER channel sums
    (means, population std via (n, Σs, Σs²), quadrant means), so both
    engines feed one IEEE division/sqrt chain with exact inputs. The
    emitted value is round(f32(v), 6) on both sides — the operator's
    array<float> cells emulated in SQL with a REAL cast — which
    collapses the ~1e-12 two-pass-vs-closed-form variance gap without
    hiding a wrong stride, channel order, or quadrant boundary. The
    digest-fold fallback (audio/video rows) stays under the rows-only
    `mm_extract_features`: IEEE-754-reinterpreting sha256 bytes (NaN/Inf
    included) has no portable SQL form."""
    media = synthetic_media(spark, 64).filter(F.col("kind") == "image")
    out = extract_features(media)
    return out.select("media_id", F.posexplode("feature").alias("dim", "val")).select(
        "media_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("val").cast("double"), 6).alias("val"),
    )


@query("mm_extract_features")
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — mapInPandas feature extraction over binary payloads
    (REAL pixel statistics for the PPM image rows via decode_image;
    digest-fold embedding for audio/video). Feature vector emitted as
    JSON so the harness canonicalizer (pandas sort/hash) can handle the
    cell; the array-native operator is unchanged underneath."""
    out = extract_features(synthetic_media(spark, 64))
    return out.select("media_id", F.to_json("feature").alias("feature_json"))


@query(
    "mm_sample_frames",
    """WITH ids AS (SELECT unnest(range(64)) AS i),
       m AS (
         SELECT CAST(i AS BIGINT) AS media_id,
                repeat(unhex(sha256('media-' || CAST(i AS VARCHAR))),
                       CAST(4 + i % 4 AS INTEGER)) AS content,
                1000 * (1 + i % 30) AS duration_ms
         FROM ids WHERE i % 3 = 2)
       SELECT media_id,
              CAST(f AS BIGINT) AS frame_ts_ms,
              md5(hex(content) || CAST(f AS VARCHAR)) AS frame_digest
       FROM m, unnest(range(0, duration_ms, 5000)) AS t(f)""",
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — video frame-sampling fan-out (sequence + explode).
    Oracle-checked: the synthetic payload stream reconstructs in SQL
    (as in mm_media_metadata) and the per-frame digest is md5 over
    (payload hex || ts) — string-domain, so DuckDB recomputes it
    exactly; fan-out bounds (range stepping) verify too."""
    return sample_frames(synthetic_media(spark, 64))


@query(
    "mm_resize_images",
    """WITH ids AS (SELECT unnest(range(64)) AS i),
       imgs AS (
         SELECT CAST(i AS BIGINT) AS media_id,
                64 + (i % 8) * 16 AS w, 48 + (i % 8) * 12 AS h,
                sha256('media-' || CAST(i AS VARCHAR)) AS dg
         FROM ids WHERE i % 3 = 0),
       px AS (
         SELECT media_id, w, h, dg, yy.y AS y, xx.x AS x, cc.ch AS ch
         FROM imgs
         CROSS JOIN (SELECT unnest(range(64)) AS y) yy
         CROSS JOIN (SELECT unnest(range(64)) AS x) xx
         CROSS JOIN (SELECT unnest(range(3)) AS ch) cc),
       bytes_ AS (
         SELECT media_id, y, x, ch,
                upper(substr(dg,
                    2 * ((((y * h // 64) * w + (x * w // 64)) * 3 + ch) % 32) + 1,
                    2)) AS bh
         FROM px)
       SELECT media_id,
              '50360A36342036340A3235350A'
                  || string_agg(bh, '' ORDER BY y, x, ch) AS content_hex,
              64 AS width, 64 AS height
       FROM bytes_ GROUP BY media_id""",
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — real image resize (mapInPandas; PPM decode →
    nearest-neighbor sample → PPM re-encode). The registered projection
    emits the resized payload as hex: raw binary cells break the
    harness canonicalizer's stringify step (caught by
    test_driver_canon); the binary-native operator is unchanged.

    Oracle-checked (r5 ask #4, third conversion): the synthetic source
    pixels are a tiled sha256 stream (`synthetic_media`), so the SQL
    twin samples each output byte straight out of the digest hex —
    src_off = ((y·h/64)·w + x·w/64)·3 + ch, byte = digest[src_off mod
    32] — and reassembles the exact P6 payload with an ordered
    string_agg behind the 13-byte header ('50360A…' = "P6\\n64 64\\n
    255\\n"). A wrong stride, axis order, or rounding in the
    nearest-neighbor index math fails the value hash byte-for-byte."""
    out = resize_images(synthetic_media(spark, 64))
    return out.select(
        "media_id", F.hex("content").alias("content_hex"), "width", "height"
    )


def _gradient_image_rows(n: int = 24, w: int = 64, h: int = 48):
    """Deterministic structured test images: linear gradients whose
    direction/frequency vary per id — perceptually DISTINCT (unlike the
    digest-noise payloads, which are all uniform gray to a perceptual
    hash), so aHash discrimination is actually exercised. Row ``1000``
    is image 0 with a small noise patch — the re-encode/JPEG-artifact
    analog a byte-exact md5 misses."""
    import numpy as np

    from .operators.multimodal import encode_ppm

    ys, xs = np.mgrid[0:h, 0:w]
    rows = []
    for i in range(n):
        a, b = (i % 5) - 2, (i // 5) % 5 - 2
        field = (a * xs + b * ys) * (1 + i % 3)
        arr = ((field % 256)).astype(np.uint8)[:, :, None].repeat(3, axis=2)
        rows.append((i, encode_ppm(arr)))
    twin = bytearray(rows[0][1])  # header is "P6\n64 48\n255\n" = 13 bytes
    for p in range(13, 13 + 30, 3):  # pixel-aligned: R channel of pixels 0-9
        twin[p] = (twin[p] + 4) % 256
    rows.append((1000, bytes(twin)))
    return rows


@query(
    "mm_image_dedup",
    """WITH base AS (SELECT unnest(range(24)) AS i),
       imgs AS (
         SELECT CAST(i AS BIGINT) AS img_id,
                (i % 5) - 2 AS a, ((i // 5) % 5) - 2 AS b, 1 + (i % 3) AS m,
                FALSE AS pert
         FROM base
         UNION ALL SELECT 1000, -2, -2, 1, TRUE),
       pix AS (
         SELECT img_id, x, y,
                ((((a * x + b * y) * m) % 256) + 256) % 256 AS p, pert
         FROM imgs
         CROSS JOIN (SELECT unnest(range(64)) AS x) tx
         CROSS JOIN (SELECT unnest(range(48)) AS y) ty),
       s3 AS (
         SELECT img_id, x // 8 AS c, y // 6 AS r,
                CASE WHEN pert AND y = 0 AND x < 10
                     THEN 2 * p + (p + 4) % 256 ELSE 3 * p END AS v
         FROM pix),
       blocks AS (
         SELECT img_id, r, c, sum(v) AS s FROM s3 GROUP BY 1, 2, 3),
       bits AS (
         SELECT img_id, r, c,
                CASE WHEN 64 * s >= sum(s) OVER (PARTITION BY img_id)
                     THEN 1 ELSE 0 END AS bit
         FROM blocks),
       pairs AS (
         SELECT a.img_id AS id_a, b.img_id AS id_b,
                CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)
                     AS INTEGER) AS hamming
         FROM bits a
         JOIN bits b ON a.r = b.r AND a.c = b.c AND a.img_id < b.img_id
         GROUP BY 1, 2)
       SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6""",
)
def q_mm_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — image near-duplicate pairs via perceptual
    average-hash (operators/multimodal.py:image_near_dup_pairs): decode
    → 8×8 block-mean aHash → banded candidate join → exact hamming
    verify. The corpus is 24 structured gradient images plus one planted
    near-dup (image 0 with a perturbed byte run); the pair must surface
    with a small hamming distance while the distinct gradients stay
    apart. At corpus scale only 8-byte signatures shuffle; the image
    bytes never leave their scan stage.

    Oracle-checked (the r5 verdict's ask): the gradient PPMs are pure
    integer math, so the SQL twin regenerates every pixel (Python-mod
    via ((v%256)+256)%256), folds channel sums into 8×8 block sums, and
    derives each aHash bit with the INTEGER-EXACT form of the operator's
    float comparison — block_mean ≥ mean(block_means) ⟺ 64·S_b ≥ ΣS
    when all 64 blocks hold 48 pixels (the float path's error bound,
    ~1e-10, is four orders under the 1/9216 integer quantum, and exact
    ties produce bit-identical floats on both sides). Hamming distances
    then come from a positional bit join, no 64-bit packing needed —
    and the all-pairs oracle must equal the banded plan exactly because
    8×8-bit bands find every hamming≤7 pair by pigeonhole."""
    from .operators.multimodal import image_near_dup_pairs

    corpus = spark.createDataFrame(
        _gradient_image_rows(), "media_id long, content binary"
    )
    return image_near_dup_pairs(corpus, max_hamming=6)


@query(
    "mm_audio_features",
    """WITH ids AS (SELECT unnest(range(0, 48)) AS i),
       a AS (SELECT CAST(i AS BIGINT) AS media_id,
                    sha256('audio-' || CAST(i AS VARCHAR)) AS h,
                    800 * (1 + i % 5) AS n_samples
             FROM ids),
       samp AS (
         SELECT media_id, CAST(j AS BIGINT) AS j,
                ('0x' || substr(h, 2 * ((2 * j) % 32) + 1, 2))::BIGINT
                + 256 * ('0x' || substr(h, 2 * ((2 * j + 1) % 32) + 1, 2))::BIGINT
                    AS uval
         FROM a, unnest(range(0, n_samples)) AS t(j)),
       sv AS (
         SELECT media_id, j, j // 800 AS frame_no,
                uval - CASE WHEN uval >= 32768 THEN 65536 ELSE 0 END AS x
         FROM samp),
       sgn AS (
         SELECT media_id, frame_no, x,
                CASE WHEN (x >= 0) <>
                          (lag(x) OVER (PARTITION BY media_id, frame_no ORDER BY j) >= 0)
                     THEN 1 ELSE 0 END AS zc
         FROM sv)
       SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
              round(sqrt(sum(x * x) / count(*)) / 32768, 6) AS rms,
              CAST(sum(zc) AS BIGINT) AS zero_crossings
       FROM sgn GROUP BY 1, 2""",
)
def q_mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — REAL audio decode, hash-checked: synthetic rows carry
    genuine PCM WAV payloads (RIFF header + seeded int16 stream), the
    Spark side chunk-walks the container (operators/multimodal.py:
    decode_wav) and computes per-frame RMS energy + zero-crossing counts
    in a mapInPandas pass, and the oracle regenerates every sample from
    the sha256 hex stream in SQL. Both features are integer-exact in
    double precision, so the value hash gates the decoder itself —
    a wrong byte order, chunk offset, or sign convention fails here."""
    return audio_frame_features(synthetic_audio(spark, 48))


@query(
    "nl_query_template",
    """SELECT o_orderstatus, o_orderpriority,
              round(avg(o_totalprice), 2) AS avg_o_totalprice
       FROM orders WHERE o_totalprice > 1000
       GROUP BY o_orderstatus, o_orderpriority
       ORDER BY avg(o_totalprice) DESC, o_orderstatus, o_orderpriority
       LIMIT 5""",
)
def q_nl_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4 — deterministic NL→Spark-SQL template layer
    (Openapi/openai_elasticsearch.py:71-157 minus the LLM: one request →
    one validated query over known fields). Oracle-checked: the grammar's
    compiled SQL is ANSI, so DuckDB runs the hand-written equivalent of
    the same request and must agree exactly."""
    from .functions.nl2sql import run_nl

    out = run_nl(
        spark,
        sf_dir,
        "average o_totalprice by o_orderstatus and o_orderpriority "
        "in orders where o_totalprice > 1000 top 5",
    )
    return out.withColumn("avg_o_totalprice", F.round("avg_o_totalprice", 2))


@query(
    "nl_query_range",
    """SELECT l_linestatus, round(sum(l_extendedprice), 2) AS sum_l_extendedprice
       FROM lineitem
       WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'N'
       GROUP BY l_linestatus""",
)
def q_nl_query_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4 — NL range filter: ``between … and …`` compiles to a SQL
    BETWEEN clause (the reference prompt's gte/lte bool range,
    Openapi/openai_elasticsearch.py:114-139), composed with a second
    ``and``-joined equality term — the grammar must NOT split the range's
    own "and". Oracle: the hand-written equivalent; the sum rounds to
    cents on both sides."""
    from .functions.nl2sql import run_nl

    out = run_nl(
        spark,
        sf_dir,
        "total l_extendedprice by l_linestatus in lineitem "
        "where l_quantity between 10 and 20 and l_returnflag = N",
    )
    return out.withColumn("sum_l_extendedprice", F.round("sum_l_extendedprice", 2))


@query(
    "nl_query_distinct",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal > 0",
)
def q_nl_query_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4 — NL terms-facet: ``distinct COL, COL from TABLE`` enumerates
    a field's value combinations (the reference's terms-aggregation
    request shape). Compiled to SELECT DISTINCT over validated columns;
    the oracle runs the same ANSI statement."""
    from .functions.nl2sql import run_nl

    return run_nl(
        spark, sf_dir, "distinct c_mktsegment, c_nationkey from customer where c_acctbal > 0"
    )


@query(
    "nl_query_cardinality",
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_distinct_o_custkey
       FROM orders WHERE o_totalprice > 5000
       GROUP BY o_orderstatus""",
)
def q_nl_query_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4 — NL cardinality metric: ``count distinct COL by DIM`` compiles
    to a grouped COUNT(DISTINCT …) — the ES cardinality aggregation the
    reference's dashboards request (unique employees per department
    shape). Exact integer output, no rounding needed."""
    from .functions.nl2sql import run_nl

    return run_nl(
        spark,
        sf_dir,
        "count distinct o_custkey by o_orderstatus in orders where o_totalprice > 5000",
    )


@query(
    "nl_query_scalar",
    """SELECT max(o_totalprice) AS max_o_totalprice
       FROM orders WHERE o_orderstatus = 'F'""",
)
def q_nl_query_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4 — NL scalar metric: ``AGG MEASURE in TABLE [where …]`` with no
    group-by compiles to a single aggregated value (the reference's
    one-number answer path). max is order-exact, so the value hash needs
    no rounding on either side."""
    from .functions.nl2sql import run_nl

    return run_nl(spark, sf_dir, "max o_totalprice in orders where o_orderstatus = F")


@query(
    "nl_query_having",
    """SELECT o_custkey, CAST(count(o_orderkey) AS BIGINT) AS count_o_orderkey
       FROM orders GROUP BY o_custkey HAVING count(o_orderkey) >= 18
       ORDER BY count_o_orderkey DESC, o_custkey LIMIT 10""",
)
def q_nl_query_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4 — NL bucket-threshold aggregation: ``… having at least N`` is
    the ES min_doc_count / bucket-selector knob (keep only buckets whose
    aggregate clears a threshold). Compiles to HAVING on the FULL
    aggregate expression (alias resolution inside HAVING differs across
    engines); count is exact, the top-10 cutoff tie-breaks on the dims.
    TPC-H populates orders for ~2/3 of customers (~15 per ordering
    customer at every SF), so the ≥18 threshold selects a stable upper
    tail at both oracle scales."""
    from .functions.nl2sql import run_nl

    return run_nl(
        spark,
        sf_dir,
        "count o_orderkey by o_custkey in orders having at least 18 top 10",
    )


@query(
    "nl_query_trend",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
              CAST(count(*) AS BIGINT) AS n
       FROM orders WHERE o_orderstatus = 'F' GROUP BY 1""",
)
def q_nl_query_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4 — NL date-histogram: ``monthly count in orders …`` compiles to
    a calendar-bucketed GROUP BY (the ES date_histogram aggregation
    behind every reference dashboard trend). The date column is inferred
    from the schema (o_orderdate is orders' only date-like field) and
    inference must be unique — ambiguity is an NLQueryError, not a
    guess. Exact integer counts; the month label is a string both
    engines format identically."""
    from .functions.nl2sql import run_nl

    return run_nl(
        spark, sf_dir, "monthly count in orders where o_orderstatus = F"
    )


@query(
    "nl_query_join",
    """SELECT f.o_orderkey, f.o_totalprice,
              d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal, d.c_mktsegment
       FROM orders f JOIN customer d ON f.o_custkey = d.c_custkey
       WHERE f.o_totalprice > 450000""",
)
def q_nl_query_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4 — NL cross-table lookup: the reference's end-to-end flow
    finishes with a SECOND index query keyed by the first result's
    emp_no, merging that document's fields into the answer
    (Openapi/openai_elasticsearch.py:224-292). ``… with its DIM info``
    compiles that chain to ONE broadcast lookup join over the registered
    views — the (fk, pk) pair is inferred from the two schemas
    (o_custkey ↔ c_custkey), never from the text, and both sides are
    column-validated. Scale: the dim side broadcasts; the fact is
    filtered in its scan and never shuffles."""
    from .functions.nl2sql import run_nl

    return run_nl(
        spark,
        sf_dir,
        "show o_orderkey, o_totalprice from orders "
        "where o_totalprice > 450000 with its customer info",
    )


# ---------------------------------------------------------------------------
# Event analytics: cohort retention + calendar gap fill
# ---------------------------------------------------------------------------


@query(
    "cohort_retention",
    """WITH firsts AS (
         SELECT user_id,
                CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
         FROM events GROUP BY user_id
       ), activity AS (
         SELECT DISTINCT user_id,
                CAST(date_trunc('week', ts) AS DATE) AS active_week
         FROM events
       )
       SELECT f.cohort_week,
              CAST(datediff('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
                  AS week_offset,
              CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
       FROM activity a JOIN firsts f USING (user_id)
       GROUP BY 1, 2""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over the event stream: users grouped by the ISO
    week of their first event; per (cohort, week-offset) distinct active
    users — the canonical product-analytics rollup the reference's
    serving indexes feed dashboards from. Spark-first: two aggregations
    sharing the user_id partitioning (first-event groupBy, then the
    cohort join is user-keyed so AQE plans it shuffle-reusing), distinct
    weekly activity is a projection + distinct, and the final rollup is
    one partial-agg groupBy on (cohort, offset) — at 100 TB every stage
    is key-partitioned with map-side combines; nothing is collected.
    Both engines truncate weeks to ISO Monday, so the oracle matches
    exactly."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
    )


@query(
    "ts_gap_fill",
    """WITH bounds AS (
         SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
         FROM events
       ), days AS (
         SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                    AS day FROM bounds
       ), types AS (SELECT DISTINCT event_type FROM events),
       actual AS (
         SELECT CAST(ts AS DATE) AS day, event_type,
                CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY 1, 2
       )
       SELECT d.day, t.event_type, CAST(coalesce(a.cnt, 0) AS BIGINT) AS cnt
       FROM days d CROSS JOIN types t
       LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type""",
)
def q_ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: daily event counts per type with missing
    (day, type) combinations filled with 0 — the gap-fill step every
    time-series chart/model needs, absent from both engines as a
    built-in. Spark-first: the daily counts are one partial-agg groupBy
    of the fact; the dense (day × type) spine is sequence()+explode over
    a 1-row bounds aggregate crossed with the distinct type dim — spine
    size is calendar-bounded (days × types), so it broadcasts and the
    left join adds no fact shuffle at any corpus size."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    spine = days.crossJoin(types)
    return (
        F.broadcast(spine)
        .join(actual, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )


@query(
    "ts_anomaly_zscore",
    """WITH daily AS (
         SELECT CAST(ts AS DATE) AS day, event_type,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS x
         FROM events GROUP BY 1, 2),
       stats AS (
         SELECT day, event_type, x,
                count(*) OVER w AS n,
                sum(x) OVER w AS s,
                sum(x * x) OVER w AS ss
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       SELECT day, event_type, x,
              CASE WHEN n > 1 AND (ss - s * s / n) / (n - 1) > 0
                   THEN round((x - s / n) / sqrt((ss - s * s / n) / (n - 1)), 4)
              END AS z,
              coalesce(n > 1 AND (ss - s * s / n) / (n - 1) > 0
                       AND abs((x - s / n) / sqrt((ss - s * s / n) / (n - 1))) >= 2,
                       false) AS is_anomaly
       FROM stats""",
)
def q_ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the daily per-type value
    series: each day scored against its trailing 7-day window's mean and
    sample stddev, flagged at |z| ≥ 2 — the monitoring rollup behind
    every metrics-alerting pipeline. The variance is computed from the
    window's (n, Σx, Σx²) with the textbook formula IN BOTH ENGINES —
    not the built-in stddev aggregates, whose streaming algorithms
    (Welford vs. naive) differ in final ulps and would flake the value
    hash. Ordered window frames sum ≤7 doubles sequentially, so the
    sums are bit-identical. One shuffle on the type key; the daily
    pre-aggregation is a partial-agg groupBy of the fact. The daily sum
    itself accumulates exact cent integers (value is 2-dp; ×100 → int64)
    rather than doubles, so x is independent of partial-agg order — a
    double-sum rounded to 2 dp could flake the hash at a half-boundary
    (r6 verdict wrong-item 3)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    stats = daily.select(
        "day",
        "event_type",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("ss"),
    )
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / F.greatest(
        F.col("n") - 1, F.lit(1)
    )
    z = (F.col("x") - F.col("s") / F.col("n")) / F.sqrt(var)
    ok = (F.col("n") > 1) & (var > 0)
    return stats.select(
        "day",
        "event_type",
        "x",
        F.when(ok, F.round(z, 4)).alias("z"),
        F.coalesce(ok & (F.abs(z) >= 2), F.lit(False)).alias("is_anomaly"),
    )


@query(
    "events_transition_matrix",
    """WITH seq AS (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events),
       cnt AS (
         SELECT prev_type, event_type AS next_type,
                CAST(count(*) AS BIGINT) AS n
         FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
       SELECT prev_type, next_type, n,
              round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
       FROM cnt""",
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov counts and
    per-source probabilities over each user's ordered event stream) —
    the path-analysis rollup behind journey mining and next-event
    models. One user-keyed window produces the bigrams, one partial-agg
    groupBy counts them, and the probability normalizer is a window
    over the tiny (types × types) matrix. Counts are integers, so the
    probability division is bit-identical across engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wp = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


@query("ts_downsample_lttb")  # rows-only: float numpy kernel is summation-
# order-specific; the greedy recursion itself is hash-proven by
# ts_downsample_lttb_portable's exact-integer twin
def q_ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-preserving series downsampling (LTTB,
    operators/timeseries.py): each event_type's raw (ts, value) stream
    reduced to 50 visually representative points — the
    reduce-before-dashboard step that makes plotting a 100 TB stream
    possible. One groupBy exchange co-locates each series; the greedy
    bucket selection runs kernel-local in applyInPandas and emits k rows
    per series. The float kernel's pairwise-summed centroids have no
    bit-stable SQL twin, so this row stays rows-only — but the greedy
    recursion itself is hash-proven by `ts_downsample_lttb_portable`
    (exact-integer twin, DuckDB recursive CTE); endpoints/monotonicity/
    membership are additionally pinned by tests."""
    from .operators.timeseries import lttb_downsample

    return lttb_downsample(_t(spark, sf_dir, "events"), k=50)


# The exact-integer LTTB recursion as one DuckDB recursive CTE (k = 50 →
# 48 interior buckets, last interior bucket anchors on the final point).
# `sel` carries (series, bucket, previously-selected point); each step
# joins the next bucket's candidate points with the precomputed
# next-bucket centroid sums and picks via min() over a struct — DuckDB
# compares structs lexicographically, so (−area², pos, …) is exactly the
# kernel's "largest area, ties to lowest index" rule, in HUGEINT.
_LTTB_PORTABLE_ORACLE = """
WITH RECURSIVE
pts AS (
  SELECT event_type AS series,
         epoch_us(ts) AS x,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS yf,
         value AS y,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, value) - 1 AS pos,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
big AS (SELECT DISTINCT series, n FROM pts WHERE n > 50),
bkt AS (
  SELECT series, n, b,
         (b * (n - 2)) // 48 + 1 AS lo,
         ((b + 1) * (n - 2)) // 48 + 1 AS hi
  FROM big CROSS JOIN (SELECT unnest(range(48)) AS b) t),
nxt AS (
  SELECT bk.series, bk.b,
         CAST(count(*) AS HUGEINT) AS cnt,
         CAST(sum(p.x) AS HUGEINT) AS sx,
         CAST(sum(p.yf) AS HUGEINT) AS sy
  FROM bkt bk
  JOIN bkt bk2 ON bk2.series = bk.series AND bk2.b = bk.b + 1
  JOIN pts p ON p.series = bk.series AND p.pos >= bk2.lo AND p.pos < bk2.hi
  WHERE bk.b < 47
  GROUP BY 1, 2
  UNION ALL
  SELECT p.series, 47, CAST(1 AS HUGEINT), CAST(p.x AS HUGEINT), CAST(p.yf AS HUGEINT)
  FROM pts p JOIN big USING (series) WHERE p.pos = big.n - 1),
sel AS (
  SELECT series, CAST(-1 AS BIGINT) AS b, pos, x AS px, yf AS pyf
  FROM pts WHERE pos = 0 AND n > 50
  UNION ALL
  SELECT u.series, u.b, u.pick.p AS pos, u.pick.x AS px, u.pick.yf AS pyf FROM (
    SELECT s.series, s.b + 1 AS b,
           min(struct_pack(
                 na := -abs((CAST(s.px AS HUGEINT) * nx.cnt - nx.sx) * (p.yf - s.pyf)
                            - CAST(s.px - p.x AS HUGEINT)
                              * (nx.sy - CAST(s.pyf AS HUGEINT) * nx.cnt)),
                 p := p.pos, x := p.x, yf := p.yf)) AS pick
    FROM sel s
    JOIN bkt bk ON bk.series = s.series AND bk.b = s.b + 1
    JOIN nxt nx ON nx.series = s.series AND nx.b = s.b + 1
    JOIN pts p ON p.series = s.series AND p.pos >= bk.lo AND p.pos < bk.hi
    GROUP BY s.series, s.b
  ) u),
all_sel AS (
  SELECT series, pos FROM sel
  UNION ALL
  SELECT series, n - 1 FROM big
  UNION ALL
  SELECT series, pos FROM pts WHERE n <= 50)
SELECT p.series, p.pos, p.x AS x_us, p.y
FROM all_sel a JOIN pts p ON p.series = a.series AND p.pos = a.pos
"""


@query("ts_downsample_lttb_portable", _LTTB_PORTABLE_ORACLE)
def q_ts_downsample_lttb_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling with a HARD oracle over the greedy recursion —
    the query this pack long claimed impossible ('sequential/greedy ⇒ no
    SQL twin'). The twin quantizes to integers (x = epoch µs, y = 1e-6
    fixed point) and multiplies the centroid division out of the
    triangle-area comparison, so the whole selection is exact integer
    arithmetic; a DuckDB RECURSIVE CTE then replays the per-bucket
    argmax chain in HUGEINT and the driver hash-compares the selected
    points. Proves bucket boundaries, the next-bucket centroid
    (including the last-bucket → final-point anchor edge case), the
    area formula, and the ties-to-lowest-index rule — everything the
    production kernel's monotonicity/membership tests could only
    sample. Production (`ts_downsample_lttb`) keeps the float numpy
    kernel; this is its verification variant (same single groupBy
    exchange, k rows per series)."""
    from .operators.timeseries import lttb_downsample_portable

    return lttb_downsample_portable(_t(spark, sf_dir, "events"), k=50)


@query(
    "funnel_conversion",
    """WITH s1 AS (
         SELECT user_id, min(ts) AS t1 FROM events
         WHERE event_type = 'view' GROUP BY user_id
       ), s2 AS (
         SELECT e.user_id, min(e.ts) AS t2
         FROM events e JOIN s1 USING (user_id)
         WHERE e.event_type = 'click' AND e.ts >= s1.t1
         GROUP BY e.user_id
       ), s3 AS (
         SELECT e.user_id, min(e.ts) AS t3
         FROM events e JOIN s2 USING (user_id)
         WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
         GROUP BY e.user_id
       )
       SELECT * FROM (
         SELECT 'view' AS step, CAST(1 AS BIGINT) AS step_no,
                CAST(count(*) AS BIGINT) AS users FROM s1
         UNION ALL
         SELECT 'click', CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM s2
         UNION ALL
         SELECT 'purchase', CAST(3 AS BIGINT), CAST(count(*) AS BIGINT) FROM s3
       ) t""",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): a user counts
    for step k only with an event at or after their step-(k-1) time —
    the event-sequence rollup product analytics runs on clickstreams.
    Spark-first: ONE user-keyed window pass computes all three stage
    times as chained conditional mins (t2 = first click ≥ t1, t3 =
    first purchase ≥ t2) over the same partition spec, so the fact
    scans ONCE with the three-type IN-filter pushed to parquet and
    shuffles ONCE on user_id; the three window mins, the per-user
    collapse, and the final step counts all reuse that partitioning
    (the r5 staged form scanned the fact three times and planned 8
    exchanges for identical semantics). Per-user state is three
    timestamps; the step rows come from one stack() over a single
    totals row."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    totals = (
        staged.groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
        .agg(
            F.count("t1").alias("n1"),
            F.count("t2").alias("n2"),
            F.count("t3").alias("n3"),
        )
    )
    return totals.select(
        F.expr(
            "stack(3, 'view', CAST(1 AS BIGINT), CAST(n1 AS BIGINT),"
            " 'click', CAST(2 AS BIGINT), CAST(n2 AS BIGINT),"
            " 'purchase', CAST(3 AS BIGINT), CAST(n3 AS BIGINT))"
            " AS (step, step_no, users)"
        )
    )


@query(
    "events_sessionize",
    """WITH g AS (
         SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS brk
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), s AS (
         SELECT user_id, event_id, ts,
                sum(brk) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
         FROM g
       )
       SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
       FROM s GROUP BY user_id, session_no""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gap rule (>30 min silence starts a new
    session) every product-analytics pipeline applies before funnels and
    retention. Lag + running sum inside ONE user-partitioned window (the
    partition key is the natural shard at 100 TB — no global ordering
    anywhere), then a (user, session) partial agg. Durations compared as
    exact epoch-microsecond integers (second-level truncation is lossy
    on a sub-second event stream)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0)
    )
    s = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_no"),
    )
    return s.groupBy("user_id", F.col("session_no").cast("long").alias("session_no")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("long")
        .alias("duration_us"),
    )


@query(
    "ts_ses_smooth",
    """WITH RECURSIVE daily AS (
         SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS x
         FROM events GROUP BY 1, 2
       ), o AS (
         SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
         FROM daily
       ), r AS (
         SELECT event_type, day, x, rn, CAST(x AS DOUBLE) AS s
         FROM o WHERE rn = 1
         UNION ALL
         SELECT o.event_type, o.day, o.x, o.rn,
                0.5 * CAST(o.x AS DOUBLE) + 0.5 * r.s
         FROM o JOIN r ON o.event_type = r.event_type AND o.rn = r.rn + 1
       )
       SELECT event_type, day, x, CAST(round(s * 1e6) AS BIGINT) AS level_micro
       FROM r""",
)
def q_ts_ses_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential smoothing (SES, alpha = 0.5) over per-type daily event
    counts — the forecasting baseline a monitoring pipeline keeps per
    series. alpha = 0.5 is EXACT in binary, and both engines evaluate the
    identical op sequence (0.5·x + 0.5·s, each IEEE-correctly-rounded),
    so the smoothed level is bit-identical and the recursion itself is
    hash-checked (DuckDB replays it as a RECURSIVE CTE; same playbook as
    the LTTB twin). Per-series sequential state runs in ONE
    applyInPandas over the (tiny) per-day aggregate — the corpus-scale
    work is the daily partial agg, and series key = shuffle key."""
    import math

    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        s = None
        out = []
        for x in pdf["x"]:
            xv = float(x)
            s = xv if s is None else 0.5 * xv + 0.5 * s
            # exact half-away round of the (always-positive) level:
            # v - floor(v) is FP-exact for v < 2^52, so the .5 compare
            # never misrounds (floor(v + 0.5) can, when v+0.5 rounds up)
            v = s * 1e6
            fl = math.floor(v)
            out.append(int(fl + 1 if v - fl >= 0.5 else fl))
        pdf["level_micro"] = out
        return pdf

    return daily.groupBy("event_type").applyInPandas(
        smooth, "event_type string, day date, x long, level_micro long"
    )


@query(
    "ts_mad_outliers",
    """WITH v AS (
         SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
         FROM events),
       med AS (
         SELECT event_type, CAST(2 * quantile_cont(vc, 0.5) AS BIGINT) AS m2
         FROM v GROUP BY event_type),
       dev AS (
         SELECT v.event_type, m2, abs(2 * vc - m2) AS d
         FROM v JOIN med USING (event_type)),
       mad AS (
         SELECT event_type, CAST(2 * quantile_cont(d, 0.5) AS BIGINT) AS mad2
         FROM dev GROUP BY event_type)
       SELECT dev.event_type,
              CAST(count(*) AS BIGINT) AS n,
              min(dev.m2) AS med_cent2,
              min(mad.mad2) AS mad_cent2,
              CAST(sum(CASE WHEN 2 * dev.d > 3 * mad.mad2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_outliers
       FROM dev JOIN mad USING (event_type)
       GROUP BY dev.event_type""",
)
def q_ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event_type: median / MAD (median
    absolute deviation) instead of mean / stddev — the estimator that
    does not let the outliers it is hunting inflate its own threshold
    (z-scores famously mask single huge spikes). Flags |v − median| >
    3·MAD.

    Exactness: values are 2-dp, so everything runs on cent integers;
    medians are ORDER STATISTICS (no accumulation order hazard), and
    the only interpolation — the even-count midpoint — is kept exact by
    carrying 2×median (always an integer in cents). The flag compares
    2·d > 3·mad2 (d = 2|v−med|, mad2 = 4·MAD — exactly |v−med| >
    3·MAD), integers on both sides: no float enters any comparison, so
    the oracle is hash-exact by construction.

    Scale shape: ONE event_type exchange — both medians evaluate as
    unbounded windows over the SAME partitioning the final groupBy
    reuses, so the fact projection shuffles once (a groupBy-per-stat
    formulation re-plans the median subtree per consumer: 4 exchanges).
    Exact `percentile` buffers each group and is the oracle baseline —
    at 100 TB swap the medians for `approx_percentile` (mergeable
    t-digest partials), which drops the buffering; the comparisons are
    unchanged."""
    v = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    w = Window.partitionBy("event_type")
    dev = v.withColumn(
        "m2", (2 * F.expr("percentile(vc, 0.5)").over(w)).cast("long")
    ).withColumn("d", F.abs(2 * F.col("vc") - F.col("m2")))
    scored = dev.withColumn(
        "mad2", (2 * F.expr("percentile(d, 0.5)").over(w)).cast("long")
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("m2").alias("med_cent2"),
        F.min("mad2").alias("mad_cent2"),
        F.sum((2 * F.col("d") > 3 * F.col("mad2")).cast("long"))
        .cast("long")
        .alias("n_outliers"),
    )


@query(
    "lake_snapshot_diff",
    """WITH base AS (
         SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
         FROM orders),
       removed AS (
         SELECT o_orderkey, 'removed' AS change, price AS old_price,
                CAST(NULL AS DOUBLE) AS new_price
         FROM base WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0),
       changed AS (
         SELECT o_orderkey, 'changed' AS change, price AS old_price,
                round(round(price * 1.1 * 100) / 100, 2) AS new_price
         FROM base
         WHERE o_orderstatus = 'O' AND o_orderkey % 11 = 0
           AND round(round(price * 1.1 * 100) / 100, 2) <> price),
       added AS (
         SELECT o_orderkey + 1000000000000 AS o_orderkey, 'added' AS change,
                CAST(NULL AS DOUBLE) AS old_price, price AS new_price
         FROM base WHERE o_orderkey % 13 = 0)
       SELECT * FROM removed UNION ALL SELECT * FROM changed
       UNION ALL SELECT * FROM added""",
)
def q_lake_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot DIFF between two versions of a logged table — the audit
    query behind every "what changed since yesterday's load?" question
    (and the generalization of CDC: the lake's own history IS the change
    feed). Orders land as v0; a DELETE, an UPDATE (+10% on a slice of
    open orders), and an APPEND advance the table; the diff FULL-OUTER
    joins v0 against latest on the key and classifies each row as
    added / removed / changed (same-key same-value rows drop out).

    The oracle derives the identical change set from the raw table and
    the three DML predicates (appended keys offset by 1e12 — past the
    keyspace of any real SF, so synthetic adds can never collide with
    live orderkeys and fan the full-outer join out; r8 review finding),
    so a hash match proves version isolation,
    every DML path, AND the diff classifier in one row. Money math per
    the repo contract: round(x·100)/100, never round(x, 2), for the
    updated prices.

    Scale shape: both sides scan file sets from the SAME log (shared
    lineage, disjoint only in rewritten files), the join is ONE
    key-keyed exchange pair, and the classifier is a codegen CASE. At
    100 TB the join cost is bounded by the rewritten-file fraction if
    the diff pre-prunes unchanged file identities via the log (noted in
    sources/txlog.py; exact-file diff is how production formats do it)."""
    from .sources.txlog import LakeTable

    base = _scratch_lake_dir("lake_diff_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )
    t = LakeTable(spark, base)
    t.create(orders.repartitionByRange(4, "o_orderkey"))
    t.delete_where("o_orderstatus = 'F' AND o_orderkey % 7 = 0")
    t.update_where(
        "o_orderstatus = 'O' AND o_orderkey % 11 = 0",
        {"price": "round(round(price * 1.1 * 100) / 100, 2)"},
    )
    t.append(
        orders.filter(F.col("o_orderkey") % 13 == 0).select(
            (F.col("o_orderkey") + 1000000000000).alias("o_orderkey"),
            "o_orderstatus",
            "price",
        )
    )
    v0 = t.scan(version=0).select(
        F.col("o_orderkey"), F.col("price").alias("old_price")
    )
    v1 = t.scan().select(F.col("o_orderkey"), F.col("price").alias("new_price"))
    joined = v0.join(v1, "o_orderkey", "full_outer")
    return joined.select(
        "o_orderkey",
        F.when(F.col("new_price").isNull(), F.lit("removed"))
        .when(F.col("old_price").isNull(), F.lit("added"))
        .otherwise(F.lit("changed"))
        .alias("change"),
        "old_price",
        "new_price",
    ).filter(
        F.col("old_price").isNull()
        | F.col("new_price").isNull()
        | (F.col("old_price") != F.col("new_price"))
    )


@query(
    "lake_cdf_scan",
    """WITH base AS (
         SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
         FROM orders),
       removed AS (
         SELECT o_orderkey, 'removed' AS change, price AS old_price,
                CAST(NULL AS DOUBLE) AS new_price
         FROM base WHERE o_orderstatus = 'F' AND o_orderkey % 5 = 0),
       changed AS (
         SELECT o_orderkey, 'changed' AS change, price AS old_price,
                round(round(price * 1.05 * 100) / 100, 2) AS new_price
         FROM base
         WHERE o_orderstatus = 'O' AND o_orderkey % 9 = 0
           AND round(round(price * 1.05 * 100) / 100, 2) <> price),
       added AS (
         SELECT -o_orderkey AS o_orderkey, 'added' AS change,
                CAST(NULL AS DOUBLE) AS old_price, price AS new_price
         FROM base WHERE o_orderkey % 17 = 0 AND o_orderkey <> 0)
       SELECT * FROM removed UNION ALL SELECT * FROM changed
       UNION ALL SELECT * FROM added""",
)
def q_lake_cdf_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change-data-feed between two table versions through the
    FILE-IDENTITY-PRUNED path (sources/txlog.py:version_changes — the
    100 TB shape lake_snapshot_diff's docstring promises): files shared
    by both snapshots hold bit-identical rows and are never scanned, so
    the diff cost is bounded by the REWRITTEN-file fraction, not 2x the
    table. Same DML surface as the full-scan diff (DELETE / UPDATE /
    APPEND on a logged orders copy; new keys minted as negated
    orderkeys — disjoint from the live keyspace at any SF), so the hash
    match proves the pruned implementation emits the identical change
    set the oracle reconstructs from the raw table. The pruning itself
    (shared files skipped, all four base files pruned in the
    single-rewrite case) is asserted in tests/test_txlog.py via the
    instance's last_cdf_files observability counters."""
    from .sources.txlog import LakeTable

    base = _scratch_lake_dir("lake_cdf_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )
    t = LakeTable(spark, base)
    t.create(orders.repartitionByRange(4, "o_orderkey"))
    t.delete_where("o_orderstatus = 'F' AND o_orderkey % 5 = 0")
    t.update_where(
        "o_orderstatus = 'O' AND o_orderkey % 9 = 0",
        {"price": "round(round(price * 1.05 * 100) / 100, 2)"},
    )
    t.append(
        orders.filter((F.col("o_orderkey") % 17 == 0) & (F.col("o_orderkey") != 0)).select(
            (-F.col("o_orderkey")).alias("o_orderkey"),
            "o_orderstatus",
            "price",
        )
    )
    return t.version_changes(0, None, ["o_orderkey"], ["price"]).select(
        "o_orderkey", "change", "old_price", "new_price"
    )


@query(
    "lake_zorder_optimize",
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
       FROM orders WHERE o_custkey < 200""",
)
def q_lake_zorder_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER BY on a LIVE logged table
    (sources/txlog.py:optimize_zorder): orders land fragmented (a
    create + an append, interleaved key ranges per file), one atomic
    commit re-clusters the live set on (o_custkey, o_totalprice), and
    the post-OPTIMIZE scan must return the IDENTICAL row set the oracle
    reads from the raw table — the rewrite is layout-only. The pruning
    payoff and time-travel invariants are asserted in tests/
    test_txlog.py (this hash row proves the rewrite loses/duplicates
    nothing; the plan payoff is file-level, invisible to row hashes)."""
    from .sources.txlog import LakeTable

    base = _scratch_lake_dir("lake_zopt_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
    )
    t = LakeTable(spark, base)
    t.create(orders.filter(F.col("o_orderkey") % 2 == 0).repartition(4))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1).repartition(4))
    t.optimize_zorder(["o_custkey", "price"], target_files=8)
    return t.scan(filters=[("o_custkey", "<", 200)])


@query(
    "lake_incremental_mv",
    """WITH base AS (
         SELECT o_orderkey, o_custkey,
                CAST(round(round(o_totalprice, 2) * 100) AS BIGINT) AS cents,
                o_orderstatus
         FROM orders),
       after AS (
         -- the same DML algebra the lake applies: DELETE, UPDATE, APPEND
         SELECT o_orderkey, o_custkey,
                CASE WHEN o_orderstatus = 'O' AND o_orderkey % 9 = 0
                     THEN CAST((cents * 105 + 50) // 100 AS BIGINT)
                     ELSE cents END AS cents
         FROM base
         WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
         UNION ALL
         SELECT -o_orderkey, o_custkey, cents
         FROM base WHERE o_orderkey % 17 = 0 AND o_orderkey <> 0)
       SELECT o_custkey,
              CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(cents) AS BIGINT) AS sum_cents
       FROM after GROUP BY o_custkey""",
)
def q_lake_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance driven by the table's
    OWN change feed — the full at-scale ETL loop composed from three
    r12 pieces: the summary is built once at v0, the table advances
    through DELETE/UPDATE/APPEND, and the refresh consumes ONLY
    version_changes(v0, latest) (file-identity-pruned CDF) as SIGNED
    deltas merged through incremental_agg_merge — removed/changed-old
    rows contribute (-1, -cents), added/changed-new rows (+1, +cents) —
    so the refresh cost is bounded by the churn, never the table. The
    oracle recomputes the post-DML summary from the raw table, so the
    hash match proves delta algebra == full recompute. Measures are
    exact integer cents (order-free sums; a double SUM here would be
    accumulation-order nondeterministic cross-engine). Groups whose
    count reaches 0 drop (integer cents guarantee their sum is exactly
    0 too)."""
    from .operators.aggregations import incremental_agg_merge
    from .sources.txlog import LakeTable

    base = _scratch_lake_dir("lake_imv_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.round("o_totalprice", 2) * 100).cast("long").alias("cents"),
        "o_orderstatus",
    )
    t = LakeTable(spark, base)
    t.create(orders.repartitionByRange(4, "o_orderkey"))
    t.delete_where("o_orderstatus = 'F' AND o_orderkey % 5 = 0")
    t.update_where(
        "o_orderstatus = 'O' AND o_orderkey % 9 = 0",
        # +5% half-up on the integer cents grid — PURE int64 arithmetic
        # ((cents*105 + 50) div 100): the first draft chained double
        # rounds (cents/100*1.05 -> round(,2) -> *100) and flipped one
        # cent vs DuckDB at a within-ulp boundary at sf0.1 — the exact
        # FLOATS.md class; prices are positive so half-up == the div
        {"cents": "cast((cents * 105 + 50) div 100 as bigint)"},
    )
    t.append(
        orders.filter((F.col("o_orderkey") % 17 == 0) & (F.col("o_orderkey") != 0)).select(
            (-F.col("o_orderkey")).alias("o_orderkey"),
            "o_custkey",
            "cents",
            "o_orderstatus",
        )
    )
    summary0 = (
        t.scan(version=0)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    ch = t.version_changes(0, None, ["o_orderkey"], ["o_custkey", "cents"])
    minus = ch.filter(F.col("change").isin("removed", "changed")).select(
        F.col("old_o_custkey").alias("o_custkey"),
        F.lit(-1).cast("long").alias("n_orders"),
        (-F.col("old_cents")).cast("long").alias("sum_cents"),
    )
    plus = ch.filter(F.col("change").isin("added", "changed")).select(
        F.col("new_o_custkey").alias("o_custkey"),
        F.lit(1).cast("long").alias("n_orders"),
        F.col("new_cents").cast("long").alias("sum_cents"),
    )
    deltas = minus.unionByName(plus)
    merged = incremental_agg_merge(summary0, deltas, ["o_custkey"])
    return merged.filter(F.col("n_orders") > 0).select(
        "o_custkey", "n_orders", "sum_cents"
    )


@query(
    "graph_pagerank_events",
    """WITH ev AS (
         SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
                'e:' || event_type AS e
         FROM events),
       edges AS (
         SELECT u AS src, e AS dst FROM ev
         UNION ALL SELECT e AS src, u AS dst FROM ev),
       deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
               FROM edges GROUP BY src),
       p0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS score FROM deg),
       p1 AS (SELECT e.dst AS node,
                     CAST(150000000 + (85 * sum(p.score // d.deg)) // 100 AS BIGINT) AS score
              FROM edges e JOIN deg d USING (src) JOIN p0 p ON p.node = e.src
              GROUP BY e.dst),
       p2 AS (SELECT e.dst AS node,
                     CAST(150000000 + (85 * sum(p.score // d.deg)) // 100 AS BIGINT) AS score
              FROM edges e JOIN deg d USING (src) JOIN p1 p ON p.node = e.src
              GROUP BY e.dst),
       p3 AS (SELECT e.dst AS node,
                     CAST(150000000 + (85 * sum(p.score // d.deg)) // 100 AS BIGINT) AS score
              FROM edges e JOIN deg d USING (src) JOIN p2 p ON p.node = e.src
              GROUP BY e.dst)
       SELECT node, score FROM p3 ORDER BY score DESC, node LIMIT 20""",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite user↔event-type interaction graph —
    the iterative-numeric workload class (power iteration) the engine
    must host for graph-shaped pipeline stages (entity importance,
    link-spam scoring over a crawl, dedup-cluster authority picks).
    3 unrolled rounds of operators/graph.py:pagerank_integer in 1e-9
    fixed point: because every arithmetic step is integer (floor-divided
    contributions, integer damping), the DuckDB twin unrolls the SAME
    three rounds CTE-for-CTE and the top-20 hash-matches exactly — an
    oracle float PageRank cannot have. Every node here has an in-edge
    (edges go both ways), so the general operator's dangling-node left
    join coalesces nothing away."""
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
            F.concat(F.lit("e:"), F.col("event_type")).alias("e"),
        )
        .distinct()
    )
    edges = ev.select(F.col("u").alias("src"), F.col("e").alias("dst")).unionAll(
        ev.select(F.col("e").alias("src"), F.col("u").alias("dst"))
    )
    pr = pagerank_integer(edges, iterations=3)
    return pr.orderBy(F.col("score").desc(), "node").limit(20)


@query(
    "nlp_bpe_merges",
    r"""WITH s0 AS (
         SELECT ' ' || replace(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                              ' ', '  ') || ' ' AS seg
         FROM documents),
       p1 AS (
         SELECT l[i] AS a, l[i+1] AS b, count(*) AS c FROM (
           SELECT string_split(trim(seg), '  ') AS l FROM s0) t,
           unnest(range(1, len(l))) AS u(i)
         GROUP BY 1, 2),
       b1 AS (SELECT a, b, c FROM p1 ORDER BY c DESC, a, b LIMIT 1),
       s1 AS (
         SELECT replace(seg, ' ' || b1.a || '  ' || b1.b || ' ',
                        ' ' || b1.a || '_' || b1.b || ' ') AS seg
         FROM s0 CROSS JOIN b1),
       p2 AS (
         SELECT l[i] AS a, l[i+1] AS b, count(*) AS c FROM (
           SELECT string_split(trim(seg), '  ') AS l FROM s1) t,
           unnest(range(1, len(l))) AS u(i)
         GROUP BY 1, 2),
       b2 AS (SELECT a, b, c FROM p2 ORDER BY c DESC, a, b LIMIT 1),
       s2 AS (
         SELECT replace(seg, ' ' || b2.a || '  ' || b2.b || ' ',
                        ' ' || b2.a || '_' || b2.b || ' ') AS seg
         FROM s1 CROSS JOIN b2),
       p3 AS (
         SELECT l[i] AS a, l[i+1] AS b, count(*) AS c FROM (
           SELECT string_split(trim(seg), '  ') AS l FROM s2) t,
           unnest(range(1, len(l))) AS u(i)
         GROUP BY 1, 2),
       b3 AS (SELECT a, b, c FROM p3 ORDER BY c DESC, a, b LIMIT 1)
       SELECT 1 AS round, a AS left_tok, b AS right_tok,
              a || '_' || b AS merged, CAST(c AS BIGINT) AS pair_count FROM b1
       UNION ALL SELECT 2, a, b, a || '_' || b, CAST(c AS BIGINT) FROM b2
       UNION ALL SELECT 3, a, b, a || '_' || b, CAST(c AS BIGINT) FROM b3""",
)
def q_nlp_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge learning, 3 rounds (operators/text.py:
    phrase_merge_rounds): count adjacent token pairs → merge the global
    argmax → re-segment → repeat, so round 2 can build on round 1's
    unit — the vocabulary-induction loop subword tokenizers train with
    (`nlp_subword_tokenize` consumes such a vocab; this produces one).
    The double-space segmentation makes `replace` apply the exact
    leftmost-greedy BPE merge in BOTH engines, so the DuckDB twin
    replays all three rounds — counts, argmax tiebreaks, and
    re-segmentation — bit-for-bit."""
    from .operators.text import phrase_merge_rounds

    return phrase_merge_rounds(_t(spark, sf_dir, "documents"), rounds=3)


_BPE_SEG0 = (
    r"' ' || replace(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),"
    r" ' ', '  ') || ' '"
)


def _bpe_count_cte(src: str) -> str:
    """Pair-count CTE body over a segmentation CTE ``src`` (DuckDB)."""
    return (
        f"SELECT l[i] AS a, l[i+1] AS b, count(*) AS c FROM ("
        f" SELECT string_split(trim(seg), '  ') AS l FROM {src}) t,"
        f" unnest(range(1, len(l))) AS u(i) GROUP BY 1, 2"
    )


# One pass's k merges applied sequentially in rank order: each list
# element is "a<TAB>b" (tab can never appear in a token — the
# segmentation collapsed all whitespace), and the reduce derives the
# double-space pattern / underscore replacement from it per step. This
# replaces the k-nested-replace form, whose expression tree blows
# DuckDB's 1000-node logical-planner depth cap at real-vocab k.
_BPE_REDUCE_LAMBDA = (
    "(acc, x) -> replace(acc, ' ' || replace(x, chr(9), '  ') || ' ',"
    " ' ' || replace(x, chr(9), '_') || ' ')"
)


def _bpe_trainer_ctes(passes: int, k: int) -> str:
    """The shared WITH-prefix of the batched-BPE oracles: per pass, a
    pair-count CTE, a MATERIALIZED top-k rank cut (materialized because
    the segmentation step and the consuming tail reference it —
    re-inlining would re-run the corpus count), and a re-segmentation
    CTE applying the k merges via ONE ``list_reduce`` over the
    rank-ordered merge list (constant expression depth at any k;
    ``list_prepend`` seeds the fold with the segmentation itself, and
    an empty/NULL merge list coalesces to [] so a dried-up pass is a
    no-op, exactly like the Spark trainer applying only the merges it
    found)."""
    parts = [f"WITH s0 AS (SELECT {_BPE_SEG0} AS seg FROM documents)"]
    for p in range(1, passes + 1):
        parts.append(f", p{p} AS ({_bpe_count_cte(f's{p-1}')})")
        parts.append(
            f", b{p} AS MATERIALIZED (SELECT a, b, c,"
            f" row_number() OVER (ORDER BY c DESC, a, b) AS rk"
            f" FROM p{p} QUALIFY rk <= {k})"
        )
        if p < passes:
            parts.append(
                f", s{p} AS (SELECT list_reduce(list_prepend(seg,"
                f" coalesce((SELECT list(a || chr(9) || b ORDER BY rk)"
                f" FROM b{p}), [])), {_BPE_REDUCE_LAMBDA}) AS seg"
                f" FROM s{p-1})"
            )
    return "".join(parts)


def _bpe_batched_oracle_sql(passes: int, k: int) -> str:
    """Generate the unrolled DuckDB twin of ``phrase_merge_rounds_batched``
    for any (passes, k) — the shared trainer CTEs plus the merge-table
    union tail. Hand-written 2×3 form above verified equal to this
    generator's output before the generator became the real-vocab
    path."""
    selects = [
        f"SELECT CAST({p} AS INTEGER) AS pass_no,"
        f" CAST(rk AS INTEGER) AS merge_rank,"
        f" a AS left_tok, b AS right_tok, a || '_' || b AS merged,"
        f" CAST(c AS BIGINT) AS pair_count FROM b{p}"
        for p in range(1, passes + 1)
    ]
    return _bpe_trainer_ctes(passes, k) + " " + " UNION ALL ".join(selects)


def _bpe_apply_usage_oracle_sql(passes: int, k: int) -> str:
    """Twin of the learned-vocab APPLY: replay the full (passes × k)
    trainer, flatten the learned merge table into ONE rank-ordered list
    (pass-major, rank-minor — the order the trainer learned and the
    projection must replay), re-segment every document through it with
    the same constant-depth ``list_reduce``, and aggregate per merged
    unit's corpus usage. The apply is one corpus pass regardless of
    vocab size — the merge list is data, not expression tree."""
    mlist_arms = " UNION ALL ".join(
        f"SELECT {p} AS p, rk, a || chr(9) || b AS m FROM b{p}"
        for p in range(1, passes + 1)
    )
    return (
        _bpe_trainer_ctes(passes, k)
        + f""", mlist AS MATERIALIZED (
           SELECT list(m ORDER BY p, rk) AS ms FROM ({mlist_arms})),
       sd AS (SELECT doc_id, list_reduce(list_prepend({_BPE_SEG0},
                coalesce((SELECT ms FROM mlist), [])),
                {_BPE_REDUCE_LAMBDA}) AS seg
              FROM documents),
       t AS (SELECT doc_id, unnest(string_split(trim(seg), '  ')) AS token
             FROM sd)
       SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_occurrences
       FROM t WHERE contains(token, '_') GROUP BY token"""
    )


@query(
    "nlp_bpe_merges_batched",
    f"""WITH s0 AS (SELECT {_BPE_SEG0} AS seg FROM documents),
       p1 AS ({_bpe_count_cte('s0')}),
       b1 AS (SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
              FROM p1 QUALIFY rk <= 3),
       m11 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 1),
       m12 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 2),
       m13 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 3),
       s1 AS (
         SELECT replace(replace(replace(seg,
             coalesce(' ' || m11.a || '  ' || m11.b || ' ', chr(10)), coalesce(' ' || m11.a || '_' || m11.b || ' ', chr(10))),
             coalesce(' ' || m12.a || '  ' || m12.b || ' ', chr(10)), coalesce(' ' || m12.a || '_' || m12.b || ' ', chr(10))),
             coalesce(' ' || m13.a || '  ' || m13.b || ' ', chr(10)), coalesce(' ' || m13.a || '_' || m13.b || ' ', chr(10)))
             AS seg
         FROM s0 CROSS JOIN m11 CROSS JOIN m12 CROSS JOIN m13),
       p2 AS ({_bpe_count_cte('s1')}),
       b2 AS (SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
              FROM p2 QUALIFY rk <= 3)
       SELECT CAST(1 AS INTEGER) AS pass_no, CAST(rk AS INTEGER) AS merge_rank,
              a AS left_tok, b AS right_tok, a || '_' || b AS merged,
              CAST(c AS BIGINT) AS pair_count FROM b1
       UNION ALL
       SELECT CAST(2 AS INTEGER), CAST(rk AS INTEGER), a, b, a || '_' || b,
              CAST(c AS BIGINT) FROM b2""",
)
def q_nlp_bpe_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BPE merge learning, 2 count passes × 3 merges per pass
    (operators/text.py:phrase_merge_rounds_batched) — the production
    trainer shape: a 32k-vocab induction costs vocab/k corpus scans
    instead of vocab (the single-merge `nlp_bpe_merges` is the
    textbook-exact twin; its r8 verdict flagged 1-merge-per-pass as the
    real-vocab gap). The batch applies its k merges sequentially in
    rank order as ONE chained-replace projection, so the DuckDB twin
    replays both passes — counts, the rank-3 cut, the chained
    re-segmentation — bit-for-bit, including the stale-count semantics
    (ranks 2-3 were counted before rank 1 applied). The twin is TOTAL on
    degenerate corpora: each merge CTE aggregates to exactly one row
    (NULLs when a pass yields < 3 pairs) and its replace pattern
    coalesces to chr(10) — unmatchable, since the segmentation collapsed
    all whitespace — so a missing rank is a no-op, exactly like the
    Spark trainer applying only the merges it found."""
    from .operators.text import phrase_merge_rounds_batched

    return phrase_merge_rounds_batched(
        _t(spark, sf_dir, "documents"), passes=2, merges_per_pass=3
    )


@query("nlp_bpe_vocab_16x64", _bpe_batched_oracle_sql(passes=16, k=64))
def q_nlp_bpe_vocab_16x64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-vocab BPE induction, 16 count passes × 64 merges per pass =
    1024 learned merges (operators/text.py:phrase_merge_rounds_batched)
    — the r9 probe's production-vocab demonstration promoted to a
    hash-oracled query. 1024 merges is the regime where the batched
    economics actually bind: the r8 single-merge trainer would cost
    1024 corpus count passes (~2.9 s/merge measured — a 32k vocab
    ≈ 26 h); this shape costs 16 (~0.04 s/merge — 32k ≈ 21 min at
    100×), and later passes genuinely compound (124 of the 1024 merges
    build on earlier merged units at 100×). The DuckDB twin replays all
    16 passes — counts, rank-64 cuts, chained re-segmentations —
    bit-for-bit via the generated ``list_reduce`` form
    (_bpe_batched_oracle_sql; the nested-replace form exceeds DuckDB's
    planner depth cap at k=64). Cost shape measured at sf0.001/sf0.01:
    ~41 s Spark-side at BOTH — per-pass plan-compile dominates below
    ~1M docs, the corpus term takes over above (SCALE.md §6b-r10).
    Verification-tier in the bench: the demonstration run's cost is the
    trainer's point, not a serving-path latency. memo=True: the 1024
    learned merges are driver-local rows, cached per (input plan,
    params) for the session — nlp_bpe_apply_16x64 replays them instead
    of re-training the identical vocab (r11 verdict #2: the bench spent
    56 s + 50 s deriving the same merge table twice)."""
    from .operators.text import phrase_merge_rounds_batched

    return phrase_merge_rounds_batched(
        _t(spark, sf_dir, "documents"), passes=16, merges_per_pass=64, memo=True
    )


@query(
    "nlp_bpe_apply",
    f"""WITH s0 AS (SELECT doc_id, {_BPE_SEG0} AS seg FROM documents),
       p1 AS ({_bpe_count_cte('s0')}),
       b1 AS (SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
              FROM p1 QUALIFY rk <= 3),
       m11 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 1),
       m12 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 2),
       m13 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 3),
       s1 AS (
         SELECT doc_id, replace(replace(replace(seg,
             coalesce(' ' || m11.a || '  ' || m11.b || ' ', chr(10)), coalesce(' ' || m11.a || '_' || m11.b || ' ', chr(10))),
             coalesce(' ' || m12.a || '  ' || m12.b || ' ', chr(10)), coalesce(' ' || m12.a || '_' || m12.b || ' ', chr(10))),
             coalesce(' ' || m13.a || '  ' || m13.b || ' ', chr(10)), coalesce(' ' || m13.a || '_' || m13.b || ' ', chr(10)))
             AS seg
         FROM s0 CROSS JOIN m11 CROSS JOIN m12 CROSS JOIN m13),
       p2 AS ({_bpe_count_cte('s1')}),
       b2 AS (SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
              FROM p2 QUALIFY rk <= 3),
       m21 AS (SELECT max(a) AS a, max(b) AS b FROM b2 WHERE rk = 1),
       m22 AS (SELECT max(a) AS a, max(b) AS b FROM b2 WHERE rk = 2),
       m23 AS (SELECT max(a) AS a, max(b) AS b FROM b2 WHERE rk = 3),
       s2 AS (
         SELECT doc_id, replace(replace(replace(seg,
             coalesce(' ' || m21.a || '  ' || m21.b || ' ', chr(10)), coalesce(' ' || m21.a || '_' || m21.b || ' ', chr(10))),
             coalesce(' ' || m22.a || '  ' || m22.b || ' ', chr(10)), coalesce(' ' || m22.a || '_' || m22.b || ' ', chr(10))),
             coalesce(' ' || m23.a || '  ' || m23.b || ' ', chr(10)), coalesce(' ' || m23.a || '_' || m23.b || ' ', chr(10)))
             AS seg
         FROM s1 CROSS JOIN m21 CROSS JOIN m22 CROSS JOIN m23),
       t AS (SELECT doc_id, unnest(string_split(trim(seg), '  ')) AS token FROM s2)
       SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_occurrences
       FROM t WHERE contains(token, '_') GROUP BY token""",
)
def q_nlp_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary learned end-to-end AND applied back to the corpus:
    train 6 merges with the batched trainer (2 passes × 3), re-segment
    every document through the full learned merge sequence in
    (pass, rank) order, and report each merged unit's corpus usage
    (document frequency + occurrences) — the learn→apply round trip a
    tokenizer deployment runs (the r8 verdict's "wire the learned vocab
    end to end" item). Chained pass-2 merges (units like a_b_c whose
    left side is itself a pass-1 merge) come out of the same replay.

    Scale shape: training is 2 corpus passes (batched trainer); the
    merge table rides to the driver as 6 rows (vocab-bounded, the
    codebook-collect class); application is ONE more corpus projection
    (6 chained replaces inside the scan stage) and the usage stats are
    one token-keyed partial agg. The DuckDB twin replays train AND
    apply bit-for-bit."""
    from .operators.dedup import _spread
    from .operators.text import _bpe_seg0, phrase_merge_rounds_batched

    docs = _t(spark, sf_dir, "documents")
    merges = sorted(
        phrase_merge_rounds_batched(docs, passes=2, merges_per_pass=3).collect(),
        key=lambda r: (r.pass_no, r.merge_rank),
    )
    seg = _bpe_seg0("text")
    for m in merges:
        seg = F.replace(
            seg, F.lit(f" {m.left_tok}  {m.right_tok} "), F.lit(f" {m.merged} ")
        )
    toks = F.split(F.trim(seg), "  ")
    return (
        # _spread: the apply projection is CPU-bound per row; an
        # under-split bench corpus would run it on one core (no-op on a
        # well-split scan)
        _spread(docs).select("doc_id", F.explode(toks).alias("token"))
        .filter(F.col("token").contains("_"))
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
    )


@query("nlp_bpe_apply_16x64", _bpe_apply_usage_oracle_sql(passes=16, k=64))
def q_nlp_bpe_apply_16x64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL-VOCAB learn→apply round trip: train the 16×64 = 1024-
    merge vocabulary (`nlp_bpe_vocab_16x64`'s trainer), apply the full
    learned merge sequence back to every document, and report each
    merged unit's corpus usage (document frequency + occurrences) —
    closing the r10 verdict's gap that `nlp_bpe_apply` only ever applied
    the 2×3 toy vocab.

    Scale shape — the point of this query: the APPLY stays ONE corpus
    pass at any vocab size, because the merge table is DATA, not
    expression tree. The 1024 merges ride to the driver as a
    vocab-bounded collect (the codebook class), are folded into a
    single constant array literal of (search, replace) structs, and
    F.aggregate replays them per document inside one projection —
    constant plan depth and constant analysis cost at k=1024 (the
    chained-F.replace form nlp_bpe_apply uses at k=6 would build a
    1024-deep expression tree that blows codegen and quadratic-analysis
    budgets; DuckDB's planner rejects the same shape past ~1000 nodes,
    which is why the twin uses list_reduce — the engines converged on
    the same design). Usage stats are one token-keyed partial agg.
    Verification-tier in the bench (the ~40 s trainer replay dominates;
    the apply projection itself is the serving path and is probed at
    100×/300× in SCALE.md §6b-r11)."""
    from .operators.text import _bpe_seg0, phrase_merge_rounds_batched

    docs = _t(spark, sf_dir, "documents")
    # memo=True: reuses the session-cached 1024-merge table when
    # nlp_bpe_vocab_16x64 already trained it on the same corpus plan —
    # one training run per bench/sweep session instead of two (r11
    # verdict #2)
    merges = sorted(
        phrase_merge_rounds_batched(
            docs, passes=16, merges_per_pass=64, memo=True
        ).collect(),
        key=lambda r: (r.pass_no, r.merge_rank),
    )
    seg = _bpe_seg0("text")
    if merges:
        # Arrow kernel (r15, guide §4.2): the merge table is driver-side
        # DATA, so the whole 1024-step replace chain runs as C-level
        # str.replace per batch row instead of the interpreted
        # F.aggregate(lit-table, seg, replace) fold (no codegen, ~9.5 s
        # of the timed run at sf0.1). Exact equivalence argued at
        # operators/text.py:chained_replace_kernel.
        from .operators.text import chained_replace_kernel

        apply_chain = chained_replace_kernel(
            [(f" {m.left_tok}  {m.right_tok} ", f" {m.merged} ") for m in merges]
        )
        seg = apply_chain(seg)
    toks = F.split(F.trim(seg), "  ")
    from .operators.dedup import _spread

    return (
        # _spread: the 1024-replace kernel is CPU-bound per row; an
        # under-split bench corpus would run it on one core (no-op on a
        # well-split scan)
        _spread(docs).select("doc_id", F.explode(toks).alias("token"))
        .filter(F.col("token").contains("_"))
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
    )


@query(
    "nlp_bpe_fertility",
    f"""WITH s0 AS (SELECT doc_id, {_BPE_SEG0} AS seg FROM documents),
       p1 AS ({_bpe_count_cte('s0')}),
       b1 AS (SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
              FROM p1 QUALIFY rk <= 3),
       m11 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 1),
       m12 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 2),
       m13 AS (SELECT max(a) AS a, max(b) AS b FROM b1 WHERE rk = 3),
       s1 AS (
         SELECT doc_id, replace(replace(replace(seg,
             coalesce(' ' || m11.a || '  ' || m11.b || ' ', chr(10)), coalesce(' ' || m11.a || '_' || m11.b || ' ', chr(10))),
             coalesce(' ' || m12.a || '  ' || m12.b || ' ', chr(10)), coalesce(' ' || m12.a || '_' || m12.b || ' ', chr(10))),
             coalesce(' ' || m13.a || '  ' || m13.b || ' ', chr(10)), coalesce(' ' || m13.a || '_' || m13.b || ' ', chr(10)))
             AS seg
         FROM s0 CROSS JOIN m11 CROSS JOIN m12 CROSS JOIN m13),
       p2 AS ({_bpe_count_cte('s1')}),
       b2 AS (SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
              FROM p2 QUALIFY rk <= 3),
       m21 AS (SELECT max(a) AS a, max(b) AS b FROM b2 WHERE rk = 1),
       m22 AS (SELECT max(a) AS a, max(b) AS b FROM b2 WHERE rk = 2),
       m23 AS (SELECT max(a) AS a, max(b) AS b FROM b2 WHERE rk = 3),
       s2 AS (
         SELECT doc_id, replace(replace(replace(seg,
             coalesce(' ' || m21.a || '  ' || m21.b || ' ', chr(10)), coalesce(' ' || m21.a || '_' || m21.b || ' ', chr(10))),
             coalesce(' ' || m22.a || '  ' || m22.b || ' ', chr(10)), coalesce(' ' || m22.a || '_' || m22.b || ' ', chr(10))),
             coalesce(' ' || m23.a || '  ' || m23.b || ' ', chr(10)), coalesce(' ' || m23.a || '_' || m23.b || ' ', chr(10)))
             AS seg
         FROM s1 CROSS JOIN m21 CROSS JOIN m22 CROSS JOIN m23),
       per AS (
         SELECT d.lang,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(string_split_regex(trim(lower(d.text)), '\\s+'))) AS BIGINT)
                    AS tokens_before,
                CAST(sum(len(string_split(trim(s2.seg), '  '))) AS BIGINT)
                    AS tokens_after
         FROM documents d JOIN s2 USING (doc_id) GROUP BY d.lang)
       SELECT lang, n_docs, tokens_before, tokens_after,
              (2000000 * (tokens_before - tokens_after) + tokens_before)
                  // (2 * tokens_before) AS saved_micro
       FROM per""",
)
def q_nlp_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility under the learned BPE vocab, per language:
    token counts before vs after applying the 6 learned merges, and the
    compression each language gets (saved_micro = exact integer micro
    ratio of tokens saved) — the "is this vocab fair to every language?"
    measurement a multilingual tokenizer deployment runs before
    committing a vocab (high-resource languages dominate merge learning;
    this quantifies who pays). Completes the learn→apply→measure loop on
    top of `nlp_bpe_merges_batched` / `nlp_bpe_apply`.

    Scale shape: training = 2 batched count passes (vocab-bounded 6-row
    collect); measurement is ONE more corpus projection (6 chained
    replaces + two size() counts inside the scan) and a |langs|-row
    partial agg. The compression ratio is a pure-integer micro
    (`micro_ratio` pattern) — no float anywhere in the output."""
    from .operators.dedup import _spread
    from .operators.text import _bpe_seg0, phrase_merge_rounds_batched, tokens

    docs = _t(spark, sf_dir, "documents")
    merges = sorted(
        phrase_merge_rounds_batched(docs, passes=2, merges_per_pass=3).collect(),
        key=lambda r: (r.pass_no, r.merge_rank),
    )
    seg = _bpe_seg0("text")
    for m in merges:
        seg = F.replace(
            seg, F.lit(f" {m.left_tok}  {m.right_tok} "), F.lit(f" {m.merged} ")
        )
    per = (
        # _spread: per-row replace chain + two size() counts — same
        # under-split rationale as nlp_bpe_apply
        _spread(docs).select(
            "lang",
            F.size(tokens("text")).cast("long").alias("tb"),
            F.size(F.split(F.trim(seg), "  ")).cast("long").alias("ta"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tb").cast("long").alias("tokens_before"),
            F.sum("ta").cast("long").alias("tokens_after"),
        )
    )
    # exact int64 `div` on the NAMED aggregate columns. This inline form
    # predates the r10 micro_ratio fix: the helper ALSO routes through
    # integral `div` now (exact to int64 — the old double-trick 2^53
    # window is gone), so the two are equivalent; the inline expr stays
    # only because swapping it would churn a driver-green shape for no
    # value change — fold into micro_ratio(saved, tokens_before) the
    # next time this query's shape changes anyway.
    return per.select(
        "lang",
        "n_docs",
        "tokens_before",
        "tokens_after",
        F.expr(
            "(2000000 * (tokens_before - tokens_after) + tokens_before)"
            " div (2 * tokens_before)"
        )
        .cast("long")
        .alias("saved_micro"),
    )


@query(
    "events_path_mining",
    """WITH seq AS (
         SELECT user_id, event_type,
                lead(event_type, 1) OVER w AS e2,
                lead(event_type, 2) OVER w AS e3
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT event_type || '>' || e2 || '>' || e3 AS path,
              CAST(count(*) AS BIGINT) AS n
       FROM seq WHERE e3 IS NOT NULL
       GROUP BY 1 ORDER BY n DESC, path LIMIT 20""",
)
def q_events_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys — sequential pattern mining over
    the event stream, the product-analytics query behind "what do users
    do next?" funnels (`events_transition_matrix` is its 1-step marginal;
    paths expose the higher-order structure a Markov assumption erases).
    ONE user-keyed window (two leads share the frame and its sort) feeds
    a path-keyed partial agg and a TakeOrdered; ties at the cut are
    path-lexicographic so the top-k is deterministic. The window key is
    the natural shard at 100 TB (user histories co-reside); hot paths
    combine map-side."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Distributed quality-classifier training (operators/classify.py)


def _perceptron_ctes(
    iterations: int = 3,
    buckets: int = 64,
    label_sql: str = "CASE WHEN lang = 'en' THEN 1 ELSE -1 END",
) -> str:
    """DuckDB twin of ``train_perceptron``: hashed-feature derivation +
    the FULL training loop unrolled CTE-per-iteration (the batched-BPE
    oracle technique). Every sum is CAST back to BIGINT (DuckDB returns
    HUGEINT, which pandas would materialize as float64 — the r10
    dtype-red class). Iteration 1 is the closed form of the zero-weight
    start: every document is misclassified, so w1 is the class-signed
    token-count sum."""
    head = f"""toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents),
    feats AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {buckets} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM toks WHERE tok <> '' GROUP BY 1, 2
      UNION ALL
      SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM documents),
    lab AS (SELECT doc_id, CAST({label_sql} AS BIGINT) AS y FROM documents),
    w1 AS (SELECT bucket, CAST(SUM(f.cnt * l.y) AS BIGINT) AS wt
           FROM feats f JOIN lab l USING (doc_id) GROUP BY bucket)"""
    parts = [head]
    for k in range(2, iterations + 1):
        parts.append(f"""m{k} AS (
      SELECT f.doc_id, CAST(SUM(f.cnt * w.wt) AS BIGINT) AS margin
      FROM feats f JOIN w{k - 1} w USING (bucket) GROUP BY f.doc_id),
    mis{k} AS (
      SELECT l.doc_id, l.y FROM lab l LEFT JOIN m{k} USING (doc_id)
      WHERE l.y * COALESCE(m{k}.margin, 0) <= 0),
    w{k} AS (
      SELECT COALESCE(w.bucket, u.bucket) AS bucket,
             CAST(COALESCE(w.wt, 0) + COALESCE(u.dw, 0) AS BIGINT) AS wt
      FROM w{k - 1} w FULL OUTER JOIN (
        SELECT bucket, CAST(SUM(f.cnt * m.y) AS BIGINT) AS dw
        FROM feats f JOIN mis{k} m USING (doc_id) GROUP BY bucket) u
      ON w.bucket = u.bucket)""")
    return "WITH " + ",\n".join(parts)


def _cls_label():  # Column construction needs an active session
    return F.when(F.col("lang") == "en", 1).otherwise(-1)


@query(
    "nlp_train_quality_classifier",
    _perceptron_ctes(3, 64)
    + "\nSELECT bucket, wt AS weight FROM w3 WHERE wt <> 0",
)
def q_nlp_train_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed linear quality-classifier TRAINING — the CCNet/GPT-3
    stage that learns to separate a target domain from raw web text and
    then gates the corpus (here: en vs non-en over hashed bag-of-words;
    the label column is the pluggable part). Full-batch perceptron in
    pure int64 (operators/classify.py:train_perceptron): counts,
    margins, and updates are exact integers, so the trained weights are
    independent of partition layout AND engine — the DuckDB twin
    replays all 3 training iterations bit-for-bit, making this the
    repo's third hash-oracled iterative-training class (after integer
    PageRank and the BPE trainer). Training runs eagerly at build (the
    BPE-trainer pattern); the returned frame is the ≤65-row nonzero
    weight table."""
    from .operators.classify import train_perceptron

    docs = _t(spark, sf_dir, "documents")
    w, _errors = train_perceptron(docs, _cls_label(), iterations=3, buckets=64, memo=True)
    return spark.createDataFrame(
        [(int(b), int(v)) for b, v in w], "bucket long, weight long"
    )


@query(
    "nlp_classifier_score",
    _perceptron_ctes(3, 64)
    + """
    , wf AS (SELECT * FROM w3 WHERE wt <> 0)
    SELECT d.doc_id, CAST(COALESCE(s.m, 0) AS BIGINT) AS margin,
           (COALESCE(s.m, 0) > 0) AS pred
    FROM documents d LEFT JOIN (
      SELECT f.doc_id, SUM(f.cnt * w.wt) AS m
      FROM feats f JOIN wf w USING (bucket) GROUP BY f.doc_id) s
    USING (doc_id)""",
)
def q_nlp_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scoring under the trained classifier
    (operators/classify.py:classifier_margins): every document's exact
    int64 margin + the keep/drop verdict — the apply half of the
    quality-gate pipeline. Total over ALL documents (a doc whose every
    bucket pruned to zero weight scores 0, not a dropped row). One
    broadcast of the ≤65-row weight table + one doc-keyed partial agg;
    at 100 TB the corpus scans once and nothing corpus-sized
    shuffles."""
    from .operators.classify import classifier_margins, train_perceptron

    docs = _t(spark, sf_dir, "documents")
    w, _errors = train_perceptron(docs, _cls_label(), iterations=3, buckets=64, memo=True)
    return classifier_margins(docs, w, buckets=64)


@query(
    "nlp_classifier_curve",
    _perceptron_ctes(3, 64)
    + """
    , wf AS (SELECT * FROM w3 WHERE wt <> 0),
    marg AS (
      SELECT d.doc_id, CAST(COALESCE(s.m, 0) AS BIGINT) AS margin
      FROM documents d LEFT JOIN (
        SELECT f.doc_id, SUM(f.cnt * w.wt) AS m
        FROM feats f JOIN wf w USING (bucket) GROUP BY f.doc_id) s
      USING (doc_id)),
    mm AS (SELECT min(margin) AS mn, max(margin) AS mx FROM marg),
    th AS (SELECT CAST(k AS BIGINT) AS k,
                  CAST(mn + ((mx - mn) * k) // 10 AS BIGINT) AS threshold
           FROM mm CROSS JOIN (SELECT unnest(range(1, 10)) AS k))
    SELECT t.k, t.threshold,
           CAST(SUM(CASE WHEN m.margin > t.threshold AND l.y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN m.margin > t.threshold AND l.y < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN m.margin <= t.threshold AND l.y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN m.margin <= t.threshold AND l.y < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM marg m JOIN lab l USING (doc_id) CROSS JOIN th t
    GROUP BY t.k, t.threshold""",
)
def q_nlp_classifier_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold operating curve for the trained quality gate
    (operators/classify.py:operating_curve): exact confusion counts at
    9 even-grid margin thresholds — the precision/recall trade a
    curation team reads before freezing the keep cut. One bounded
    min/max collect + ONE corpus pass computing all 36 conditional
    sums in a single aggregate row, unpivoted with ``stack`` — no
    global sort, no per-threshold rescan."""
    from .operators.classify import (
        classifier_margins,
        operating_curve,
        train_perceptron,
    )

    docs = _t(spark, sf_dir, "documents")
    w, _ = train_perceptron(docs, _cls_label(), iterations=3, buckets=64, memo=True)
    scored = classifier_margins(docs, w, buckets=64)
    labels = docs.select("doc_id", _cls_label().cast("long").alias("y"))
    return operating_curve(scored, labels, n_bins=10)


@query(
    "nlp_classifier_bias_audit",
    _perceptron_ctes(3, 64)
    + """
    , wf AS (SELECT * FROM w3 WHERE wt <> 0),
    marg AS (
      SELECT d.doc_id, d.lang, CAST(COALESCE(s.m, 0) AS BIGINT) AS margin
      FROM documents d LEFT JOIN (
        SELECT f.doc_id, SUM(f.cnt * w.wt) AS m
        FROM feats f JOIN wf w USING (bucket) GROUP BY f.doc_id) s
      USING (doc_id))
    SELECT m.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN m.margin > 0 AND l.y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN m.margin > 0 AND l.y < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN m.margin <= 0 AND l.y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN m.margin <= 0 AND l.y < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST((2000000 * (SUM(CASE WHEN m.margin > 0 AND l.y < 0 THEN 1 ELSE 0 END)
                           + SUM(CASE WHEN m.margin <= 0 AND l.y > 0 THEN 1 ELSE 0 END))
                 + count(*)) // (2 * count(*)) AS BIGINT) AS err_micro
    FROM marg m JOIN lab l USING (doc_id)
    GROUP BY m.lang""",
)
def q_nlp_classifier_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language audit of the trained quality gate
    (operators/classify.py:confusion_by_group) — the multilingual-
    fairness check before a classifier filters a corpus (does "quality"
    secretly mean "English"?): exact per-lang confusion counts + a 1e-6
    fixed-point error rate (micro_ratio, so even the rate column
    hash-checks). One group-keyed partial agg over the scored join."""
    from .operators.classify import (
        classifier_margins,
        confusion_by_group,
        train_perceptron,
    )

    docs = _t(spark, sf_dir, "documents")
    w, _ = train_perceptron(docs, _cls_label(), iterations=3, buckets=64, memo=True)
    scored = classifier_margins(docs, w, buckets=64)
    labeled = docs.select("doc_id", "lang", _cls_label().cast("long").alias("y"))
    return confusion_by_group(scored, labeled, "lang")


# ---------------------------------------------------------------------------
# Mergeable-sketch rollups (operators/sketches.py) — pre-aggregated
# distinct counts and frequency bounds, the 100 TB sketch-table pattern.
# ---------------------------------------------------------------------------


@query(
    "sketch_distinct_rollup",
    """SELECT event_type,
              CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
              CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events,
              TRUE AS users_est_ok,
              TRUE AS events_est_ok,
              TRUE AS merge_matches_direct
       FROM events WHERE event_type IS NOT NULL GROUP BY event_type""",
)
def q_sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count rollup FROM A SKETCH TABLE: build per-(event_type,
    day) HLL sketches of user_id and event_id (operators/sketches.py:
    hll_rollup — the table you'd persist once at 100 TB), then answer the
    per-event_type question by MERGING the daily sketches
    (hll_rollup_estimate) — never rescanning raw rows. The oracle pins
    the exact ground truth (n_days / n_rows / exact distincts roll up
    exactly); the sketch's own outputs ship as proof obligations the
    driver hash-checks: ``users_est_ok`` / ``events_est_ok`` bound the
    merged estimates within 5 % of exact (lgk=12 ⇒ rse ≈ 1.6 %, so 5 %
    is ≈3σ), ``merge_matches_direct`` pins the sketch ALGEBRA — merging
    30 daily sketches lands within 2 % of one direct whole-range sketch
    (register-wise max union; on most inputs they are byte-identical).
    All booleans are deterministic: DataSketches HLL state is a pure
    function of the value SET (register = max over hashes), so the
    estimate is partitioning- and order-invariant (pytest-asserted).

    Scale shape: two groupBys with native JVM sketch partials (the daily
    build shuffles one ~2 KB register block per cell; the merge shuffles
    cells, not rows) + one domain-sized broadcast join against the exact
    side — which exists here only because the oracle needs ground truth;
    production keeps just the sketch path. Reference has no sketch layer
    (nearest analog: full-scan COUNT DISTINCT in its SQL dialect);
    beyond-reference, same family as q_corpus_overlap_kmv's KMV."""
    from .operators.sketches import hll_rollup, hll_rollup_estimate

    # NULL event_type symmetry with the oracle's WHERE (end-of-round
    # review): both engines' GROUP BYs would keep a NULL group, but the
    # merged-vs-direct equi-join below would silently DROP Spark's
    # (NULL != NULL), so the row set must exclude it explicitly on both
    # sides. Latent on the shipped data (zero NULL event_type rows).
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = hll_rollup(
        ev,
        [F.col("event_type"), F.to_date("ts").alias("day")],
        {"user_hll": "user_id", "event_hll": "event_id"},
        lgk=12,
    )
    merged = hll_rollup_estimate(
        daily, ["event_type"], ["user_hll", "event_hll"]
    ).withColumnRenamed("n_cells", "n_days")
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
        .cast("long")
        .alias("users_direct"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.countDistinct("event_id").cast("long").alias("exact_events"),
    )

    def est_ok(est: str, exact: str):
        return F.abs(F.col(est) - F.col(exact)) <= F.greatest(
            F.col(exact) * F.lit(0.05), F.lit(2.0)
        )

    return merged.join(direct, "event_type").select(
        "event_type",
        "n_days",
        "n_rows",
        "exact_users",
        "exact_events",
        est_ok("user_hll_est", "exact_users").alias("users_est_ok"),
        est_ok("event_hll_est", "exact_events").alias("events_est_ok"),
        (
            F.abs(F.col("user_hll_est") - F.col("users_direct"))
            <= F.greatest(F.col("users_direct") * F.lit(0.02), F.lit(2.0))
        ).alias("merge_matches_direct"),
    )


@query(
    "sketch_freq_cms",
    """SELECT event_type,
              CAST(count(*) AS BIGINT) AS exact_n,
              TRUE AS cms_lower_ok,
              TRUE AS cms_upper_ok
       FROM events WHERE event_type IS NOT NULL GROUP BY event_type""",
)
def q_sketch_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency bounds over the event_type domain
    (operators/sketches.py:cms_frequency_bounds): ONE distributed native
    ``count_min_sketch`` aggregate (map-side cell merges; a ~112 KB
    serialized sketch reaches the driver), probed per value through
    Spark's public CountMinSketch Java API. The hash-checked outputs are
    the sketch's contractual guarantees — ``cms_lower_ok`` (estimates
    NEVER undercount; structural, not probabilistic) and
    ``cms_upper_ok`` (overcount ≤ ⌈ε·N⌉ at ε=0.001) — against exact
    counts the oracle also derives. Fixed seed ⇒ the sketch is a pure
    function of the multiset, partitioning-invariant (pytest).
    The raw cms_est column stays unregistered: DuckDB has no CMS, and
    the bound booleans are the engine-portable statement of its value."""
    from .operators.sketches import cms_frequency_bounds

    ev = _t(spark, sf_dir, "events")
    return cms_frequency_bounds(
        ev, "event_type", eps=0.001, confidence=0.99, seed=42
    ).select("event_type", "exact_n", "cms_lower_ok", "cms_upper_ok")


@query(
    "sketch_histogram_quantiles",
    """WITH v AS (
         SELECT event_type,
                CAST(floor(CAST(round(value * 100) AS BIGINT) / 250.0) AS BIGINT) AS bin
         FROM events WHERE event_type IS NOT NULL),
       m AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cnt
             FROM v GROUP BY 1, 2),
       c AS (SELECT event_type, bin, cnt,
                    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
                    sum(cnt) OVER (PARTITION BY event_type) AS total
             FROM m)
       SELECT event_type, CAST(min(total) AS BIGINT) AS n,
              CAST(min(CASE WHEN cum * 100 >= total * 50 THEN bin * 250 END) AS BIGINT) AS p50_lo,
              CAST(min(CASE WHEN cum * 100 >= total * 90 THEN bin * 250 END) AS BIGINT) AS p90_lo,
              CAST(min(CASE WHEN cum * 100 >= total * 99 THEN bin * 250 END) AS BIGINT) AS p99_lo
       FROM c GROUP BY event_type""",
)
def q_sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles FROM a mergeable histogram sketch table
    (operators/sketches.py:hist_rollup / hist_quantiles): per
    (event_type, day) exact bin counts of the cent-integer value at
    bin width 250, merged across days per type, p50/p90/p99 read off
    the merged cumulative histogram as bin lower edges. The third
    sketch family's distinguishing property: the state is plain
    integers, so unlike HLL/CMS the ORACLE IS HASH-EXACT end to end —
    DuckDB replays the identical floor(v/250.0) binning (one IEEE
    division + floor, exact for |cents| < 2^52), integer cumulative
    sums, and the integer threshold ``cum·100 ≥ n·q`` (never a float
    quantile) — while the answer's error bound (≤ one bin width below
    the true order statistic) is deterministic resolution, not
    probability. The daily grain on the Spark side exercises the
    build-then-merge table flow; merging daily cells equals direct
    binning because bin counts add exactly.

    Scale shape: one groupBy whose cell count is bounded by types ×
    days × (value range / 250) — never rows; the quantile read
    shuffles cells only. At 100 TB this is the pre-binned percentile
    store behind latency/price dashboards; exact `percentile` (the
    `ts_mad_outliers` baseline) buffers each group instead."""
    from .operators.sketches import hist_quantiles, hist_rollup

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    cents = F.round(F.col("value") * 100).cast("long")
    daily = hist_rollup(
        ev, [F.col("event_type"), F.to_date("ts").alias("day")], cents, 250
    )
    return hist_quantiles(daily, ["event_type"], 250, [50, 90, 99])
