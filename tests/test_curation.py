"""Planted-case tests for the corpus-curation operators
(data_engineering_spark/operators/curation.py). Oracle parity for the
SQL-expressible forms is the driver's job (queries_curation.py); these
tests pin the *semantics* on handcrafted inputs where the right answer
is computable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.curation import (
    hash_bucket,
    mixture_weights,
    ngram_decontaminate,
    pack_concat,
    pack_ffd,
    pii_redact,
    repetition_stats,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_redact_planted(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at alice.smith+x@corp.example.org today"),
            (2, "server 192.168.10.254 and backup 10.0.0.7 are up"),
            (3, "call +1-555-0142 or +82-555-9000"),
            (4, "no pii here at all"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert got[1]["clean_text"] == "mail me at <EMAIL> today"
    assert got[1]["n_pii"] == 1
    assert got[2]["clean_text"] == "server <IP> and backup <IP> are up"
    assert got[2]["n_pii"] == 2
    assert got[3]["clean_text"] == "call <PHONE> or <PHONE>"
    assert got[3]["n_pii"] == 2
    assert got[4]["clean_text"] == "no pii here at all"
    assert got[4]["n_pii"] == 0


def test_repetition_stats_flags_repetitive_doc(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam"),  # one token repeated
            (2, "the quick brown fox jumps over lazy dogs"),  # all distinct
        ],
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["dup_token_frac"] > 0.8 and got[1]["dup_2gram_frac"] > 0.7
    assert not got[1]["keep"]
    assert got[2]["dup_token_frac"] == 0.0 and got[2]["dup_2gram_frac"] == 0.0
    assert got[2]["keep"]


def test_stratified_sample_deterministic_and_stratified(spark):
    rows = [(i, f"doc {i}", "en" if i % 2 == 0 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out1 = stratified_sample(df, {"en": 50, "de": 10}).select("doc_id").collect()
    out2 = stratified_sample(df, {"en": 50, "de": 10}).select("doc_id").collect()
    assert sorted(r[0] for r in out1) == sorted(r[0] for r in out2)  # reproducible
    by_lang = (
        stratified_sample(df, {"en": 50, "de": 10})
        .groupBy("lang")
        .count()
        .collect()
    )
    counts = {r["lang"]: r["count"] for r in by_lang}
    # 200 docs per stratum at 50% / 10%: expect ~100 and ~20 (md5-uniform)
    assert 70 <= counts["en"] <= 130
    assert 5 <= counts.get("de", 0) <= 40
    # bucket is a pure function of doc_id: same id, same bucket, any engine
    b = df.select(hash_bucket("doc_id").alias("b")).collect()
    assert all(0 <= r["b"] < 100 for r in b)


def test_ngram_decontaminate_planted_overlap(spark):
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench = _docs(spark, [(100, f"benchmark prompt {passage} answer choices")])
    corpus = _docs(
        spark,
        [
            (1, f"intro {passage} outro words go here"),  # contains the 8-gram
            (2, "totally unrelated text with enough tokens to build grams"),
        ],
    )
    got = {r["doc_id"]: r for r in ngram_decontaminate(corpus, bench, n=8).collect()}
    assert got[1]["contaminated"] and got[1]["n_shared_grams"] >= 1
    assert not got[2]["contaminated"] and got[2]["n_shared_grams"] == 0


def test_ngram_decontaminate_never_broadcasts_corpus_side(spark):
    """Scale guard: the ONLY forced broadcast is the MB-scale benchmark
    gram set. The hit-count relation is O(contaminated docs) — data-sized
    at 100 TB with a dirty corpus — so it must not carry a hint; AQE may
    still pick a broadcast at runtime when it measures small."""
    from data_engineering_spark.plans.explain import broadcast_hint_count

    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta eta theta")])
    corpus = _docs(spark, [(i, f"filler text number {i} with several tokens") for i in range(8)])
    df = ngram_decontaminate(corpus, bench, n=8)
    assert broadcast_hint_count(df) == 1


def test_pack_concat_bins_follow_running_sum(spark):
    # 4 docs of 3 tokens, capacity 4: stream offsets 0,3,6,9 → bins 0,0,1,2
    df = _docs(spark, [(i, "a b c") for i in range(4)])
    got = {r["doc_id"]: r["bin_id"] for r in pack_concat(df, capacity=4).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 2}


def test_pack_ffd_invariants(spark, sf_dir):
    from data_engineering_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = pack_ffd(docs, capacity=256, num_partitions=4)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc packed exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)
    fill: dict[int, int] = {}
    for r in rows:
        fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["n_tokens"]
    # no bin overflows (corpus docs are all < capacity tokens)
    assert all(v <= 256 for v in fill.values())
    # FFD should beat naive one-doc-per-bin by a wide margin
    assert len(fill) < len(rows) / 2
    # deterministic across runs
    again = {(r["doc_id"], r["bin_id"]) for r in out.collect()}
    assert again == {(r["doc_id"], r["bin_id"]) for r in rows}


def test_pack_ffd_portable_is_layout_independent(spark, sf_dir):
    """The md5-partitioned variant's bin ids must be a pure function of
    the data: identical assignments no matter how the input is
    physically partitioned — the property spark_partition_id namespacing
    cannot have, and the one that makes the DuckDB oracle possible.
    Same packing invariants as the spark-pid path."""
    from data_engineering_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {
        (r["doc_id"], r["bin_id"])
        for r in pack_ffd(docs, capacity=256, partition_impl="portable").collect()
    }
    b = {
        (r["doc_id"], r["bin_id"])
        for r in pack_ffd(
            docs.repartition(13), capacity=256, partition_impl="portable"
        ).collect()
    }
    assert a == b
    fill: dict[int, int] = {}
    rows = pack_ffd(docs, capacity=256, partition_impl="portable").collect()
    for r in rows:
        fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(v <= 256 for v in fill.values())
    assert len({r["doc_id"] for r in rows}) == len(rows) == docs.count()


def test_mixture_weights_flatten(spark):
    rows = [(i, "tok " * 10, "en") for i in range(30)] + [
        (100 + i, "tok " * 10, "de") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: r for r in mixture_weights(df).collect()}
    assert got["en"]["token_share"] == 0.75 and got["de"]["token_share"] == 0.25
    # weight * share == uniform target (1/2 strata)
    assert abs(got["en"]["weight"] * 0.75 - 0.5) < 1e-6
    assert abs(got["de"]["weight"] * 0.25 - 0.5) < 1e-6


def test_registered_curation_queries_smoke(spark, sf_dir):
    import __spark_entry__ as e

    qs = e.queries()
    for name in (
        "curate_pii_redact",
        "curate_quality_repetition",
        "curate_sample_stratified",
        "curate_decontaminate",
        "curate_mixture_weights",
        "curate_pack_concat",
        "curate_pack_ffd",
    ):
        assert qs[name](spark, sf_dir).count() > 0, name


def test_chunk_sliding_invariants(spark):
    from data_engineering_spark.operators.curation import chunk_sliding

    text = " ".join(f"t{i}" for i in range(150))
    df = _docs(spark, [(1, text), (2, "short doc"), (3, "")])
    out = chunk_sliding(df, window=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts at 0, 48, 96, 144 → 4 chunks
    chunks = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in chunks] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in chunks] == [64, 64, 54, 6]
    # consecutive chunks overlap by window - stride = 16 tokens
    a, b = chunks[0].chunk_text.split(), chunks[1].chunk_text.split()
    assert a[48:] == b[:16]
    # every token is covered, in order, with no gaps
    assert chunks[0].chunk_text.split()[0] == "t0"
    assert chunks[3].chunk_text.split()[-1] == "t149"
    # short doc → one whole chunk; empty doc → no chunks
    assert by_doc[2][0].n_chunk_tokens == 2
    assert 3 not in by_doc


def test_unigram_nll_orders_rarity(spark):
    from data_engineering_spark.operators.curation import unigram_nll

    df = _docs(
        spark,
        [
            (1, "common common common common"),
            (2, "common rareword"),
        ],
    )
    got = {r.doc_id: r.nll_micro for r in unigram_nll(df).collect()}
    # doc 2 contains the corpus-rarest token → strictly higher NLL
    assert got[2] > got[1]
    # exact integer check: every term quantized to micros, then an
    # exact integer mean. p(common)=5/6, p(rareword)=1/6
    import math

    t_common = round(-math.log(5 / 6) * 1e6)
    t_rare = round(-math.log(1 / 6) * 1e6)
    assert got[1] == t_common
    assert got[2] == (t_common + t_rare) // 2


def test_weighted_sample_properties(spark, sf_dir):
    """A-ES sampling: deterministic across invocations, k rows, and
    weight-proportional — the sampled docs' mean length must exceed the
    corpus mean (longer docs are likelier picks)."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    s1 = [r.doc_id for r in weighted_sample(docs, k=50).collect()]
    s2 = [r.doc_id for r in weighted_sample(docs, k=50).collect()]
    assert s1 == s2  # pure function of ids
    assert len(s1) == 50
    sampled_mean = (
        docs.filter(docs.doc_id.isin(s1)).agg({"n_chars": "avg"}).collect()[0][0]
    )
    corpus_mean = docs.agg({"n_chars": "avg"}).collect()[0][0]
    assert sampled_mean > corpus_mean


def test_weighted_sample_null_weight_and_no_tie_collapse(spark):
    """NULL/zero-weight rows are excluded (they'd sort NULLS FIRST in
    Spark and seize sample slots), and ranking on the unrounded key
    keeps the top-k weight-proportional instead of collapsing to the
    doc_id tiebreak."""
    from data_engineering_spark.operators.curation import weighted_sample

    rows = [(i, "x" * 10, (i % 37) + 1) for i in range(500)]
    rows += [(900, "y", None), (901, "y", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    out = weighted_sample(df, k=20, weight_col="n_chars").collect()
    ids = [r.doc_id for r in out]
    assert 900 not in ids and 901 not in ids
    assert len(ids) == 20
    # selection must not be the 20 lowest ids (the tie-collapse symptom)
    assert ids != sorted(ids)[:20] or set(ids) != set(range(20))


# ---------------------------------------------------------------------------
# prefix_sum / token_budget_select / mixture_temperature / keep_best_dedup
# ---------------------------------------------------------------------------


def test_prefix_sum_matches_naive_window(spark):
    from pyspark.sql import Window

    from data_engineering_spark.operators.curation import prefix_sum

    rows = [(i, (i * 37) % 11, (i * 13) % 7 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k long, v long").repartition(7)
    got = {
        r["id"]: r["cum"]
        for r in prefix_sum(
            df, [F.col("k").asc(), F.col("id").asc()], "v", out_col="cum",
            num_partitions=5,
        ).collect()
    }
    w = Window.orderBy(F.col("k").asc(), F.col("id").asc())
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_prefix_sum_layout_independent(spark):
    """The cumsum is a pure function of the total order — identical under
    any input partitioning and any internal partition count."""
    from data_engineering_spark.operators.curation import prefix_sum

    rows = [(i, (i * 7) % 5, i % 9 + 1) for i in range(120)]
    outs = []
    for in_parts, n_parts in ((1, 3), (13, 8), (4, 1)):
        df = spark.createDataFrame(rows, "id long, k long, v long").repartition(
            in_parts
        )
        outs.append(
            sorted(
                (r["id"], r["cum"])
                for r in prefix_sum(
                    df,
                    [F.col("k").asc(), F.col("id").asc()],
                    "v",
                    out_col="cum",
                    num_partitions=n_parts,
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_mixture_waterfill_caps_bind_and_overflow_redistributes(spark):
    """A tiny domain must cap at its availability and its overflow must
    flow to the uncapped domains; total allocation must reach the budget
    up to the documented floor-div slack (≤ |strata| per pass); no
    domain may exceed what it has."""
    from data_engineering_spark.operators.curation import mixture_waterfill

    # 'small': 2 docs × 2 tokens = 4 tokens available but HUGE inverse
    # weight; 'big': 20 docs × 10 tokens = 200 tokens
    rows = [(i, "small", "a b") for i in range(2)]
    rows += [(100 + i, "big", "t u v w x y z q r s") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.lang: r for r in mixture_waterfill(df).collect()}
    budget = (4 + 200) * 3 // 5  # 122
    assert out["small"].capped and out["small"].alloc_tokens == 4
    assert not out["big"].capped
    total_alloc = out["small"].alloc_tokens + out["big"].alloc_tokens
    assert total_alloc <= budget
    assert budget - total_alloc <= 2 * 3  # floor slack: ≤|strata| per pass
    assert out["big"].alloc_tokens <= 200
    # without redistribution big's share would be its weight fraction of
    # the ORIGINAL budget; with small capped, big absorbs the overflow
    w_small, w_big = 1_000_000 // 2, 1_000_000 // 20
    naive_big = budget * w_big // (w_small + w_big)
    assert out["big"].alloc_tokens > naive_big


def test_prefix_sum_reliable_checkpoint_identical(spark, tmp_path):
    """reliable_checkpoints=True pins the range partitioning in cluster
    checkpoint() storage (executor-loss survives with the SAME partition
    ids; the localCheckpoint default is fail-stop) — results identical."""
    from data_engineering_spark.operators.curation import prefix_sum

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    rows = [(i, (i * 37) % 11, (i * 13) % 7 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, k long, v long").repartition(5)
    order = [F.col("k").asc(), F.col("id").asc()]
    local = sorted(
        (r["id"], r["cum"])
        for r in prefix_sum(df, order, "v", out_col="cum", num_partitions=4).collect()
    )
    reliable = sorted(
        (r["id"], r["cum"])
        for r in prefix_sum(
            df, order, "v", out_col="cum", num_partitions=4, reliable_checkpoints=True
        ).collect()
    )
    assert local == reliable


def test_token_budget_select_greedy_prefix(spark):
    from data_engineering_spark.operators.curation import token_budget_select

    # quality = 0.5*ttr + 0.5*min(n/200, 1): all-distinct tokens → ttr 1,
    # so longer docs rank higher; doc 4's repeated word sinks it.
    df = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d"),
            (3, "x y"),
            (4, "w w w w w w w w w w"),
        ],
    )
    got = token_budget_select(df, budget=12).orderBy("cum_tokens").collect()
    # rank: doc1 (8 toks) > doc2 (4) > doc3 (2) > doc4; budget 12 fits 1+2.
    assert [r["doc_id"] for r in got] == [1, 2]
    assert [r["cum_tokens"] for r in got] == [8, 12]
    # cumulative tokens are monotone and within budget
    assert all(r["cum_tokens"] <= 12 for r in got)


def test_mixture_temperature_contract(spark):
    import pytest

    from data_engineering_spark.operators.curation import mixture_temperature

    df = spark.createDataFrame(
        [(1, "en", "a b c d e f g h i j k l m n o p"), (2, "zh", "x y")],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in mixture_temperature(df).collect()}
    # probabilities sum to 1 (up to the 6-dp rounding of each term)
    assert abs(rows["en"]["temp_weight"] + rows["zh"]["temp_weight"] - 1.0) < 2e-6
    # sqrt-scaling boosts the small stratum, damps the large one
    assert rows["zh"]["boost"] > 1.0 > rows["en"]["boost"]
    # and preserves the share ordering
    assert rows["en"]["temp_weight"] > rows["zh"]["temp_weight"]
    with pytest.raises(ValueError):
        mixture_temperature(df, alpha=0.3)


def test_keep_best_dedup_survivor(spark):
    from data_engineering_spark.operators.dedup import keep_best_dedup

    # docs 1/2/3 are the same text modulo case/whitespace (one cluster);
    # within it quality ties (identical normalized text) → lowest id wins.
    # docs 10/11 differ in text length → the longer, higher-quality one
    # survives even though its id is higher.
    df = _docs(
        spark,
        [
            (1, "the quick brown fox"),
            (2, "The  quick Brown fox"),
            (3, "THE QUICK BROWN FOX"),
            (10, "alpha beta"),
            (11, "alpha beta gamma delta epsilon zeta"),
        ],
    )
    got = {r["doc_id"]: r for r in keep_best_dedup(df).collect()}
    assert set(got) == {1, 10, 11}
    assert got[1]["dup_count"] == 3
    assert got[1]["dropped_tokens"] == 8  # two dropped 4-token dups
    assert got[10]["dup_count"] == 1 and got[10]["dropped_tokens"] == 0


def test_boilerplate_strip_planted(spark):
    from data_engineering_spark.operators.curation import boilerplate_strip

    header = "terms of service apply to this mirror site"  # 8 tokens
    df = _docs(
        spark,
        [
            (1, header + " unique alpha content one two three four five"),
            (2, header + " other beta content six seven eight nine ten"),
            (3, header + " third gamma content lorem ipsum dolor sit amet"),
            (4, header),  # entirely boilerplate
            (5, "completely unrelated text with no shared blocks at all"),
        ],
    )
    got = {r["doc_id"]: r for r in boilerplate_strip(df).collect()}
    # the shared 8-token header block (df=4) is stripped everywhere
    for i in (1, 2, 3):
        assert got[i]["n_bp_blocks"] == 1
        assert not got[i]["clean_text"].startswith("terms")
    # doc 4 was nothing but boilerplate → NULL clean text
    assert got[4]["n_blocks"] == 1 and got[4]["clean_text"] is None
    # doc 5 untouched
    assert got[5]["n_bp_blocks"] == 0
    assert got[5]["clean_text"] == "completely unrelated text with no shared blocks at all"


def test_dsir_weights_ranks_target_like_docs(spark):
    from data_engineering_spark.operators.curation import dsir_weights

    # target domain: cooking text; off-domain: legal text. A held-out
    # cooking doc must outscore every legal doc under the target model.
    corpus = _docs(
        spark,
        [
            (1, "simmer the garlic butter sauce and season the roast"),
            (2, "whisk the eggs then fold in sugar and flour gently"),
            (3, "the party of the first part hereby waives liability"),
            (4, "pursuant to clause nine the agreement is terminated"),
            (5, "season the sauce then simmer the butter and garlic"),
        ],
    )
    target = corpus.filter("doc_id in (1, 2)")
    got = {r["doc_id"]: r for r in dsir_weights(corpus, target, buckets=512).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # feature count = unigrams + bigrams = 2*len - 1
    assert got[1]["n_feats"] == 17
    # the held-out cooking doc beats both legal docs
    assert got[5]["logw_micro"] > max(got[3]["logw_micro"], got[4]["logw_micro"])


def test_dsir_weights_disjoint_and_empty_target(spark):
    """The r11 review edge cases, re-pinned on the r12 full-outer form:
    a target whose buckets are disjoint from the corpus must still
    contribute its TRUE mass P (the pre-r11 max-over-left-joined-rows
    collapsed it to 0), and an empty target yields NULL weights, not
    0-mass ones."""
    from data_engineering_spark.operators.curation import dsir_weights

    corpus = _docs(spark, [(1, "aaa bbb"), (2, "ccc ddd")])
    target = _docs(spark, [(9, "zzz yyy xxx www vvv uuu")])
    got = {r["doc_id"]: r for r in dsir_weights(corpus, target, buckets=4096).collect()}
    # buckets=4096 makes hash collisions across these tiny gram sets
    # effectively impossible → disjoint. Every corpus bucket then has
    # pc=0 and the SAME qc=1, so all docs share one (finite) weight
    # containing ln(P+B): ln(1) - ln(11+4096) - ln(2) + ln(6+4096)
    import math

    expected = round((math.log(1) - math.log(11 + 4096)
                      - math.log(2) + math.log(6 + 4096)) * 1e6) * 3
    assert got[1]["logw_micro"] == got[2]["logw_micro"] == expected
    # empty target → NULL weight (no target mass to model), never 0.0
    empty = target.filter("doc_id < 0")
    got0 = {r["doc_id"]: r for r in dsir_weights(corpus, empty, buckets=4096).collect()}
    assert got0[1]["logw_micro"] is None and got0[2]["logw_micro"] is None


def test_shard_shuffle_layout_independent_and_balanced(spark):
    from data_engineering_spark.operators.curation import shard_shuffle

    rows = [(i, f"doc {i}") for i in range(1, 301)]
    df = _docs(spark, rows)
    a = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
         for r in shard_shuffle(df, shard_size=50).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
         for r in shard_shuffle(df.repartition(7), shard_size=50).collect()}
    assert a == b  # assignment is a pure function of the keys
    # 300 docs / 50 per shard = 6 full shards, every slot filled once
    from collections import Counter
    sizes = Counter(s for s, _ in a.values())
    assert sizes == {s: 50 for s in range(6)}
    positions = sorted(p for s, p in a.values() if s == 0)
    assert positions == list(range(50))


def test_word_dropout_reproducible_and_seed_sensitive(spark):
    from data_engineering_spark.operators.curation import word_dropout

    df = _docs(spark, [(i, "alpha beta gamma delta epsilon zeta") for i in range(1, 41)])
    a = {r["doc_id"]: r for r in word_dropout(df, rate_pct=25).collect()}
    b = {r["doc_id"]: r for r in word_dropout(df.repartition(5), rate_pct=25).collect()}
    # pure function of (seed, id, position): layout changes nothing
    assert {k: (v["aug_text"], v["n_dropped"]) for k, v in a.items()} == {
        k: (v["aug_text"], v["n_dropped"]) for k, v in b.items()
    }
    # ~25% of 240 tokens dropped, and at least one doc differs per seed
    total_dropped = sum(v["n_dropped"] for v in a.values())
    assert 30 <= total_dropped <= 90
    c = {r["doc_id"]: r["aug_text"] for r in word_dropout(df, rate_pct=25, seed="aug-v2").collect()}
    assert any(c[k] != a[k]["aug_text"] for k in c)
    # dropped tokens keep relative order of the survivors
    assert all(
        [w for w in "alpha beta gamma delta epsilon zeta".split() if w in (v["aug_text"] or "").split()]
        == (v["aug_text"] or "").split()
        for v in a.values()
    )


def test_corpus_pipeline_e2e_invariants(spark, sf_dir):
    import __spark_entry__  # noqa: F401
    from data_engineering_spark.registry import QUERIES

    rows = QUERIES["corpus_pipeline_e2e"](spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    # survivors: unique ids, never from the benchmark slice (doc_id % 10 == 0)
    assert len(ids) == len(set(ids))
    assert all(i % 10 != 0 for i in ids)
    # shard layout: contiguous 0-based shards, every non-tail shard full,
    # positions within a shard are exactly 0..size-1
    from collections import Counter
    sizes = Counter(r["shard"] for r in rows)
    assert sorted(sizes) == list(range(len(sizes)))
    for s, cnt in sizes.items():
        if s < len(sizes) - 1:
            assert cnt == 64
        got = sorted(r["pos_in_shard"] for r in rows if r["shard"] == s)
        assert got == list(range(cnt))
    assert all(r["n_tokens"] > 0 for r in rows)


def test_events_sessionize_gap_rule(spark, tmp_path):
    import datetime as dt

    import __spark_entry__  # noqa: F401

    from pyspark.sql import functions as F  # noqa: F401
    from data_engineering_spark.registry import QUERIES

    # use the registered query's logic via a tiny planted frame run
    # through the same window expressions
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 100), (2, base + dt.timedelta(minutes=10), 100),
        (3, base + dt.timedelta(minutes=45), 100),    # 35-min gap → new session
        (4, base + dt.timedelta(minutes=50), 100),
        (5, base, 200),                                # other user independent
    ]
    df = spark.createDataFrame(
        [(e, t, u, "click", 1.0, "{}") for e, t, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import os
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {(r["user_id"], r["session_no"]): r
           for r in QUERIES["events_sessionize"](spark, d).collect()}
    assert got[(100, 1)]["n_events"] == 2 and got[(100, 1)]["duration_us"] == 600_000_000
    assert got[(100, 2)]["n_events"] == 2 and got[(100, 2)]["duration_us"] == 300_000_000
    assert got[(200, 1)]["n_events"] == 1 and got[(200, 1)]["duration_us"] == 0


def test_ts_ses_smooth_recursion(spark, sf_dir):
    import __spark_entry__  # noqa: F401
    from data_engineering_spark.registry import QUERIES

    rows = QUERIES["ts_ses_smooth"](spark, sf_dir).collect()
    by_series = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        by_series.setdefault(r["event_type"], []).append(r)
    assert by_series
    for series in by_series.values():
        # replay the recursion: first level equals the first count
        assert series[0]["level_micro"] == series[0]["x"] * 1_000_000
        s = float(series[0]["x"])
        for r in series[1:]:
            s = 0.5 * float(r["x"]) + 0.5 * s
            assert abs(r["level_micro"] - s * 1e6) <= 1


def test_pipeline_and_quality_oracles_total_on_short_docs(spark, tmp_path):
    """Review regression: 1-token docs and sub-8-token cross-boundary
    duplicates diverged Spark vs oracle. Plant both shapes and hash-match
    the three affected queries cross-engine on them."""
    import os

    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from data_engineering_spark.registry import ORACLE, QUERIES

    rows = [
        (11, "solo", "en", "src1"),                       # 1-token corpus doc
        (13, "five short tokens right here", "en", "src1"),  # dup of bench 20
        (20, "five short tokens right here", "en", "src1"),  # bench slice
        (21, "a perfectly ordinary document with plenty of distinct tokens", "en", "src1"),
        (23, "another ordinary document holding its own distinct words nicely", "en", "src1"),
        (30, "benchmark only content that matches nothing else at all", "en", "src1"),
        (41, "final corpus doc with enough fresh tokens to stay clean", "en", "src1"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for name in ("curate_quality_repetition", "curate_decontaminate",
                 "corpus_pipeline_e2e"):
        got = (
            QUERIES[name](spark, str(tmp_path))
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = con.execute(ORACLE[name]).df().sort_values("doc_id").reset_index(drop=True)
        assert list(got.columns) == list(want.columns), name
        assert got.astype(str).equals(want[got.columns].astype(str)), (
            name, got.to_dict(), want.to_dict()
        )
    # the specific repro shapes: doc 11 survives the pipeline; doc 13 is
    # decontaminated away by its short cross-boundary duplicate
    ids = set(
        r["doc_id"]
        for r in QUERIES["corpus_pipeline_e2e"](spark, str(tmp_path)).collect()
    )
    assert 11 in ids and 13 not in ids


def test_micro_ratio_exact_above_2pow53(spark):
    """ADVICE r9 (medium): the old floor-div-via-double micro_ratio was
    exact only while 2e6*numer + denom < 2^53 — a doc over ~11M tokens
    silently produced a key 1 micro off the oracle's true integer ``//``.
    The helper now routes through Spark's integral ``div``, exact to the
    int64 bound; pin it on values straddling and far beyond 2^53."""
    from data_engineering_spark.operators.text import micro_ratio

    cases = [
        (7, 3),
        (2**53 // 2000000 + 17, 999_983),          # a just above 2^53
        (2**60 // 2000000, 1_000_003),             # far above
        ((2**63 - 1) // 2000000 - 1, 1),           # near the int64 ceiling
    ]
    df = spark.createDataFrame(cases, "numer long, denom long").select(
        "numer", "denom", micro_ratio(F.col("numer"), F.col("denom")).alias("m")
    )
    for r in df.collect():
        assert r.m == (2_000_000 * r.numer + r.denom) // (2 * r.denom), r


def test_mixture_waterfill_null_stratum_allocates(spark):
    """ADVICE r9 (low): a NULL stratum is a legal group — the DuckDB twin
    groups it — so waterfill must allocate for it, not TypeError on the
    None-vs-str sort."""
    from data_engineering_spark.operators.curation import mixture_waterfill

    df = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "e f g h", None), (3, "i j", "ko")],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in mixture_waterfill(df).collect()}
    assert set(out) == {"en", None, "ko"}
    assert out[None].avail_tokens == 4 and out[None].alloc_tokens >= 0
    # budget 3/5 of 10 tokens = 6, fully allocated across the strata
    assert sum(r.alloc_tokens for r in out.values()) == 6
