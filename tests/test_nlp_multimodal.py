"""§2.10 UDF/NLP layer + multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.multimodal import (
    extract_features,
    media_metadata,
    sample_frames,
    synthetic_media,
)
from data_engineering_spark.operators.nlp import (
    doc_to_json,
    embed_text,
    keyword_extract,
    tfidf_keywords,
    tokenize_pandas,
)


def test_tokenize_pandas(spark):
    df = spark.createDataFrame([(1, "Hello World hello")], ["id", "text"])
    toks = df.select(tokenize_pandas(F.col("text")).alias("t")).collect()[0].t
    assert toks == ["hello", "world", "hello"]


def test_subword_greedy_longest_match(spark):
    """The greedy rule, pinned on a crafted vocab: longest vocabulary
    match wins at each position, uncovered spans fall back to single
    chars, empty input yields no tokens, and the derived vocab's
    tie-break is deterministic."""
    from data_engineering_spark.operators.nlp import subword_encode_words, subword_vocab

    words = spark.createDataFrame(
        [("interstellar",), ("stellar",), ("xyz",), ("",)], ["word"]
    )
    vocab = ["inter", "stell", "ar", "in", "te"]
    got = {
        r.word: list(r.subtokens)
        for r in subword_encode_words(words, vocab).collect()
    }
    assert got["interstellar"] == ["inter", "stell", "ar"]  # longest beats "in"/"te"
    assert got["stellar"] == ["stell", "ar"]
    assert got["xyz"] == ["x", "y", "z"]  # single-char fallback
    assert got[""] == []
    # vocab derivation: deterministic and frequency-ordered
    docs = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd")], ["doc_id", "text"]
    )
    v = subword_vocab(docs, vocab_size=3, max_len=3)
    assert v[0] == "ab"  # weight 6 (3 occurrences of 'abab' x 2 positions)
    assert len(v) == 3 == len(set(v))


def test_subword_oracle_parity_on_long_words(spark, tmp_path):
    """Regression (review finding): the DuckDB twin originally capped
    substring start positions at 60, so a 61+-char token diverged the
    two vocab derivations. Plant a 70-char word and hash-compare the
    full Spark pipeline against the oracle SQL on the same parquet."""
    import duckdb

    import data_engineering_spark.queries_extra  # noqa: F401  (registers)
    from data_engineering_spark.registry import ORACLE, QUERIES

    long_word = "x" + "ab" * 34 + "z"  # 70 chars
    assert len(long_word) == 70
    rows = [(1, f"{long_word} hello world"), (2, "hello world hello"), (3, long_word)]
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(
        sf_dir + "/documents.parquet"
    )
    got = {
        (r.word): (r.word_freq, r.n_subwords, r.subtokens)
        for r in QUERIES["nlp_subword_tokenize"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        w: (f, n, s)
        for w, f, n, s in con.execute(ORACLE["nlp_subword_tokenize"]).fetchall()
    }
    assert got == want
    assert long_word in got and got[long_word][1] >= 2  # actually segmented


def test_keyword_extract_grouped(spark):
    rows = [
        (1, "spark spark spark shuffle shuffle join"),
        (1, "spark broadcast"),
        (2, "duckdb duckdb vector"),
    ]
    df = spark.createDataFrame(rows, ["group_id", "text"])
    out = {
        (r.group_id, r.kw_rank): r.keyword
        for r in keyword_extract(df, "group_id", "text").collect()
    }
    assert out[(1, 1)] == "spark"  # tf=4
    assert out[(1, 2)] == "shuffle"
    assert out[(2, 1)] == "duckdb"


def test_keyword_extract_empty_group_fallback(spark):
    df = spark.createDataFrame([(7, "a b")], ["group_id", "text"])  # all tokens ≤2 chars
    rows = keyword_extract(df, "group_id", "text").collect()
    assert len(rows) == 1 and rows[0].keyword is None  # reference fallback shape


def test_embed_text_deterministic_normalized(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma"), (2, "alpha beta gamma")], ["id", "text"])
    vecs = [r.v for r in df.select(embed_text(F.col("text")).alias("v")).collect()]
    assert vecs[0] == vecs[1]  # deterministic across rows/batches
    assert abs(sum(x * x for x in vecs[0]) - 1.0) < 1e-5  # L2 normalized


def test_tfidf_rare_token_beats_common(spark):
    rows = [
        (1, "common rare1"),
        (2, "common rare2"),
        (3, "common rare3"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_keywords(df, "doc_id", "text", top_k=1)
    top = {r.doc_id: r.keyword for r in out.collect()}
    assert top == {1: "rare1", 2: "rare2", 3: "rare3"}  # idf downweights 'common'


def test_doc_to_json_shape(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "val"])
    row = doc_to_json(df, "doc_id", "hr_dty_rcmd_emp").collect()[0]
    assert row._index == "hr_dty_rcmd_emp"
    assert row._id == "1"
    assert '"val":"x"' in row._source


def test_media_metadata(spark):
    meta = media_metadata(synthetic_media(spark, 12)).collect()
    assert len(meta) == 12
    by_id = {r.media_id: r for r in meta}
    assert by_id[0].kind == "image" and by_id[0].aspect is not None
    assert by_id[1].kind == "audio" and by_id[1].aspect is None
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in meta)


def test_extract_features_shape_and_determinism(spark):
    f1 = {r.media_id: r.feature for r in extract_features(synthetic_media(spark, 12)).collect()}
    f2 = {r.media_id: r.feature for r in extract_features(synthetic_media(spark, 12)).collect()}
    assert all(len(v) == 8 for v in f1.values())
    assert f1 == f2  # deterministic across runs


def test_sample_frames_fanout(spark):
    frames = sample_frames(synthetic_media(spark, 12), every_ms=5000)
    rows = frames.collect()
    assert all(r.frame_ts_ms % 5000 == 0 for r in rows)
    # every video with duration d gets ceil(d/5000) frames
    vids = {r.media_id: r.duration_ms for r in synthetic_media(spark, 12).filter(F.col("kind") == "video").collect()}
    from collections import Counter

    per = Counter(r.media_id for r in rows)
    for mid, dur in vids.items():
        assert per[mid] == (dur + 4999) // 5000


def test_korean_analyzer_strips_josa_and_endings():
    from data_engineering_spark.operators.korean import analyze_korean, strip_josa

    # particle stripping on nouns
    assert strip_josa("학교에서") == "학교"
    assert strip_josa("친구를") == "친구"
    assert strip_josa("한국의") == "한국"
    assert strip_josa("데이터로") == "데이터"
    # guard: single-syllable stems keep 1-char particles (가을 = autumn)
    assert strip_josa("가을") == "가을"
    # predicative endings
    assert strip_josa("중요합니다") == "중요"
    assert strip_josa("분석하는") == "분석"
    # latin/numeric untouched
    assert strip_josa("spark3") == "spark3"
    # 만났다 is an irregular contraction (만나+았다) the stripper can't
    # reach — the round-7 lemma table resolves it to the stem 만나
    assert analyze_korean("학교에서 친구를 만났다 Spark 분석") == [
        "학교", "친구", "만나", "spark", "분석",
    ]
    assert analyze_korean(None) == []


def test_korean_lemma_table_resolves_irregular_inflections():
    """Planted forms from every irregular class the suffix stripper
    MISSES (the stem itself mutates): the dictionary layer must resolve
    them, and the stripper alone must demonstrably not."""
    from data_engineering_spark.operators.korean import (
        analyze_korean,
        analyze_korean_tagged,
        strip_josa,
    )

    planted = {
        "어려운": "어렵",        # ㅂ-irregular adnominal
        "추워서": "춥",          # ㅂ-irregular causal
        "고마웠다": "고맙",      # ㅂ-irregular past
        "몰랐습니다": "모르",    # 르-irregular past formal
        "달라서": "다르",        # 르-irregular
        "들었습니다": "듣",      # ㄷ-irregular
        "지어": "짓",            # ㅅ-irregular
        "그런": "그렇",          # ㅎ-irregular adnominal
        "썼다": "쓰",            # 으-deletion
        "예뻤다": "예쁘",        # vowel contraction
        "됐습니다": "되",        # contracted 되었습니다
        "만났다": "만나",        # contracted 만나+았다
    }
    for surface, lemma in planted.items():
        assert analyze_korean(surface) == [lemma], surface
        # the stripper alone cannot produce the mutated-stem lemma —
        # regression guard that the dictionary layer is load-bearing
        assert strip_josa(surface) != lemma, surface

    # general-ending layer (regular stems the old stripper also missed)
    assert analyze_korean("없습니다") == ["없"]
    assert analyze_korean("받았다") == ["받"]
    # stacked particles
    assert analyze_korean("학교에서는") == ["학교"]
    assert analyze_korean("사람들이") == ["사람"]
    # dictionary re-check after a josa strip keeps whole-word guards
    assert analyze_korean("가을") == ["가을"]
    # nouny particle stacks (들*/만*) keep the strict ≥2-syllable guard
    # and fall through to the shorter particle: 아들이 is 아들+이, NOT
    # 아+들이 (review finding: the aggressive stack strip ate 아들)
    assert analyze_korean("아들이 학교에 갔다") == ["아들", "학교", "가"]
    assert analyze_korean("학생들이") == ["학생"]
    assert strip_josa("아들을") == "아들"
    # mixed Hangul-Latin tokens lowercase their Latin half, unifying
    # case variants with the pure-Latin SL branch (review finding)
    assert analyze_korean("IT업계에서 Spark 도입") == ["it업계", "spark", "도입"]

    # pynori do_analysis shape + the reference's commented NNG/NNP/VA
    # filter (pynori_test.py:14-19) as pos_keep
    tagged = analyze_korean_tagged("학교에서는 어려워요")
    assert tagged["termAtt"] == ["학교", "에서는", "어렵"]
    assert tagged["posTagAtt"] == ["NNG", "J", "VA"]
    assert analyze_korean(
        "어려운 데이터를 분석하는 Spark3 엔진", pos_keep={"NNG", "NNP", "VA"}
    ) == ["어렵", "데이터", "분석", "엔진"]


def test_korean_keyword_extract_unifies_inflections(spark):
    """The same noun under different josa must score as ONE keyword —
    the fragmentation the reference's pynori analyzer prevents."""
    from data_engineering_spark.operators.nlp import keyword_extract

    docs = spark.createDataFrame(
        [
            (1, "데이터가 중요합니다"),
            (1, "데이터를 분석하는 엔진"),
            (1, "데이터의 품질과 엔진에서"),
        ],
        ["group_id", "text"],
    )
    rows = {r.kw_rank: r.keyword for r in keyword_extract(
        docs, "group_id", "text", top_k=2, analyzer="korean").collect()}
    assert rows[1] == "데이터"  # 3 inflected forms unified
    assert rows[2] == "엔진"
    # the simple analyzer fragments the same corpus (regression guard
    # that the korean path is actually doing something)
    simple = {r.keyword for r in keyword_extract(
        docs, "group_id", "text", top_k=2).collect()}
    assert "데이터" not in simple


def test_korean_tokenizer_pandas_udf(spark):
    from data_engineering_spark.operators.korean import tokenize_korean_pandas

    df = spark.createDataFrame([(1, "학교에서 공부를 합니다")], ["id", "text"])
    out = df.select(tokenize_korean_pandas("text").alias("toks")).collect()[0].toks
    # standalone 합니다 resolves through the lemma table to the stem 하
    # (the stripper alone would leave it whole — empty-stem guard)
    assert out == ["학교", "공부", "하"]


def test_decode_image_ppm_roundtrip_and_bmp():
    """decode_image is REAL for P6 PPM and 24-bit BMP: encode→decode is
    the identity, headers with comments parse, BMP BGR/bottom-up/padding
    are handled, junk raises."""
    import struct

    import numpy as np
    import pytest

    from data_engineering_spark.operators.multimodal import decode_image, encode_ppm

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(arr)) == arr).all()
    # header comments + arbitrary whitespace
    ppm = b"P6\n# a comment\n3 2\n# another\n255\n" + bytes(range(18))
    assert decode_image(ppm).shape == (2, 3, 3)
    # hand-built 2x2 24-bit BMP (bottom-up, 4-byte row padding: 2*3→8)
    px = np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 9, 9]]], dtype=np.uint8)
    rows = b""
    for y in (1, 0):  # bottom-up
        row = b"".join(bytes(px[y, x, ::-1]) for x in range(2))  # BGR
        rows += row + b"\0" * (8 - len(row))
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
        + rows
    )
    assert (decode_image(bmp) == px).all()
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG not supported here")


def test_resize_is_real_pixels(spark):
    """Resize output is a decodable PPM whose pixels are the
    nearest-neighbor sample of the source — not a digest fake."""
    import numpy as np

    from data_engineering_spark.operators.multimodal import (
        decode_image,
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, 3)
    src = {
        r.media_id: decode_image(bytes(r.content))
        for r in media.filter("kind = 'image'").collect()
    }
    for r in resize_images(media, target_w=16, target_h=8).collect():
        arr = decode_image(bytes(r.content))
        assert arr.shape == (8, 16, 3)
        a = src[r.media_id]
        ys = np.arange(8) * a.shape[0] // 8
        xs = np.arange(16) * a.shape[1] // 16
        assert (arr == a[ys][:, xs]).all()


def test_extract_features_uses_pixels_for_images(spark):
    """Image features are real pixel statistics (match a local recompute
    from the decoded array); non-decodable kinds use the digest fold."""
    import numpy as np

    from data_engineering_spark.operators.multimodal import (
        _digest_features,
        _pixel_features,
        decode_image,
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 6)
    by_kind = {r.media_id: (r.kind, bytes(r.content)) for r in media.collect()}
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    for mid, (kind, content) in by_kind.items():
        if kind == "image":
            want = _pixel_features(decode_image(content))
        else:
            want = _digest_features(content)
        assert np.allclose(feats[mid], want, atol=1e-6), (mid, kind)


def test_split_sentences_udtf(spark):
    from data_engineering_spark.operators.nlp import split_sentences

    docs = spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, ""), (3, "One")],
        ["doc_id", "text"],
    )
    rows = {(r.doc_id, r.sent_no): r.sentence for r in split_sentences(docs).collect()}
    assert rows[(1, 0)] == "Hello world"
    assert rows[(1, 1)] == "How are you"
    assert rows[(1, 2)] == "Fine"
    assert (3, 0) in rows and rows[(3, 0)] == "One"
    assert not any(k[0] == 2 for k in rows)  # empty text → no rows


def test_resize_images_contract(spark):
    from data_engineering_spark.operators.multimodal import resize_images, synthetic_media

    media = synthetic_media(spark, 12)
    out = resize_images(media, target_w=32, target_h=24).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images
    assert all(r.width == 32 and r.height == 24 for r in out)
    assert all(isinstance(r.content, (bytes, bytearray)) and len(r.content) > 0 for r in out)
    # deterministic: same input → same payload
    again = {r.media_id: bytes(r.content) for r in resize_images(media, 32, 24).collect()}
    assert all(bytes(r.content) == again[r.media_id] for r in out)


def test_wav_roundtrip_and_chunk_walk():
    """encode_wav → decode_wav is identity; the parser must walk past an
    unknown LIST chunk inserted before data (real files carry INFO tags)."""
    import struct

    import numpy as np

    from data_engineering_spark.operators.multimodal import decode_wav, encode_wav

    x = np.array([0, 1000, -1000, 32767, -32768, 7, -7], dtype=np.int16)
    sr, back = decode_wav(encode_wav(x, 16000))
    assert sr == 16000
    assert (back == x).all()

    # splice an odd-sized junk chunk between fmt and data (word-aligned pad)
    wav = bytearray(encode_wav(x, 8000))
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytes(wav[:36]) + junk + bytes(wav[36:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr2, back2 = decode_wav(spliced)
    assert sr2 == 8000 and (back2 == x).all()


def test_wav_stereo_downmix_and_rejects():
    import struct

    import numpy as np
    import pytest as _pytest

    from data_engineering_spark.operators.multimodal import decode_wav

    # hand-build a 2-channel PCM WAV: frames (L,R) = (100,200), (-100,-300)
    data = np.array([100, 200, -100, -300], dtype="<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    sr, x = decode_wav(hdr + data)
    assert sr == 8000 and x.tolist() == [150, -200]
    with _pytest.raises(ValueError):
        decode_wav(b"RIFX" + b"\x00" * 40)
    with _pytest.raises(ValueError):  # non-PCM fmt code
        bad = hdr.replace(struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16),
                          struct.pack("<IHHIIHH", 16, 3, 2, 8000, 32000, 4, 16))
        decode_wav(bad + data)


def test_audio_frame_features_hand_check(spark):
    """One frame of a known square wave: RMS and zero-crossings must match
    the closed-form values."""
    import numpy as np

    from data_engineering_spark.operators.multimodal import (
        audio_frame_features,
        encode_wav,
    )

    # 8 samples alternating +q/-q → rms = q/32768, zc = 7
    q = 1024
    x = np.array([q, -q] * 4, dtype=np.int16)
    df = spark.createDataFrame([(1, encode_wav(x, 8000))], "media_id long, content binary")
    rows = audio_frame_features(df, frame=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.frame_no == 0
    assert r.zero_crossings == 7
    assert abs(r.rms - q / 32768.0) < 1e-9


def test_image_ahash_robust_to_noise_and_discriminative():
    import numpy as np

    from data_engineering_spark.operators.multimodal import image_ahash

    ys, xs = np.mgrid[0:48, 0:64]
    horiz = ((xs * 4) % 256).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    vert = ((ys * 4) % 256).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    noisy = horiz.copy()
    noisy[0:2, 0:2] = 255  # small corner patch
    h0, h1, hv = image_ahash(horiz), image_ahash(noisy), image_ahash(vert)
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h0, h1) <= 4  # small edit → near hash
    assert ham(h0, hv) >= 16  # orthogonal gradient → far hash


def test_image_near_dup_pairs_finds_planted_twin(spark):
    from data_engineering_spark.queries_extra import _gradient_image_rows
    from data_engineering_spark.operators.multimodal import image_near_dup_pairs

    corpus = spark.createDataFrame(_gradient_image_rows(), "media_id long, content binary")
    pairs = {(r.id_a, r.id_b) for r in image_near_dup_pairs(corpus, max_hamming=6).collect()}
    assert (0, 1000) in pairs  # the byte-perturbed twin
    assert len(pairs) < 15  # distinct gradients overwhelmingly stay apart


def test_lttb_kernel_properties():
    import numpy as np

    from data_engineering_spark.operators.timeseries import lttb

    x = np.arange(500, dtype=np.float64)
    rng = np.random.default_rng(5)
    y = np.sin(x / 20) * 100 + rng.normal(0, 1, 500)
    # plant an extreme spike the downsampler must keep
    y[250] = 10_000.0
    idx = lttb(x, y, 40)
    assert len(idx) == 40
    assert idx[0] == 0 and idx[-1] == 499  # endpoints always kept
    assert (np.diff(idx) > 0).all()  # strictly increasing positions
    assert 250 in idx  # the spike dominates its bucket's triangle
    # identity when k >= n
    assert (lttb(x[:10], y[:10], 20) == np.arange(10)).all()
    # a spike in the LAST interior bucket must also survive (regression:
    # the empty next-bucket slice produced NaN centroids and always kept
    # that bucket's first point)
    y2 = np.zeros(500)
    y2[492] = 1e6
    assert 492 in lttb(x, y2, 40)
    # minimal k: spike anywhere must be the single interior pick
    y3 = np.zeros(100)
    y3[55] = 5.0
    assert list(lttb(np.arange(100, dtype=np.float64), y3, 3)) == [0, 55, 99]


def test_lttb_fixed_agrees_with_float_kernel():
    """The exact-integer kernel must pick the same points as the float
    kernel away from quantization ties: same series (µs x, 1e-6
    fixed-point y vs epoch-seconds/double), same spike, same endpoints.
    Planted spikes dominate their buckets by orders of magnitude, so a
    sub-1e-6 quantization delta can never flip the argmax here."""
    import numpy as np

    from data_engineering_spark.operators.timeseries import lttb, lttb_fixed

    rng = np.random.default_rng(11)
    n = 600
    x_us = (1_700_000_000_000_000 + np.arange(n) * 60_000_000).astype("int64")
    y = np.round(np.sin(np.arange(n) / 15) * 100 + rng.normal(0, 1, n), 3)
    y[311] = 10_000.0
    f_idx = lttb(x_us / 1e6, y, 40)
    i_idx = lttb_fixed(x_us.tolist(), np.floor(y * 1e6 + 0.5).astype("int64").tolist(), 40)
    assert list(f_idx) == list(i_idx)
    assert 311 in i_idx
    # identity branch
    assert lttb_fixed(x_us[:7].tolist(), y[:7].astype("int64").tolist(), 40) == list(range(7))


def test_lttb_downsample_spark_contract(spark, sf_dir):
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.timeseries import lttb_downsample

    ev = load_table(spark, sf_dir, "events")
    out = lttb_downsample(ev, k=50)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.series, []).append(r)
    n_types = ev.select("event_type").distinct().count()
    assert len(per) == n_types
    for series, pts in per.items():
        assert len(pts) == 50
        xs = sorted(p.x_epoch for p in pts)
        assert xs == [p.x_epoch for p in sorted(pts, key=lambda p: p.pos)]
    # k < 3 is a contract violation, not an emit-the-whole-series escape
    # hatch (r11 review)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be >= 3"):
        lttb_downsample(ev, k=2)


def test_sample_frames_null_duration_survives_classified(spark):
    """A video row with NULL duration used to vanish from the frame
    stream entirely (explode over a NULL sequence) — it now survives as
    one classified NULL-frame row (r12 review)."""
    from data_engineering_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    rows = [
        (1, "video", b"payload-a", "video/mp4", None, None, 10000),
        (2, "video", b"payload-b", "video/mp4", None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames(df, every_ms=5000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 2 and all(r.frame_digest for r in by_id[1])
    assert len(by_id[2]) == 1
    assert by_id[2][0].frame_ts_ms is None and by_id[2][0].frame_digest is None


def test_decode_wav_rejects_overrunning_chunk_size(spark):
    """A fmt/data chunk whose declared size overruns the payload must
    raise, not silently decode truncated audio (r12 review)."""
    import struct

    import numpy as np
    import pytest

    from data_engineering_spark.operators.multimodal import decode_wav, encode_wav

    wav = bytearray(encode_wav(np.arange(100, dtype="<i2")))
    # corrupt the data chunk's declared size (bytes 40:44 in the
    # canonical layout) to claim more than the payload holds
    assert wav[36:40] == b"data"
    wav[40:44] = struct.pack("<I", 10_000)
    with pytest.raises(ValueError, match="declares"):
        decode_wav(bytes(wav))
    # untouched payload still round-trips
    sr, x = decode_wav(encode_wav(np.arange(100, dtype="<i2")))
    assert sr == 8000 and len(x) == 100


def test_split_sentences_interleaved_calls_stay_bound(spark):
    """Two split_sentences calls whose ACTIONS run after both plans are
    built must each see their own input — the old fixed temp-view name
    let the second registration rebind the first (un-analyzed) plan to
    the wrong table (r12 nlp review)."""
    from data_engineering_spark.operators.nlp import split_sentences

    a = spark.createDataFrame([(1, "alpha one. alpha two.")], "doc_id long, text string")
    b = spark.createDataFrame([(9, "beta only.")], "doc_id long, text string")
    out_a = split_sentences(a)  # plan built, NOT yet executed
    out_b = split_sentences(b)  # would have clobbered the shared view
    got_a = {r.sentence for r in out_a.collect()}
    got_b = {r.sentence for r in out_b.collect()}
    assert got_a == {"alpha one", "alpha two"}
    assert got_b == {"beta only"}


def test_split_sentences_view_ring(spark):
    """The per-call view names are a bounded RING (r12 advice: a
    long-lived foreachBatch caller grew one catalog entry per
    micro-batch). Wrapping the ring must neither grow the catalog nor
    rebind an earlier result: spark.sql analyzes eagerly, inlining the
    view's plan before split_sentences returns."""
    from data_engineering_spark.operators.nlp import _SPLIT_VIEW_RING, split_sentences

    first_in = spark.createDataFrame([(1, "keep me.")], "doc_id long, text string")
    first = split_sentences(first_in)  # NOT executed until after the wrap
    for i in range(_SPLIT_VIEW_RING + 3):  # wraps the ring past first's slot
        df = spark.createDataFrame([(i, f"filler {i}.")], "doc_id long, text string")
        assert split_sentences(df).count() == 1
    assert {r.sentence for r in first.collect()} == {"keep me"}
    names = [t.name for t in spark.catalog.listTables()
             if t.name.startswith("__split_sentences_in_")]
    assert len(names) <= _SPLIT_VIEW_RING


def test_subword_encode_words_null_word_is_empty_not_crash(spark):
    """A NULL word must segment to an empty token list instead of
    crashing the Arrow worker (len(None)) — the null-safe-by-
    construction class (r13 nlp full pass)."""
    from data_engineering_spark.operators.nlp import subword_encode_words

    words = spark.createDataFrame([("hello",), (None,)], "word string")
    got = {r.word: r.subtokens for r in
           subword_encode_words(words, ["hel", "lo"]).collect()}
    assert got[None] == []
    assert "".join(got["hello"]) == "hello"
