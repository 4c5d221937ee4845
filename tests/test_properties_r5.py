"""Property-based tests for the round-5 additions (pure Python — no
SparkSession needed, so these run in milliseconds)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_spark.functions.nl2sql import NLQueryError, compile_nl
from data_engineering_spark.operators.korean import analyze_korean, strip_josa
from data_engineering_spark.operators.multimodal import decode_image, encode_ppm

SCHEMAS = {"orders": ["o_orderkey", "o_totalprice", "o_orderstatus"]}


@settings(max_examples=200, deadline=None)
@given(
    st.integers(1, 32),
    st.integers(1, 32),
    st.integers(0, 2**32 - 1),
)
def test_ppm_roundtrip_is_identity(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(arr)) == arr).all()


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=40))
def test_strip_josa_total_and_never_grows(tok):
    """strip_josa accepts any string, never raises, never lengthens, and
    returns a suffix-removed prefix of its input (it only strips)."""
    out = strip_josa(tok)
    assert len(out) <= len(tok)
    assert tok.startswith(out)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_analyze_korean_total(text):
    """analyze_korean is total over arbitrary text: a list of non-empty
    tokens, each drawn from the word-character class."""
    out = analyze_korean(text)
    assert all(isinstance(t, str) and t for t in out)


_VALUES = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\n\r\x00"),
    min_size=1,
    max_size=20,
).filter(lambda s: s.strip() and "'" not in s)


@settings(max_examples=300, deadline=None)
@given(_VALUES)
def test_nl2sql_contains_always_escapes_wildcards(val):
    """Whatever the user types after 'contains', the compiled LIKE
    pattern wraps it so % and _ match literally — the needle appears
    escaped, and the clause always carries the ESCAPE marker."""
    try:
        sql = compile_nl(f"count orders where o_orderstatus contains {val}", SCHEMAS)
    except NLQueryError:
        return  # the grammar rejected the term — fine, nothing compiled
    assert "ESCAPE '!'" in sql
    # no unescaped wildcard: every % or _ in the pattern is preceded by !
    pat = sql.split("LIKE '%", 1)[1].rsplit("%' ESCAPE", 1)[0]
    i = 0
    while i < len(pat):
        if pat[i] == "!":
            i += 2  # escape pair
            continue
        assert pat[i] not in "%_", (val, sql)
        i += 1


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_nl2sql_never_crashes_unvalidated(req):
    """compile_nl is total: any input either compiles or raises
    NLQueryError — no other exception class escapes."""
    try:
        compile_nl(req, SCHEMAS)
    except NLQueryError:
        pass


@settings(max_examples=150, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 64),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_is_identity(seed, n, sr):
    from data_engineering_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    sr2, back = decode_wav(encode_wav(x, sr))
    assert sr2 == sr
    assert (back == x).all()
