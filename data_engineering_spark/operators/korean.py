"""Korean-aware morphological normalization (UD1 parity layer).

The reference analyzes Korean text with pynori's ``KoreanAnalyzer``
(``TOP/pynori_test.py:4-27``, ``TOP/Keyword.py:95-102``): morphological
decomposition plus a POS filter that keeps content terms (nouns NNG/NNP,
adjectives VA per the commented filter ``pynori_test.py:14-19``). No
Korean analyzer ships in this container, so this module implements the
closest DEPENDENCY-FREE approximation — a deterministic longest-match
stripper for the two highest-signal affix classes:

- **josa (case particles)** glued to nouns: 학교에서 → 학교, 친구를 →
  친구. These are the single biggest term-fragmentation source for
  Korean keyword/TF-IDF scoring: without stripping, 학교 / 학교에서 /
  학교의 count as three different terms.
- **common predicative endings**: 중요합니다 → 중요, 분석하는 → 분석 —
  approximating the analyzer's stem extraction for 하다-verbs.

Guard rails (this is a heuristic, not a morphology model):

- strip at most ONE affix of each class, longest match first;
- single-syllable particles strip only when ≥2 syllables remain
  (가을 stays 가을 — its 을 is part of the word; 학교 + 의 strips);
- multi-syllable particles strip when ≥1 syllable remains;
- non-Hangul tokens pass through untouched.

A real analyzer (pynori, mecab-ko, or an HF tokenizer) slots into
``analyze_korean`` without touching the Spark plumbing — exactly the
same seam ``tokenize_pandas`` documents.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["strip_josa", "analyze_korean", "tokenize_korean_pandas"]

_WORD_RE = re.compile(r"[A-Za-z0-9가-힣]+")
_HANGUL_RE = re.compile(r"[가-힣]")

# Longest-match-first; every entry is a postposition that attaches to a
# preceding noun phrase. Multi-syllable entries are unambiguous enough to
# strip aggressively; single-syllable ones require a 2-syllable stem.
_JOSA = sorted(
    [
        "에서의", "으로써", "으로서", "에게서", "한테서", "으로부터",
        "까지", "부터", "처럼", "조차", "마저", "밖에", "에서", "에게",
        "한테", "께서", "으로", "이나", "이란", "라는", "보다", "하고",
        "에도", "에는", "와의", "과의",
        "은", "는", "이", "가", "을", "를", "의", "에", "도", "만",
        "와", "과", "로", "랑", "나", "든",
    ],
    key=len,
    reverse=True,
)

# Predicative/derivational endings for 하다-class stems (중요합니다 →
# 중요). Longest first; stem must keep ≥1 syllable.
_ENDINGS = sorted(
    [
        "하였습니다", "했습니다", "합니다", "입니다", "됩니다",
        "하는", "하여", "해서", "하고", "하면", "하지", "하다",
        "했다", "한다", "된다", "되는", "이다",
    ],
    key=len,
    reverse=True,
)


def strip_josa(token: str) -> str:
    """Strip one trailing josa (then one predicative ending) from a
    Hangul token, under the stem-length guard rails above."""
    if not _HANGUL_RE.search(token):
        return token
    for e in _ENDINGS:
        if token.endswith(e) and len(token) - len(e) >= 1:
            token = token[: -len(e)]
            break
    for j in _JOSA:
        if token.endswith(j):
            stem = len(token) - len(j)
            if (len(j) >= 2 and stem >= 1) or (len(j) == 1 and stem >= 2):
                token = token[:stem]
            break
    return token


def analyze_korean(text: str) -> list[str]:
    """Tokenize + normalize mixed Korean/Latin text: regex word split,
    lowercase Latin, josa/ending stripping for Hangul tokens. This is
    the body a real ``KoreanAnalyzer.do_analysis`` replaces."""
    if not isinstance(text, str):
        return []
    out = []
    for tok in _WORD_RE.findall(text):
        tok = strip_josa(tok.lower())
        if tok:
            out.append(tok)
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_korean_pandas(texts: pd.Series) -> pd.Series:
    """UD1 — Korean-aware analyzer as an Arrow-batched pandas_udf; the
    drop-in morphological sibling of ``nlp.tokenize_pandas``."""
    return texts.map(analyze_korean)
