"""Korean-aware morphological normalization (UD1 parity layer).

The reference analyzes Korean text with pynori's ``KoreanAnalyzer``
(``Talent_Opportunity_Platform/pynori_test.py:4-27``,
``Talent_Opportunity_Platform/Keyword.py:95-102``): dictionary-driven
morphological decomposition whose ``do_analysis`` returns parallel
``termAtt``/``posTagAtt`` lists, with a commented POS filter that keeps
content terms (nouns NNG/NNP, adjectives VA — ``pynori_test.py:14-19``).
No Korean analyzer ships in this container, so this module implements the
closest DEPENDENCY-FREE approximation as a two-layer hybrid:

1. **surface→lemma dictionary** (``fixtures/korean_lemmas.tsv``, loaded
   once at import): the irregular-conjugation classes a suffix stripper
   cannot reach because the stem itself mutates — ㅂ-irregular (어려운 →
   어렵), 르-irregular (몰라 → 모르), ㄷ/ㅅ/ㅎ-irregular, 으-deletion and
   vowel contraction (썼다 → 쓰), plus high-frequency contracted verb
   forms (했어요 → 하, 됐습니다 → 되). Public-knowledge Korean
   morphology shipped as data, matching the dictionary-analyzer *shape*
   of the reference. Whole-token longest-match first; the table also
   re-checks the stem after an ending/josa strip.
2. **deterministic longest-match stripper** (the round-3 layer) for the
   regular affix classes, extended this round:

   - **josa (case particles)** glued to nouns, now including stacked
     forms (학교에서는 → 학교): the single biggest term-fragmentation
     source for keyword/TF-IDF scoring.
   - **predicative endings**, split into the 하다-class (중요합니다 →
     중요, stem is a noun → NNG) and general conjugations (없습니다 →
     없, 받았다 → 받, stem is predicative → VV).

Guard rails (layer 2 is a heuristic, not a morphology model):

- strip at most ONE ending then ONE josa, longest match first;
- single-syllable particles strip only when ≥2 syllables remain
  (가을 stays 가을 — its 을 is part of the word; 학교 + 의 strips);
- multi-syllable particles/endings strip when ≥1 syllable remains;
- non-Hangul tokens pass through untouched (SL/SN tags).

``analyze_korean_tagged`` mirrors pynori's ``do_analysis`` output shape
(``{"termAtt": [...], "posTagAtt": [...]}``) so the reference's
``_filter`` idiom ports verbatim; ``analyze_korean(pos_keep={"NNG",
"NNP", "VA"})`` is that filter. A real analyzer (pynori, mecab-ko) slots
into ``analyze_korean_tagged`` without touching the Spark plumbing —
exactly the same seam ``tokenize_pandas`` documents.
"""

from __future__ import annotations

import os
import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "strip_josa",
    "analyze_korean",
    "analyze_korean_tagged",
    "tokenize_korean_pandas",
]

_WORD_RE = re.compile(r"[A-Za-z0-9가-힣]+")
_HANGUL_RE = re.compile(r"[가-힣]")
_NUM_RE = re.compile(r"[0-9]+")

# Longest-match-first; every entry is a postposition that attaches to a
# preceding noun phrase. Multi-syllable entries are unambiguous enough to
# strip aggressively; single-syllable ones require a 2-syllable stem.
_JOSA = sorted(
    [
        "에서의", "으로써", "으로서", "에게서", "한테서", "으로부터",
        "까지", "부터", "처럼", "조차", "마저", "밖에", "에서", "에게",
        "한테", "께서", "으로", "이나", "이란", "라는", "보다", "하고",
        "에도", "에는", "와의", "과의",
        # stacked/compound particles (round 7): particle + topic/additive
        "에서는", "에서도", "에서만", "에게는", "에게도", "으로는",
        "으로도", "으로만", "까지는", "까지도", "부터는", "와는", "과는",
        "이라는", "이라고", "라고",
        "은", "는", "이", "가", "을", "를", "의", "에", "도", "만",
        "와", "과", "로", "랑", "나", "든",
    ],
    key=len,
    reverse=True,
)

# Particle stacks whose FIRST syllable is itself a common noun ending
# (plural 들, delimiter 만): many high-frequency nouns end in 들/만
# (아들 son, 하늘들 …, 자만 …), so these strip only under the strict
# ≥2-syllable-stem guard that protects single-syllable particles —
# aggressive multi-syllable stripping would turn 아들이 into 아.
_JOSA_NOUNY = sorted(
    [
        "들이", "들을", "들은", "들의", "들도", "들과", "들에게",
        "만의", "만을", "만이", "만은",
    ],
    key=len,
    reverse=True,
)

# (particle, min_stem_syllables, fall_through) merged longest-first:
# nouny stacks keep the strict ≥2 guard and FALL THROUGH to shorter
# particles when it fails (아들이 → guard blocks 들이 → plain 이 strips
# → 아들); plain multi-syllable particles strip with ≥1 and
# single-syllable ones require ≥2 (가을 stays whole), both terminal on
# a match as before.
_JOSA_GUARDED = sorted(
    [(j, 2, True) for j in _JOSA_NOUNY]
    + [(j, 1 if len(j) >= 2 else 2, False) for j in _JOSA],
    key=lambda t: len(t[0]),
    reverse=True,
)

# Predicative/derivational endings. The 하다-class leaves a NOMINAL stem
# (분석하는 → 분석: the stem of a 하다-verb is a noun), the general class
# leaves a predicative stem (없습니다 → 없). Stem must keep ≥1 syllable.
_ENDINGS_HADA = [
    "하였습니다", "했습니다", "합니다", "입니다", "됩니다",
    "하는", "하여", "해서", "하고", "하면", "하지", "하다",
    "했다", "한다", "된다", "되는", "이다",
]
_ENDINGS_GENERAL = [
    "었습니다", "았습니다", "였습니다", "습니다",
    "었다", "았다", "였다", "이에요", "에요", "어요", "아요",
    "네요", "세요", "십시오",
]
# (ending, stem POS) merged longest-first so 했습니다 beats 습니다.
_ENDINGS_TAGGED = sorted(
    [(e, "NNG") for e in _ENDINGS_HADA] + [(e, "VV") for e in _ENDINGS_GENERAL],
    key=lambda t: len(t[0]),
    reverse=True,
)
# Surface-only view, for strip_josa's public contract.
_ENDINGS = [e for e, _ in _ENDINGS_TAGGED]


def _load_lemmas() -> dict[str, tuple[str, str]]:
    path = os.path.join(os.path.dirname(__file__), "..", "fixtures", "korean_lemmas.tsv")
    table: dict[str, tuple[str, str]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            surface, lemma, pos = line.split("\t")
            table[surface] = (lemma, pos)
    return table


# Loaded once at import on the driver; pandas_udf closures capture the
# dict itself (not the file path), so executors never read the fixture.
_LEMMAS = _load_lemmas()


def strip_josa(token: str) -> str:
    """Strip one trailing predicative ending, then one josa, from a
    Hangul token under the stem-length guard rails above. Surface-only
    (no dictionary) — the layer-2 fallback, kept as a public primitive."""
    if not _HANGUL_RE.search(token):
        return token
    for e in _ENDINGS:
        if token.endswith(e) and len(token) - len(e) >= 1:
            token = token[: -len(e)]
            break
    for j, min_stem, fall_through in _JOSA_GUARDED:
        if token.endswith(j):
            stem = len(token) - len(j)
            if stem >= min_stem:
                token = token[:stem]
                break
            if not fall_through:
                break
    return token


def _analyze_hangul(tok: str) -> list[tuple[str, str]]:
    """One Hangul token → [(term, pos), ...]: dictionary first (the
    irregular forms), then ending strip, then josa strip, re-checking
    the dictionary after each strip so 몰랐다의-style stacks resolve."""
    hit = _LEMMAS.get(tok)
    if hit is not None:
        return [hit]
    for e, cls in _ENDINGS_TAGGED:
        if tok.endswith(e) and len(tok) - len(e) >= 1:
            stem = tok[: -len(e)]
            lem = _LEMMAS.get(stem)
            return [lem if lem is not None else (stem, cls), (e, "E")]
    for j, min_stem, fall_through in _JOSA_GUARDED:
        if tok.endswith(j):
            n = len(tok) - len(j)
            if n >= min_stem:
                stem = tok[:n]
                lem = _LEMMAS.get(stem)
                return [lem if lem is not None else (stem, "NNG"), (j, "J")]
            if not fall_through:
                break
    return [(tok, "NNG")]


def analyze_korean_tagged(text: str) -> dict[str, list[str]]:
    """Tokenize + tag mixed Korean/Latin text in pynori's
    ``do_analysis`` output shape: parallel ``termAtt``/``posTagAtt``
    lists, particles tagged J and endings E (``pos_filter=False``
    behavior, minus punctuation — the regex tokenizer drops it)."""
    terms: list[str] = []
    tags: list[str] = []
    if isinstance(text, str):
        for tok in _WORD_RE.findall(text):
            if _HANGUL_RE.search(tok):
                # lower() is a no-op on Hangul but normalizes the Latin
                # half of mixed tokens (IT업계 → it업계), keeping case
                # variants of the same term unified like the SL branch
                pairs = _analyze_hangul(tok.lower())
            elif _NUM_RE.fullmatch(tok):
                pairs = [(tok, "SN")]
            else:
                pairs = [(tok.lower(), "SL")]
            for term, pos in pairs:
                terms.append(term)
                tags.append(pos)
    return {"termAtt": terms, "posTagAtt": tags}


def analyze_korean(text: str, pos_keep: set[str] | None = None) -> list[str]:
    """Content terms of *text*: the reference's ``_filter`` idiom over
    ``analyze_korean_tagged``. Default keeps every content tag (drops
    only particles J and endings E — the historical contract); pass
    ``pos_keep={"NNG", "NNP", "VA"}`` for pynori_test.py's commented
    noun/adjective filter."""
    analyzed = analyze_korean_tagged(text)
    return [
        term
        for term, pos in zip(analyzed["termAtt"], analyzed["posTagAtt"])
        if term and (pos not in ("J", "E") if pos_keep is None else pos in pos_keep)
    ]


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_korean_pandas(texts: pd.Series) -> pd.Series:
    """UD1 — Korean-aware analyzer as an Arrow-batched pandas_udf; the
    drop-in morphological sibling of ``nlp.tokenize_pandas``."""
    return texts.map(analyze_korean)
