"""Shared vocabulary constants.

These feed BOTH the Spark column expressions and the generated DuckDB
oracle SQL, so the two sides are guaranteed to agree on every literal.

The reference hardcodes French stopwords regardless of its ``language``
CLI arg (``pipelines.scala:20-23,52-55``; arg plumbed but unused at
``SparkRunner.scala:18``) -- a latent bug. The rebuild keys stopword
lists by language. It also bundles a 50-class label dictionary
(``src/main/resources/encoder_classes.json:1-52``) and a hand-curated
outlier-label list (``ProcessingWorkSheet.sc:55-69``); we mirror the
*shapes* (50 labels, a 13-entry outlier list) with our own values.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Stopwords (compact, deterministic; keyed by language — fixes the
# reference's hardcoded-French bug noted in SURVEY §2.9 N3)
# ---------------------------------------------------------------------------

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
        "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
        "to", "was", "were", "will", "with",
    ),
    "fr": (
        "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du",
        "elle", "en", "et", "eux", "il", "je", "la", "le", "les", "leur",
        "lui", "ma", "mais", "me", "même", "mes", "moi", "mon", "ne",
        "nos", "notre", "nous", "on", "ou", "par", "pas", "pour", "qu",
        "que", "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes",
        "toi", "ton", "tu", "un", "une", "vos", "votre", "vous",
    ),
}

# default language for the document corpus queries (reference default was
# implicitly French; the synthetic corpus is English-ish)
DEFAULT_LANG = "en"

# wordcount keeps words strictly longer than this (reference:
# ``SparkRunner.scala:125`` ``filter(_.length > 3)``)
MIN_WORD_LENGTH = 3

# training prep keeps texts strictly longer than this (reference:
# ``ProcessingWorkSheet.sc:95`` ``length($"text") > 50``)
MIN_TEXT_LENGTH = 50

# training prep keeps the top-K labels (reference:
# ``ProcessingWorkSheet.sc:102,112`` ``maxLabels = 100``)
TOP_K_LABELS = 100

# classifier score threshold (reference: ``TFInterface.scala:74``)
SCORE_THRESHOLD = 0.5

# ---------------------------------------------------------------------------
# Classifier label space: 50 classes, mirroring the shape of the
# reference's ``encoder_classes.json`` (50 French Wikipedia categories).
# ---------------------------------------------------------------------------

ENCODER_CLASSES: tuple[str, ...] = tuple(f"cat_{i:02d}" for i in range(50))

# ---------------------------------------------------------------------------
# Outlier labels removed during training prep (reference shape: 13
# hand-curated labels, ``ProcessingWorkSheet.sc:55-69``). Ours are keyed
# to the synthetic corpus's `source`/`lang` label space.
# ---------------------------------------------------------------------------

OUTLIER_LABELS: tuple[str, ...] = (
    "src0", "src1", "zh", "spam", "adult", "boilerplate", "stub",
    "redirect", "disambiguation", "meta", "talk", "draft", "sandbox",
)

# ---------------------------------------------------------------------------
# Sentiment lexicon (N6 extension — the reference declares but never wires
# a sentiment pipeline, ``pipelines.scala:10-40``). Deterministic compact
# lexicon over the synthetic vocab + generic words.
# ---------------------------------------------------------------------------

SENTIMENT_POSITIVE: tuple[str, ...] = (
    "fast", "small", "good", "great", "win", "best", "nice", "love",
)
SENTIMENT_NEGATIVE: tuple[str, ...] = (
    "slow", "big", "bad", "worst", "fail", "bug", "hate", "broken",
)

# ---------------------------------------------------------------------------
# Language-ID marker words (n-gram-free heuristic: score = number of
# distinct marker hits; argmax with fixed tie order). Deterministic on the
# synthetic corpus.
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "order", "fast"),
    "fr": ("le", "la", "et", "merge", "vector"),
    "de": ("der", "die", "und", "hash", "window"),
    "es": ("el", "los", "que", "scan", "batch"),
    "zh": ("zh", "dup", "stream", "column", "spark"),
}
LANG_ORDER: tuple[str, ...] = ("en", "fr", "de", "es", "zh")

# ---------------------------------------------------------------------------
# SQL literal helpers (used by the oracle generators)
# ---------------------------------------------------------------------------


def sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_str_list(xs) -> str:
    """Render a python string sequence as a SQL list: 'a','b','c'."""
    return ", ".join(sql_quote(x) for x in xs)


def sql_str_array(xs) -> str:
    """Render as a DuckDB list literal: ['a','b','c']."""
    return "[" + sql_str_list(xs) + "]"
