"""Pluggable text-classifier surface (reference N7/U4,
``TFInterface.scala:18-92``).

The reference POSTs to TF-Serving *per row* inside a Scala UDF
(``SparkRunner.scala:101-105``, with a "Not working with multiple texts"
quirk at ``TFInterface.scala:89``) and re-reads the label map from the
classpath per row (``TFInterface.scala:70-71``). The rebuild:

- ``Scorer`` protocol: whole Arrow batch in → ``(n, 50)`` scores out.
  A real model server gets ONE request per batch, not per row.
- ``HashScorer``: deterministic stand-in (md5-derived scores) so tests
  and oracles are stable with no external process.
- The SAME scores are expressible as a native column expression
  (:func:`hash_scores`), so threshold+decode (U4b/U4c) is DuckDB-oracle
  checkable end-to-end.
- Threshold filter + label decode are pure array expressions — and they
  fix the reference's ``indexOf`` duplicate-score bug
  (``TFInterface.scala:63-66``) by carrying positional indices.
"""

from __future__ import annotations

import hashlib
from typing import Protocol

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import ENCODER_CLASSES, SCORE_THRESHOLD

NUM_CLASSES = len(ENCODER_CLASSES)


# ---------------------------------------------------------------------------
# Scorer protocol + deterministic implementation
# ---------------------------------------------------------------------------


class Scorer(Protocol):
    """Batch scorer: len(texts) rows in → (len(texts), NUM_CLASSES) out."""

    def score_batch(self, texts: pd.Series) -> np.ndarray: ...


class HashScorer:
    """Deterministic scorer: score_i = hexdigit_i(md5(t) ++ md5('s'+t)) / 15.

    Matches :func:`hash_scores` bit-for-bit (values are k/15 for k in
    0..15, exactly representable comparisons against the 0.5 threshold).
    """

    def score_batch(self, texts: pd.Series) -> np.ndarray:
        out = np.empty((len(texts), NUM_CLASSES), dtype=np.float64)
        for r, t in enumerate(texts):
            t = t or ""
            h = (
                hashlib.md5(t.encode()).hexdigest()
                + hashlib.md5(("s" + t).encode()).hexdigest()
            )
            out[r] = [int(h[i], 16) / 15.0 for i in range(NUM_CLASSES)]
        return out


class HTTPScorer:
    """TF-Serving REST scorer (reference ``TFInterface.scala:18-42``).

    The reference POSTs ``{"instances": [text]}`` to
    ``/v1/models/<name>:predict`` once PER ROW inside a UDF (and notes
    "Not working with multiple texts" at ``TFInterface.scala:89``). This
    adapter sends the WHOLE Arrow batch as one request —
    ``{"instances": [t0, t1, ...]}`` → ``{"predictions": [[...], ...]}``
    — so a 10k-row batch costs one HTTP round-trip, not 10k.

    ``transport`` is injected for tests: any callable
    ``(url, payload_bytes) -> response_bytes``. The default uses stdlib
    ``urllib`` (no extra dependency); tests pass a stub and never touch
    the network. NULL texts are sent as "" and their score rows replaced
    with NULL downstream by :func:`score_udf`'s NA handling only if the
    model echoes them — callers needing HashScorer-identical NULL
    semantics should keep NULL filtering upstream.
    """

    def __init__(
        self,
        endpoint: str,
        transport=None,
        timeout: float = 30.0,
    ):
        self.endpoint = endpoint
        self.timeout = timeout
        self._transport = transport or self._urllib_transport

    def _urllib_transport(self, url: str, payload: bytes) -> bytes:
        import urllib.request

        req = urllib.request.Request(
            url, data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read()

    def score_batch(self, texts: pd.Series) -> np.ndarray:
        import json

        instances = ["" if pd.isna(t) else str(t) for t in texts]
        payload = json.dumps({"instances": instances}).encode("utf-8")
        raw = self._transport(self.endpoint, payload)
        preds = json.loads(raw)["predictions"]
        if len(preds) != len(instances):
            raise ValueError(
                f"model returned {len(preds)} predictions for "
                f"{len(instances)} instances"
            )
        return np.asarray(preds, dtype=np.float64).reshape(len(instances), -1)


def score_udf(scorer: Scorer):
    """Arrow-batched pandas UDF wrapping any Scorer — the slow-path escape
    hatch for a real model; one scorer call per Arrow batch."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _score(texts: pd.Series) -> pd.Series:
        scores = scorer.score_batch(texts)
        out = list(scores)
        if texts.isna().any():
            # NULL text scores as an all-NULL array — exactly what the
            # native hash_scores twin produces (md5(NULL) is NULL), so
            # both paths threshold-decode NULL rows to no labels
            null_row = [None] * np.shape(scores)[1]
            out = [
                null_row if pd.isna(t) else row for t, row in zip(texts, out)
            ]
        return pd.Series(out)

    return _score


# ---------------------------------------------------------------------------
# Model-backed sentiment through the same Scorer protocol
# ---------------------------------------------------------------------------

SENTIMENT_LABELS = ("neg", "neutral", "pos")


def sentiment_label_udf(scorer: Scorer):
    """Model-backed sentiment: any :class:`Scorer` whose ``score_batch``
    returns ``(n, 3)`` rows over ``(neg, neutral, pos)`` → argmax label.

    This is the reference's declared-but-never-wired pretrained
    sentiment pipeline (``pipelines.scala:10-40``,
    ``PretrainedPipeline("analyze_sentiment")``) re-expressed through the
    batch Scorer protocol — an :class:`HTTPScorer` pointed at a served
    sentiment model drops straight in, one request per Arrow batch. The
    lexicon path (``functions/text.py`` sentiment_score) stays the
    dependency-free, DuckDB-oracled default; this surface exists so a
    REAL model is a constructor argument, not a code change.

    Ties resolve to the LOWEST index (numpy argmax), deterministically.
    NULL text yields a NULL label, matching the lexicon path's
    null-propagation.
    """

    @F.pandas_udf(T.StringType())
    def _label(texts: pd.Series) -> pd.Series:
        scores = scorer.score_batch(texts)
        if np.shape(scores)[1] != len(SENTIMENT_LABELS):
            raise ValueError(
                f"sentiment scorer must emit {len(SENTIMENT_LABELS)} scores, "
                f"got {np.shape(scores)[1]}"
            )
        idx = np.argmax(scores, axis=1)
        out = pd.Series([SENTIMENT_LABELS[i] for i in idx])
        if texts.isna().any():
            out = out.where(~texts.isna().to_numpy(), None)
        return out

    return _label


class LexiconSentimentScorer:
    """Scorer-protocol adapter over the same lexicon arithmetic as
    ``functions/text.py`` sentiment_score — the deterministic stand-in a
    test can run where a served model isn't available, shaped exactly
    like the model scorer (3-way score row per text)."""

    def __init__(self, positive: frozenset[str], negative: frozenset[str]):
        self.positive = positive
        self.negative = negative

    def score_batch(self, texts: pd.Series) -> np.ndarray:
        import re

        # Same token family as functions/text.py tokenize: lower → trim →
        # split on ASCII \s+ (Java/RE2 semantics — Python's default \s
        # would also split NBSP, diverging from the Spark/DuckDB twins),
        # and the same round(...,4) as sentiment_score, applied BEFORE the
        # sign branch so |score| < 5e-5 labels 'neutral' on every engine.
        split = re.compile(r"\s+", re.ASCII).split
        out = np.zeros((len(texts), len(SENTIMENT_LABELS)), dtype=np.float64)
        for r, t in enumerate(texts):
            toks = split(("" if pd.isna(t) else str(t)).lower().strip(" "))
            s = round(
                (
                    sum(w in self.positive for w in toks)
                    - sum(w in self.negative for w in toks)
                )
                / max(len(toks), 1),
                4,
            )
            if s > 0:
                out[r, 2] = s
            elif s < 0:
                out[r, 0] = -s
            else:
                out[r, 1] = 1.0
        return out


# ---------------------------------------------------------------------------
# Native (JVM-side, oracle-checkable) equivalent of HashScorer
# ---------------------------------------------------------------------------


def _hexval(c: Column) -> Column:
    # '0'-'9' → 48-57, 'a'-'f' → 97-102; arithmetic keeps the Catalyst
    # expression tree small (a 16-way CASE × 50 digits stalls codegen)
    a = F.ascii(c)
    return F.when(a <= 57, a - 48).otherwise(a - 87)


def _hexval_sql(c_expr: str) -> str:
    return (
        f"(CASE WHEN ascii({c_expr}) <= 57 THEN ascii({c_expr}) - 48 "
        f"ELSE ascii({c_expr}) - 87 END)"
    )


def hash_scores(text: Column) -> Column:
    """array<double> of NUM_CLASSES deterministic scores in [0, 1].

    The digest pair is bound to a lambda variable via a single-element
    ``transform`` so it's computed ONCE per row — inlining ``h`` into all
    50 score expressions would evaluate 100 md5 calls per row (measured
    ~2× slower; Catalyst doesn't CSE across array element expressions)."""
    h = F.concat(F.md5(text), F.md5(F.concat(F.lit("s"), text)))

    def scores_from(hh: Column) -> Column:
        return F.array(
            *[
                (_hexval(F.substring(hh, i + 1, 1)) / F.lit(15.0))
                for i in range(NUM_CLASSES)
            ]
        )

    return F.element_at(F.transform(F.array(h), scores_from), 1)


def hash_scores_sql(hex_expr: str) -> str:
    """SQL twin; ``hex_expr`` must be a (CTE) column holding
    ``md5(text) || md5('s' || text)``."""
    parts = ", ".join(
        f"{_hexval_sql(f'{hex_expr}[{i + 1}:{i + 1}]')} / 15.0"
        for i in range(NUM_CLASSES)
    )
    return f"[{parts}]"


# ---------------------------------------------------------------------------
# Threshold + decode (U4b/U4c) — positional semantics, bug-fixed
# ---------------------------------------------------------------------------


def label_array() -> Column:
    return F.array(*[F.lit(c) for c in ENCODER_CLASSES])


def decode_categories(scores: Column, threshold: float = SCORE_THRESHOLD) -> Column:
    """Indices whose score exceeds ``threshold`` → label names (sorted
    array for deterministic comparison). Positional — duplicate score
    values decode to their own index, unlike the reference's
    ``preds.indexOf`` (first-match) bug."""
    # zip_with references the (potentially huge) scores expression ONCE;
    # an element_at-per-index formulation would inline it per access and
    # blow up the Catalyst tree (~50× the nodes → minutes of codegen)
    pairs = F.zip_with(
        scores,
        label_array(),
        lambda s, lbl: F.struct(s.alias("s"), lbl.alias("l")),
    )
    kept = F.filter(pairs, lambda p: p["s"] > threshold)
    return F.transform(kept, lambda p: p["l"])


def decode_categories_sql(scores_expr: str, threshold: float = SCORE_THRESHOLD) -> str:
    from ..constants import sql_str_array

    labels = sql_str_array(ENCODER_CLASSES)
    return (
        f"list_transform(list_filter(range(0, {NUM_CLASSES}), "
        f"i -> {scores_expr}[i + 1] > {threshold}), "
        f"i -> {labels}[i + 1])"
    )


class HashRelevanceScorer:
    """Deterministic stand-in CROSS-ENCODER: one relevance logit per
    (query, candidate) pair key, md5-derived — ``int(md5(key)[:8], 16)
    / 0xFFFFFFFF``, a single IEEE division both engines perform
    identically. Swap for an :class:`HTTPScorer` pointed at a served
    cross-encoder; the plumbing (one request per Arrow batch of pair
    keys) is identical — the fake exists so the rerank JOIN/UDF/window
    pipeline is testable and oracled without a model server."""

    def score_batch(self, texts: pd.Series) -> np.ndarray:
        import hashlib

        out = np.full((len(texts), 1), np.nan)
        for i, t in enumerate(texts):
            if pd.isna(t):
                continue
            h = hashlib.md5(str(t).encode()).hexdigest()
            out[i, 0] = int(h[:8], 16) / 0xFFFFFFFF
        return out


def pair_score_udf(scorer: Scorer):
    """Arrow-batched pandas UDF over PAIR KEYS → one double logit per
    row (first column of the scorer's output). The cross-encoder twin
    of :func:`score_udf`: same Scorer protocol, scalar output."""

    @F.pandas_udf(T.DoubleType())
    def _score(keys: pd.Series) -> pd.Series:
        scores = np.asarray(scorer.score_batch(keys), dtype=np.float64)
        return pd.Series(scores.reshape(len(keys), -1)[:, 0])

    return _score
