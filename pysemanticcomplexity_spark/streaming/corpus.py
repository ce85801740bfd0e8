"""Incremental training-corpus preparation over a document stream.

The batch corpus-prep composition (``E2E_corpus_prep``) translates to
Structured Streaming almost for free because every stage but one is
stateless:

* Gopher quality        — row-local expressions (no state);
* decontamination       — ``contamination_flags_rowlocal`` with
  ``passthrough=True`` (broadcast benchmark set, no state);
* exact dedup           — the ONLY stateful stage, bounded by the
  ``dropDuplicatesWithinWatermark`` horizon (first-arriving row per
  128-bit normalized-text key is kept, matching streaming/dedup.py);
* stratified sampling   — pure filter (no state), AFTER dedup so a
  duplicate group is sampled once, through its representative — not once
  per member (see streaming_corpus_prep's docstring).

At 100 TB/day this is the shape you want: the corpus stream crosses the
pipeline in one pass, and the only distributed state is the dedup horizon.
"""
from __future__ import annotations

from typing import Dict

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.corpus import contamination_flags_rowlocal, stratified_sample
from ..operators.textstats import gopher_metric_exprs
from .dedup import streaming_exact_dedup

__all__ = ["streaming_corpus_prep"]

_FLAG_COLS = ("n_shingles", "n_contaminated", "contamination")


def streaming_corpus_prep(stream: DataFrame, benchmark: DataFrame,
                          fractions: Dict[str, float], *,
                          default_fraction: float = 0.0,
                          contamination_threshold: float = 0.05,
                          n: int = 3, min_words: int = 50,
                          max_words: int = 100_000,
                          ts_col: str = "event_ts",
                          watermark: str = "1 hour",
                          id_col: str = "doc_id", text_col: str = "text",
                          strata_col: str = "source") -> DataFrame:
    """Streaming DataFrame of retained training documents (append mode).

    Semantics vs the batch composition: the text-keyed filters (Gopher
    quality, contamination) are identical — they are properties of the
    text, so every member of a duplicate group passes or fails together.
    The dedup representative differs by necessity: batch ``exact_dedup``
    keeps the min-id row per text key, the stream keeps the first-arriving
    row (the only meaningful definition under unbounded input). The
    stratified sample therefore runs AFTER dedup, on the one surviving
    representative: a duplicate group is retained with probability exactly
    its stratum fraction ``f`` in both engines (the id drawn differs, so
    retained ids agree in distribution and agree exactly at ``f = 1`` —
    what the equality test pins). Sampling BEFORE dedup would retain a
    k-member group whenever ANY member's hash passes — probability
    ``1 - (1-f)^k`` — silently skewing the mix toward duplicated content.
    Cost of correctness: the dedup state horizon sees quality-passing
    traffic instead of sampled traffic (state grows by ~1/f).
    """
    qualified = stream.where(
        gopher_metric_exprs(text_col, min_words, max_words)["passes"])
    flagged = contamination_flags_rowlocal(qualified, benchmark, n=n,
                                           id_col=id_col, text_col=text_col,
                                           passthrough=True)
    clean = (flagged
             .where(F.col("contamination") <= contamination_threshold)
             .drop(*_FLAG_COLS))
    deduped = streaming_exact_dedup(clean, ts_col=ts_col, text_col=text_col,
                                    watermark=watermark)
    return stratified_sample(deduped, fractions, strata_col=strata_col,
                             id_col=id_col,
                             default_fraction=default_fraction)
