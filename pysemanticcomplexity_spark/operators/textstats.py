"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure JVM expressions (whole-stage codegen) so
they run at scan speed over 100 TB — deliberately SQL-expressible so every
one has a DuckDB oracle.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["token_count_expr", "language_id", "quality_score", "fingerprint",
           "winnow_fingerprints", "gopher_metric_exprs", "gopher_quality",
           "bpe_token_count", "pii_scrub", "repetition_stats",
           "model_quality_score", "model_margin_expr", "PII_PATTERNS",
           "MODEL_N_BUCKETS", "MODEL_W_A", "MODEL_W_B"]

# tiny built-in stopword lists for the n-gram/stopword language heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
FR_STOPWORDS = ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"]

TOKEN_PATTERN = "[a-z0-9]+"
FINGERPRINT_MOD = 1_000_000_007


def token_count_expr(col) -> F.Column:
    """Regex token count (the SQL-oracle token model; exact Treebank counting
    lives in operators/preprocess.count_words_udf)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), F.lit(0)))


def _stop_ratio(col, stopwords) -> F.Column:
    toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), F.lit(0))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, en_ratio, fr_ratio, lang_pred): stopword-ratio heuristic."""
    en = _stop_ratio(F.col(text_col), EN_STOPWORDS)
    fr = _stop_ratio(F.col(text_col), FR_STOPWORDS)
    pred = (F.when((en >= fr) & (en > 0), F.lit("en"))
            .when(fr > en, F.lit("fr"))
            .otherwise(F.lit("und")))
    return docs.select(F.col(id_col).alias("id"), en.alias("en_ratio"),
                       fr.alias("fr_ratio"), pred.alias("lang_pred"))


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, punct_ratio, stop_ratio, mean_token_len, score).

    score = weighted combination used as a training-data quality filter:
    favors texts with healthy length, some stopwords, low punctuation noise.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_expr(t)
    punct = F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = _stop_ratio(t, EN_STOPWORDS)
    mean_tok = F.when(n_tokens > 0,
                      F.length(F.regexp_replace(F.lower(t), "[^a-z0-9]", ""))
                      / n_tokens).otherwise(F.lit(0.0))
    score = (F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
             + stop_ratio * 0.3
             + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3)
    return docs.select(
        F.col(id_col).alias("id"), n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stop_ratio.cast("double").alias("stop_ratio"),
        mean_tok.cast("double").alias("mean_token_len"),
        score.cast("double").alias("score"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, fp): polynomial rolling hash over characters,
    fp = fold(acc*31 + ascii(ch)) mod 1e9+7 — engine-portable (same integer
    ops give the same value in DuckDB), stays in int64 range."""
    chars = F.split(F.col(text_col), "")
    fp = F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % FINGERPRINT_MOD)
    return docs.select(F.col(id_col).alias("id"), fp.alias("fp"))


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD 2003, the MOSS scheme): hash every character k-gram, slide a
    window of ``w`` consecutive hashes, keep each window's minimum; the
    distinct selected hashes are the document's fingerprints.

    Guarantee: any shared substring of length >= w + k - 1 between two
    documents yields a shared fingerprint, while only ~2/(w+1) of k-grams
    are retained. Everything is JVM-side: the k-gram explode is one
    generator, the window minimum one partial-aggregated window over
    (id, pos) — O(chars) work per document, no Python. Hashing uses the
    portable polynomial family so the DuckDB oracle replicates fingerprints
    exactly. Documents shorter than k + w - 1 chars emit no fingerprints
    (no complete window; documented edge).
    """
    from .dedup import poly_hash_expr

    base = docs.select(F.col(id_col).alias("id"),
                       F.lower(F.col(text_col)).alias("t"))
    npos = F.length("t") - k + 1
    positions = F.when(npos >= 1, F.sequence(F.lit(1), npos)) \
        .otherwise(F.array().cast("array<int>"))
    grams = (base.select("id", "t", F.explode(positions).alias("pos"))
             .select("id", "pos",
                     poly_hash_expr(F.col("t").substr(F.col("pos"), F.lit(k)))
                     .alias("h")))
    win = (Window.partitionBy("id").orderBy("pos")
           .rowsBetween(-(w - 1), 0))
    return (grams.select("id", "pos", F.min("h").over(win).alias("fp"))
            .filter(F.col("pos") >= w)          # complete windows only
            .select("id", "fp").distinct())


def gopher_metric_exprs(text_col: str = "text", min_words: int = 50,
                        max_words: int = 100_000):
    """The Gopher metric/verdict expressions as an ordered dict of Columns
    (row-local, so also legal mid-stream); ``gopher_quality`` is the batch
    projection over them."""
    t = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(t), F.lit(TOKEN_PATTERN), F.lit(0))
    n = F.size(toks).cast("long")
    nd = n.cast("double")
    mean_len = F.when(n > 0, F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x)).cast("double") / nd)
    hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipses = F.regexp_count(t, F.lit(r"\.\.\."))
    symbol_ratio = F.when(n > 0, (hashes + ellipses).cast("double") / nd)
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("double")
    bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^[ \t]*[-*]")))
    ell_end = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.[ \t]*$")))
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    alpha_frac = F.when(n > 0, alpha.cast("double") / nd)
    stops = F.size(F.filter(
        F.array(*[F.lit(s) for s in EN_STOPWORDS]),
        lambda s: F.array_contains(toks, s))).cast("long")
    m = {
        "n_words": n,
        "mean_word_len": mean_len,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet.cast("double") / n_lines,
        "ellipsis_line_frac": ell_end.cast("double") / n_lines,
        "alpha_word_frac": alpha_frac,
        "n_stopwords_present": stops,
    }
    passes = ((m["n_words"] >= min_words) & (m["n_words"] <= max_words)
              & (m["mean_word_len"] >= 3) & (m["mean_word_len"] <= 10)
              & (m["symbol_ratio"] < 0.1)
              & (m["bullet_line_frac"] < 0.9)
              & (m["ellipsis_line_frac"] < 0.3)
              & (m["alpha_word_frac"] > 0.8)
              & (m["n_stopwords_present"] >= 2))
    m["passes"] = F.coalesce(passes, F.lit(False))
    return m


def gopher_quality(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """Gopher-style document-quality heuristics (Rae et al. 2021, the
    standard web-corpus pretraining filter set), one row per doc:

    * n_words, mean_word_len     — token model = lowercased [a-z0-9]+ runs
    * symbol_ratio               — (#'#' + #'...') / words
    * bullet_line_frac           — lines starting with '-' or '*'
    * ellipsis_line_frac         — lines ending with '...'
    * alpha_word_frac            — tokens containing at least one letter
    * n_stopwords_present        — distinct built-in stopwords seen
    * passes                     — the conjunction of the Gopher bounds:
      min_words<=n<=max_words, 3<=mean_word_len<=10, symbol_ratio<0.1,
      bullet_line_frac<0.9, ellipsis_line_frac<0.3, alpha_word_frac>0.8,
      n_stopwords_present>=2

    Pure JVM expressions (scan-speed at 100 TB) and fully SQL-expressible —
    oracled as QF1_gopher_quality.
    """
    m = gopher_metric_exprs(text_col, min_words, max_words)
    return docs.select(F.col(id_col).alias("id"),
                       *[expr.alias(name) for name, expr in m.items()])


# GPT-2-style pre-tokenizer pattern, restricted to RE2-compatible constructs
# (no lookahead — RE2/DuckDB rejects it) and ASCII classes (cross-engine
# \p{L} semantics differ at the margins). Contractions, space-prefixed
# word/number runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_token_count(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, n_bpe_tokens, n_ws_tokens, tokens_per_word): BPE-ish pre-token
    count (the usual LLM-training cost proxy) next to the whitespace count;
    tokens_per_word ~ how sub-word-heavy the text is. Pure JVM regex —
    scan-speed, SQL-oracled (T5)."""
    t = F.col(text_col)
    bpe = F.size(F.filter(
        F.regexp_extract_all(t, F.lit(BPE_PATTERN), F.lit(0)),
        lambda x: ~x.rlike(r"^\s+$")))        # whitespace runs aren't tokens
    ws = F.size(F.regexp_extract_all(F.lower(t), F.lit(TOKEN_PATTERN),
                                     F.lit(0)))
    return docs.select(
        F.col(id_col).alias("id"),
        bpe.cast("long").alias("n_bpe_tokens"),
        ws.cast("long").alias("n_ws_tokens"),
        F.when(ws > 0, bpe.cast("double") / ws).alias("tokens_per_word"))


# PII patterns, deliberately RE2-compatible (no lookaround, ASCII classes)
# so the DuckDB oracle runs the IDENTICAL expressions. Scrub order is part
# of the contract: email first (an address contains digit runs a later
# pattern could half-eat), then SSN, then phone, then IPv4.
PII_PATTERNS = [
    # bounded quantifiers, not +: the local-part class contains digits,
    # dots, + and -, so an unbounded prefix made every start position in
    # an adversarial run ("+1-"*n, "1."*n) eat O(n) before failing at @ —
    # O(n^2) under Java's backtracking engine (~50 h for one crafted 1 MB
    # doc).  RFC 5321 caps the local part at 64 and the domain at 255, so
    # the bounds are semantics-preserving for every valid address and cap
    # per-position work at a constant; an over-long local part redacts
    # only its RFC-valid tail (the leaked prefix is not a valid address).
    ("email", r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # optional +CC prefix matched for real (a '+' after whitespace has no
    # \b before it, so \b\+? never engaged — ADVICE r3); 1-3 digit country
    # codes (+1 ... +998 — ADVICE r4 caught +353/+971 leaking); RE2-safe
    ("phone", r"(\+\d{1,3}[-. ])?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, text, n_email, n_ssn, n_phone, n_ipv4, n_pii): redact the
    standard PII classes with typed placeholders and count what was
    removed — the scrub stage every distribution-grade corpus needs.

    Each class is counted on the RUNNING text (after earlier classes were
    replaced) and then replaced, so a span is counted by exactly the class
    that redacts it — n_pii equals the number of placeholders emitted
    (e.g. a phone-shaped digit run inside an email address counts once,
    as email). Pure JVM regexes (RE2-compatible, mirrored verbatim by the
    SQL oracle, same sequential order) — scan-speed, no shuffle, and
    row-local, so also legal mid-stream.
    """
    counts = {}
    scrubbed = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        counts[name] = F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    total = None
    for name, _p, _r in PII_PATTERNS:
        total = counts[name] if total is None else total + counts[name]
    return docs.select(
        F.col(id_col).alias("id"),
        scrubbed.alias("text"),
        *[counts[name].cast("long").alias(f"n_{name}")
          for name, _p, _r in PII_PATTERNS],
        total.cast("long").alias("n_pii"))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.3), one row per
    doc: (id, n_lines, dup_line_frac, top_2gram_count, top_2gram_frac).

    * dup_line_frac   — fraction of lines that are repeats of an earlier
      line: 1 - distinct/total over trimmed non-empty lines;
    * top_2gram_frac  — characters covered by the most frequent word
      2-gram (count * len) / total word characters; the classic boilerplate
      detector. Most-frequent ties break to the lexicographically LARGEST
      2-gram (max over a (count, gram) struct == ORDER BY cnt DESC, gram
      DESC LIMIT 1 in the oracle) so the statistic is deterministic
      cross-engine. Occurrences overlap ("x x x x" has three "x x"), so
      the fraction can exceed 1 for degenerate repetition — still a valid
      monotone filter signal; threshold accordingly.

    The line part is pure array expressions; the 2-gram mode needs a
    per-doc explode + count (map-side combinable, keyed by id — one
    shuffle of (id, gram) pairs).
    """
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0)
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines) \
        .otherwise(0.0)
    toks = F.regexp_extract_all(F.lower(t), F.lit(TOKEN_PATTERN), F.lit(0))
    # EVERY expensive expression (the char-count fold, the 2-gram array)
    # is materialized as a column in the projection BELOW the explode.
    # A non-attribute expression in the same select as a generator lands
    # in the Project ABOVE the Generate and is re-evaluated once per
    # OUTPUT row — the fold over n tokens ran n times, O(n^2): 240 s for
    # ONE 150 KB doc of repeated tokens, where this shape takes 0.3 s.
    base = docs.select(
        F.col(id_col).alias("id"),
        n_lines.cast("long").alias("n_lines"),
        dup_frac.cast("double").alias("dup_line_frac"),
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).alias("total_chars"),
        F.when(F.size(toks) >= 2,
               F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                          F.slice(toks, 2, F.size(toks) - 1),
                          lambda a, b: F.concat_ws(" ", a, b)))
         .otherwise(F.array().cast("array<string>")).alias("_two"))
    grams = base.select(
        "id", "n_lines", "dup_line_frac", "total_chars",
        F.explode_outer("_two").alias("gram"))
    counted = (grams.groupBy("id", "n_lines", "dup_line_frac",
                             "total_chars", "gram")
               .agg(F.count(F.lit(1)).alias("cnt")))
    top = (counted.groupBy("id", "n_lines", "dup_line_frac", "total_chars")
           .agg(F.max(F.when(F.col("gram").isNotNull(),
                             F.struct("cnt", F.col("gram").alias("g"))))
                .alias("_top")))
    gram_chars = (F.length(F.col("_top.g"))
                  - 1)                     # minus the joining space
    return top.select(
        "id", "n_lines", "dup_line_frac",
        F.coalesce(F.col("_top.cnt"), F.lit(0)).cast("long")
         .alias("top_2gram_count"),
        F.when((F.col("total_chars") > 0) & F.col("_top").isNotNull(),
               (F.col("_top.cnt") * gram_chars).cast("double")
               / F.col("total_chars"))
         .otherwise(0.0).cast("double").alias("top_2gram_frac"))


# ---------------------------------------------------------------------------
# model-based quality scoring (fastText-style linear classifier)
# ---------------------------------------------------------------------------

# hashed-feature model geometry shared with the SQL oracle: feature bucket =
# poly(token) % MODEL_N_BUCKETS; integer weight of bucket b is
# (MODEL_W_A * b + MODEL_W_B) % FINGERPRINT_MOD, centered to [-1, 1) only in
# the final margin expression so every aggregate stays an exact int64 sum.
MODEL_N_BUCKETS = 4096
MODEL_W_A = 1_000_003
MODEL_W_B = 998_244_353


def model_weights_int():
    """The dense int64 weight table (one row per hash bucket). Deterministic
    seeded weights stand in for trained parameters so the scorer is
    DuckDB-expressible; a real deployment loads a trained vector instead —
    the execution shape (broadcast table + Arrow-batched gather) is the
    production part."""
    import numpy as np
    idx = np.arange(MODEL_N_BUCKETS, dtype=np.int64)
    return (MODEL_W_A * idx + MODEL_W_B) % FINGERPRINT_MOD


def _poly_expr(col) -> F.Column:
    return F.aggregate(F.split(col, ""), F.lit(0).cast("long"),
                       lambda acc, ch: (acc * 31 + F.ascii(ch))
                       % FINGERPRINT_MOD)


def _bucket_expr(text_col: str) -> F.Column:
    """The model's hashed unigram+bigram feature-bucket array as one
    Column — shared by :func:`model_margin_expr` and
    :func:`model_quality_score`.

    Round-6 shape: ONE char fold per token, producing the pair
    ``(h, w) = (poly(tok), 31^len(tok) mod p)``; each bigram hash then
    composes in O(1) from its two tokens' pairs via the fold identity

        poly(a || ' ' || b) = ((poly(a)*31 + 32) % p * 31^len(b)
                               + poly(b)) % p

    (32 = ascii(' ')). The previous formulation re-folded every
    character ~3x — once for its unigram and once per adjacent bigram,
    through an allocated concat string. All intermediates stay inside
    int64 ((x%p)*(w<p) < 1e18); bucket values are bit-identical
    (pytest-asserted against a per-token reference and pinned by the
    QF4/E2E oracles).

    The (h, w) array is BOUND ONCE per row through a single-element
    ``transform`` lambda: referenced inline, interpreted evaluation
    would recompute the whole per-token fold array for every bigram
    index (O(tokens^2) per document — observed as a task pinned for
    minutes); as a lambda variable each ``element_at`` is an O(1)
    array access."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_PATTERN), F.lit(0))
    hp = F.transform(toks, lambda t: F.aggregate(
        F.split(t, ""),
        F.struct(F.lit(0).cast("long").alias("h"),
                 F.lit(1).cast("long").alias("w")),
        lambda acc, ch: F.struct(
            ((acc["h"] * 31 + F.ascii(ch)) % FINGERPRINT_MOD).alias("h"),
            ((acc["w"] * 31) % FINGERPRINT_MOD).alias("w"))))

    def from_hp(arr):
        n = F.size(arr)
        uni = F.transform(arr, lambda s: s["h"] % MODEL_N_BUCKETS)
        bi = (F.when(n >= 2, F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: ((((F.element_at(arr, i)["h"] * 31 + 32)
                             % FINGERPRINT_MOD)
                            * F.element_at(arr, i + 1)["w"]
                            + F.element_at(arr, i + 1)["h"])
                           % FINGERPRINT_MOD) % MODEL_N_BUCKETS))
              .otherwise(F.array().cast("array<bigint>")))
        return F.concat(uni, bi)

    return F.get(F.transform(F.array(hp), from_hp), 0)


def model_margin_expr(text_col: str = "text") -> F.Column:
    """The hashed-linear model's raw margin as ONE pure-JVM Column (the
    'expr' kernel inlined; NULL for token-less documents) — the form a
    fused single-scan pipeline filter needs. Identical value to
    model_quality_score(...)['margin'] before rounding.

    The bucket array is bound once through the single-element
    ``transform`` idiom (see :func:`_bucket_expr`): referenced twice
    (logit fold + size), an inlined array would be rebuilt twice per
    row under interpreted evaluation."""

    def margin_of(b):
        logit = F.aggregate(
            b, F.lit(0).cast("long"),
            lambda acc, x: acc + (F.lit(MODEL_W_A) * x + F.lit(MODEL_W_B))
            % F.lit(FINGERPRINT_MOD))
        n_feats = F.size(b)
        return F.when(n_feats > 0,
                      logit.cast("double") / n_feats
                      / F.lit(float(FINGERPRINT_MOD)) * 2.0 - 1.0)

    return F.get(F.transform(F.array(_bucket_expr(text_col)), margin_of), 0)


def model_quality_score(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        kernel: str = "expr") -> DataFrame:
    """fastText-shaped model quality scorer (Joulin et al. 2016; the CCNet /
    LLaMA "quality model" filter stage): hashed unigram+bigram features, one
    dense-weight gather + sum per document, logistic output.

    Returns (id, n_feats, logit_sum, margin, prob, mq_pass) where
    ``logit_sum`` is the exact integer sum of bucket weights,
    ``margin = (logit_sum / n_feats) / MOD * 2 - 1`` in [-1, 1),
    ``prob = sigmoid(4 * margin)`` and ``mq_pass`` compares integers only
    (2*logit_sum > n_feats*MOD), so the keep decision is bit-exact across
    engines even though prob involves exp().

    Scale shape: tokenization and feature hashing stay JVM-side (nested
    higher-order expressions). ``kernel`` picks the weight application:
    ``'expr'`` (default) exploits the affine seeded weights to fold the
    lookup into pure JVM arithmetic — zero Python, zero Arrow transfer;
    ``'gather'`` is the shape a REAL trained weight vector needs — the
    numpy table broadcast to every executor and applied in an
    Arrow-batched pandas UDF as ONE vectorized gather+segmented-sum per
    batch (np.bincount over the flattened bucket ids), no per-row Python
    loop. Both kernels are bit-identical (pytest-asserted). No shuffle
    anywhere: the operator is a scan-side map, legal mid-stream.
    """
    if kernel not in ("expr", "gather"):
        raise ValueError(f"kernel must be 'expr' or 'gather', got {kernel!r}")
    feats = docs.select(F.col(id_col).alias("id"),
                        _bucket_expr(text_col).alias("_buckets"))

    if kernel == "expr":
        # the weights are affine in the bucket id, so the dense-table
        # lookup collapses to arithmetic INSIDE the JVM fold: no Arrow
        # transfer of the (2 x tokens)-long bucket arrays at all. Measured
        # 2.5-3 s/5k docs cheaper than shipping buckets to python at sf0.1;
        # bit-identical output (pytest-asserted against the gather kernel).
        logit = F.aggregate(
            "_buckets", F.lit(0).cast("long"),
            lambda acc, b: acc + (F.lit(MODEL_W_A) * b + F.lit(MODEL_W_B))
            % F.lit(FINGERPRINT_MOD))
        scored = feats.select(
            "id", F.size("_buckets").cast("long").alias("n_feats"),
            logit.alias("logit_sum"))
    else:
        # the general shape for ARBITRARY trained weights (no closed
        # form): broadcast dense table + one vectorized gather +
        # bincount segmented-sum per Arrow batch, no per-row Python
        import numpy as np
        import pandas as pd

        weights = model_weights_int()
        bc = docs.sparkSession.sparkContext.broadcast(weights)

        @F.pandas_udf("long")
        def gather_sum(buckets):
            w = bc.value
            flat = np.concatenate([np.asarray(b, dtype=np.int64)
                                   for b in buckets]) if len(buckets) else \
                np.empty(0, dtype=np.int64)
            lens = np.fromiter((len(b) for b in buckets), dtype=np.int64,
                               count=len(buckets))
            row_idx = np.repeat(np.arange(len(buckets)), lens)
            # int64 weight values fit float64 exactly (< 2^30), and per-doc
            # sums stay < 2^53, so the bincount accumulation is exact
            sums = np.bincount(row_idx, weights=w[flat].astype(np.float64),
                               minlength=len(buckets))
            return pd.Series(sums.astype(np.int64))

        scored = feats.select(
            "id", F.size("_buckets").cast("long").alias("n_feats"),
            gather_sum("_buckets").alias("logit_sum"))
    margin = (F.col("logit_sum").cast("double") / F.col("n_feats")
              / F.lit(float(FINGERPRINT_MOD)) * 2.0 - 1.0)
    prob = 1.0 / (1.0 + F.exp(-4.0 * margin))
    return scored.select(
        "id", "n_feats", "logit_sum",
        F.when(F.col("n_feats") > 0, margin).cast("double").alias("margin"),
        F.when(F.col("n_feats") > 0, prob).cast("double").alias("prob"),
        F.when(F.col("n_feats") > 0,
               2 * F.col("logit_sum") > F.col("n_feats")
               * F.lit(FINGERPRINT_MOD))
         .otherwise(F.lit(False)).alias("mq_pass"))
