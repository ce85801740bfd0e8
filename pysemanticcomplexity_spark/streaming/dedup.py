"""Streaming exact deduplication over a pages/documents stream.

A 10^12-document crawl arrives incrementally; exact dedup must happen
online, not as a batch afterthought. Two shapes:

* ``streaming_exact_dedup`` — first-seen-wins row filter keyed by the
  normalized-text hash, using ``dropDuplicatesWithinWatermark``: state for a
  key is kept only within the event-time watermark, so state size is bounded
  by the dedup horizon (duplicates in a web crawl cluster in time — recrawls
  / mirror bursts), not by corpus size. The key is the same 128-bit
  composite hash (two seeded xxhash64 halves) as the batch
  ``operators/dedup.exact_dedup`` — one 64-bit key silently false-merges
  at trillion-doc scale (see dedup.exact_key_cols).
* ``streaming_dup_counts`` — per-key duplicate counters via a stateful
  ``applyInPandasWithState`` operator (custom state: count + first id),
  emitting updated (text_key, n_seen, keep_id) rows each batch — the
  streaming analogue of the batch exact-dedup *aggregate*.
* ``streaming_dup_span_positions`` — online SPAN-level dedup keyed by
  gram hash; pending occurrences are held in state until the gram
  crosses ``min_docs`` distinct documents, then emitted retroactively —
  union over batches == the batch operator exactly.

Watermark caveat (standard Structured Streaming semantics, observed
empirically): rows older than ``max(event time seen) - watermark`` are
dropped as LATE, not deduplicated. With a file source whose files arrive
out of event-time order (e.g. one old file discovered after a much newer
one), the newer file advances the watermark and the older rows are
discarded entirely. Size the watermark to the source's worst-case
event-time disorder, not just the dedup horizon.
"""
from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import exact_key_cols, simhash_blocks, simhash_rowlocal

__all__ = ["streaming_exact_dedup", "streaming_dup_counts",
           "streaming_simhash_pairs", "streaming_dup_span_positions",
           "streaming_bloom_novel"]


def streaming_exact_dedup(stream: DataFrame, ts_col: str = "warc_ts",
                          text_col: str = "text",
                          watermark: str = "1 hour") -> DataFrame:
    """Keep the first-arriving row per normalized text within the watermark
    horizon (append mode). State per key is dropped once the watermark
    passes it — bounded state at unbounded input."""
    return (stream
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withColumns(dict(zip(["text_key_hi", "text_key_lo"],
                                  exact_key_cols(text_col))))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["text_key_hi", "text_key_lo"]))


_DUP_STATE = T.StructType([
    T.StructField("n_seen", T.LongType(), False),
    T.StructField("keep_id", T.LongType(), False),
])

_DUP_OUT = T.StructType([
    T.StructField("text_key_hi", T.LongType(), False),
    T.StructField("text_key_lo", T.LongType(), False),
    T.StructField("n_seen", T.LongType(), False),
    T.StructField("keep_id", T.LongType(), False),
])


def streaming_dup_counts(stream: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Running (text_key_hi, text_key_lo, n_seen, keep_id) via custom keyed state
    (applyInPandasWithState): keep_id is the minimum id ever seen for the
    key (deterministic winner, same rule as batch exact_dedup); n_seen the
    total row count. Update output mode; one emitted row per updated key per
    batch.

    Null-id rows are excluded up front: a row with no id cannot be a dedup
    representative, and Arrow delivers a null long as NaN — an all-null
    chunk would make ``int(min())`` raise and kill the query, a partly-null
    one would store None into the non-null state schema."""

    def update(key, pdfs, state: GroupState):
        n, keep = 0, None
        if state.exists:
            n, keep = state.get
        for pdf in pdfs:
            n += len(pdf)
            batch_min = int(pdf["id"].min())
            keep = batch_min if keep is None else min(keep, batch_min)
        state.update((n, keep))
        yield pd.DataFrame({"text_key_hi": [key[0]], "text_key_lo": [key[1]],
                            "n_seen": [n], "keep_id": [keep]})

    keyed = (stream.select(
        *exact_key_cols(text_col), F.col(id_col).alias("id"))
        .filter(F.col("id").isNotNull()))
    return (keyed.groupBy("text_key_hi", "text_key_lo")
            .applyInPandasWithState(update, outputStructType=_DUP_OUT,
                                    stateStructType=_DUP_STATE,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_simhash_pairs(fp_dir: str, pairs_dir: str, *,
                            id_col: str = "doc_id", text_col: str = "text",
                            max_hamming: int = 3, n_bits: int = 64,
                            hash_fn: str = "xxhash64"):
    """Incremental FUZZY dedup — the standard streaming near-dup shape:

    1. each micro-batch computes row-local simhash fingerprints
       (:func:`operators.dedup.simhash_rowlocal` — a stateless projection,
       so the expensive part runs inside the stream with no state);
    2. a ``foreachBatch`` step joins the batch's pigeonhole blocks against
       the ACCUMULATED fingerprint table (new x all, never all x all), so
       each pair is discovered exactly once, in the batch that completes
       it;
    3. the batch's fingerprints and discovered pairs are appended, both
       partitioned by ``batch_id`` with dynamic partition overwrite —
       a replayed batch overwrites its own partition, making the sink
       IDEMPOTENT under Structured Streaming's at-least-once foreachBatch
       contract (same mechanism as lineage.resumable_write).

    Returns the function to pass to ``stream.writeStream.foreachBatch``.
    The union of ``pairs_dir`` over all batches equals the batch
    ``simhash -> simhash_candidate_pairs`` output on the same rows
    (asserted in tests/test_dedup.py): new-vs-old pairs are found when the
    newer side arrives, new-vs-new pairs inside their own batch via the
    same normalized (least, greatest) key.
    """
    from pyspark.errors import AnalysisException

    def _read_prior_fps(spark):
        """Accumulated fingerprints, or None on the first batch.

        Probed by *attempting the read* rather than a driver-local
        ``os.path.isdir`` — the sink may live on HDFS/S3 where a POSIX
        check is always False (silently dropping every cross-batch pair),
        and a crashed first write can leave the directory existing with
        zero committed parquet footers (where isdir says "readable" and
        the read throws forever). An empty/unreadable dir is treated as
        "no prior fingerprints".
        """
        try:
            prior = spark.read.parquet(fp_dir).select("id", "fingerprint")
            prior.schema  # force analysis now, inside the try
            return prior
        except AnalysisException:
            return None

    def process(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        fps_new = simhash_rowlocal(batch_df, id_col=id_col,
                                   text_col=text_col, hash_fn=hash_fn,
                                   n_bits=n_bits).persist()
        try:
            prior = _read_prior_fps(spark)
            fps_all = (prior.unionByName(fps_new)
                       if prior is not None else fps_new)
            nb = simhash_blocks(fps_new, max_hamming=max_hamming,
                                n_bits=n_bits) \
                .select(F.col("id").alias("na"),
                        F.col("fingerprint").alias("fa"), "blk", "val")
            ab = simhash_blocks(fps_all, max_hamming=max_hamming,
                                n_bits=n_bits) \
                .select(F.col("id").alias("ob"),
                        F.col("fingerprint").alias("fb"), "blk", "val")
            ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
            pairs = (nb.join(ab, ["blk", "val"])
                     .filter(F.col("na") != F.col("ob"))
                     .select(F.least("na", "ob").alias("id_a"),
                             F.greatest("na", "ob").alias("id_b"),
                             ham.alias("hamming"))
                     .filter(F.col("hamming") <= max_hamming)
                     .distinct())
            with_bid = F.lit(int(batch_id)).alias("batch_id")
            for df, out in ((pairs, pairs_dir), (fps_new, fp_dir)):
                (df.withColumn("batch_id", with_bid)
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id").parquet(out))
        finally:
            fps_new.unpersist()

    return process


_SPAN_STATE = T.StructType([
    T.StructField("open", T.BooleanType(), False),
    T.StructField("pend_ids", T.ArrayType(T.LongType()), False),
    T.StructField("pend_pos", T.ArrayType(T.LongType()), False),
])

_SPAN_OUT = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("pos", T.LongType(), False),
])


def streaming_dup_span_positions(stream: DataFrame, n: int = 8,
                                 min_docs: int = 2,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 hash_fn: str = "poly",
                                 stride: int = 1) -> DataFrame:
    """Online span-level dedup: the streaming form of the batch
    ``duplicate_gram_positions`` as a CUSTOM STATEFUL operator —
    ``applyInPandasWithState`` keyed by the gram hash.

    State per gram: an ``open`` flag plus the PENDING occurrences seen
    while the gram was still below ``min_docs`` distinct documents.  When
    a batch pushes the distinct-doc count over the threshold, the pending
    occurrences are emitted RETROACTIVELY together with the new ones and
    the state collapses to the flag alone; once open, later occurrences
    stream straight through.  The union of emissions over any batch split
    therefore equals the batch operator's flagged ``(id, pos)`` set
    EXACTLY (tested) — no cross-batch dup is lost and nothing is emitted
    twice.

    State size: one row per DISTINCT still-closed gram, each holding at
    most ``min_docs - 1`` documents' occurrences; open grams store two
    empty arrays.  The row-local explode before the state op is the same
    token-linear stream the batch op shuffles — the state exchange IS
    that shuffle, paid incrementally per batch.  Update output mode."""

    from ..operators.dedup import ngram_span_hashes

    spans = (ngram_span_hashes(stream, n, id_col=id_col, text_col=text_col,
                               hash_fn=hash_fn, stride=stride)
             .filter(F.col("id").isNotNull()))

    def update(key, pdfs, state: GroupState):
        ids, poss = [], []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["id"])
            poss.extend(int(x) for x in pdf["pos"])
        if state.exists:
            is_open, pend_ids, pend_pos = state.get
            pend_ids, pend_pos = list(pend_ids), list(pend_pos)
        else:
            is_open, pend_ids, pend_pos = False, [], []
        if is_open:
            out_ids, out_pos = ids, poss
        else:
            pend_ids.extend(ids)
            pend_pos.extend(poss)
            if len(set(pend_ids)) >= min_docs:
                is_open, out_ids, out_pos = True, pend_ids, pend_pos
                pend_ids, pend_pos = [], []
            else:
                out_ids, out_pos = [], []
        state.update((is_open, pend_ids, pend_pos))
        if out_ids:
            yield pd.DataFrame({"id": out_ids, "pos": out_pos})

    return (spans.groupBy("h")
            .applyInPandasWithState(update, outputStructType=_SPAN_OUT,
                                    stateStructType=_SPAN_STATE,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_bloom_novel(words_dir: str, novel_dir: str, *,
                          id_col: str = "doc_id", text_col: str = "text",
                          n_bits: int = None, n_hashes: int = None,
                          hash_fn: str = "xxhash"):
    """Incremental crawl-frontier dedup via an accumulated Bloom filter.

    The streaming face of :func:`operators.dedup.bloom_novel`: each
    micro-batch (1) probes its rows against the bitmap accumulated from
    every PRIOR batch (broadcast, zero-shuffle scan-side map), (2) keeps
    within-batch first occurrences (min ``id_col`` per 128-bit exact key),
    (3) appends the surviving "novel" rows to ``novel_dir`` and a
    CUMULATIVE word-table snapshot (prior words bit-or'd with the batch's
    emitted keys' words) to ``words_dir``, both partitioned by
    ``batch_id`` with dynamic partition overwrite so a replayed batch
    overwrites exactly its own output (idempotent under foreachBatch's
    at-least-once contract; the bitmap read takes the LATEST snapshot
    with ``batch_id < current``, so a replay sees the same prior state).

    Because each snapshot is the full bit-or'd state, every micro-batch
    reads exactly ONE partition of <= n_bits/64 rows — per-batch driver
    work stays O(n_bits) REGARDLESS of stream age (incremental per-batch
    word deltas would instead force re-aggregating every historical
    partition each batch, linear in batch count). The trillion-key
    frontier never joins, never shuffles against history. Only EMITTED
    keys enter the filter: a row dropped as a false positive was never
    emitted, and if its text reappears it maps to the same set positions
    and is dropped again, so "no text is emitted twice" holds exactly;
    the cost stays the documented FP-rate loss of novel rows.

    Returns the function to pass to ``stream.writeStream.foreachBatch``.
    """
    from pyspark.errors import AnalysisException

    from ..operators.dedup import (_bloom_word_table, _check_bloom_params,
                                   _with_bloom_positions, _words_to_bitmap,
                                   bloom_flag, exact_key_cols)
    from ..operators import dedup as _d

    n_bits = _d.BLOOM_DEFAULT_BITS if n_bits is None else n_bits
    n_hashes = _d.BLOOM_DEFAULT_HASHES if n_hashes is None else n_hashes
    _check_bloom_params(n_bits, n_hashes)
    if hash_fn not in ("xxhash", "poly"):
        raise ValueError(f"hash_fn must be 'xxhash' or 'poly', got {hash_fn!r}")

    def _prior_words(spark, batch_id: int):
        """The latest cumulative snapshot with batch_id < current, or
        None before any commit. Probed by attempting the read, never a
        driver-local isdir (the sink may be HDFS/S3, or a crashed write
        may leave a footerless dir) — same contract as
        streaming_simhash_pairs above."""
        try:
            w = spark.read.parquet(words_dir)
            w.schema  # force analysis now, inside the try
        except AnalysisException:
            return None
        prior = w.filter(F.col("batch_id") < batch_id)
        latest = prior.agg(F.max("batch_id")).collect()[0][0]
        if latest is None:
            return None
        return prior.filter(F.col("batch_id") == latest) \
                    .select("w", "word")

    def process(batch_df, batch_id: int):
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        prior = _prior_words(spark, batch_id)
        if prior is not None:
            prior_rows = prior.collect()        # <= n_bits/64 rows
            bm = _words_to_bitmap(prior_rows, n_bits)
            flagged = bloom_flag(batch_df, bm, text_col=text_col,
                                 n_hashes=n_hashes, hash_fn=hash_fn)
        else:
            prior_rows = []
            flagged = batch_df.withColumn("possibly_seen", F.lit(False))
        win = Window.partitionBy("text_key_hi", "text_key_lo") \
                    .orderBy(id_col)
        novel = (flagged.filter(~F.col("possibly_seen"))
                 .withColumns(dict(zip(["text_key_hi", "text_key_lo"],
                                       exact_key_cols(text_col))))
                 .withColumn("_rn", F.row_number().over(win))
                 .filter(F.col("_rn") == 1)
                 .drop("_rn", "possibly_seen",
                       "text_key_hi", "text_key_lo")
                 .persist())
        try:
            batch_words = _bloom_word_table(
                _with_bloom_positions(novel.select(text_col), text_col,
                                      n_bits, n_hashes, hash_fn)
                .select(F.explode("__bloom_pos").alias("p")))
            prior_df = spark.createDataFrame(
                [(r["w"], r["word"]) for r in prior_rows],
                "w long, word long")
            snapshot = (batch_words.unionByName(prior_df)
                        .groupBy("w").agg(F.expr("bit_or(word)")
                                          .alias("word")))
            with_bid = F.lit(int(batch_id)).alias("batch_id")
            for df, out in ((novel, novel_dir), (snapshot, words_dir)):
                (df.withColumn("batch_id", with_bid)
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id").parquet(out))
        finally:
            novel.unpersist()

    return process
