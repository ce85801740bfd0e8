"""Text-analysis operators: language-ID, quality, fingerprint."""
import pytest

from pysemanticcomplexity_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and it is a good day for the dog"),
        (1, "le chat est sur la table et il est un bon jour pour les chiens"),
        (2, "xyzzy qwerty asdf"),
        (3, ""),
        (4, "a!!! b??? ### $$$ %%%"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(spark, docs):
    out = {r["id"]: r["lang_pred"] for r in textstats.language_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "fr"
    assert out[2] == "und"
    assert out[3] == "und"


def test_quality_score_bounds(spark, docs):
    for r in textstats.quality_score(docs).collect():
        assert 0.0 <= r["score"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
    rows = {r["id"]: r for r in textstats.quality_score(docs).collect()}
    assert rows[0]["score"] > rows[4]["score"]   # punct noise hurts
    assert rows[0]["n_tokens"] == 15


def test_fingerprint_golden(spark, docs):
    """fp must equal the hand-rolled polynomial hash."""
    def py_fp(text):
        acc = 0
        for ch in text:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc
    out = {r["id"]: r["fp"] for r in textstats.fingerprint(docs).collect()}
    for i, text in [(0, "the cat sat on the mat and it is a good day for the dog"),
                    (2, "xyzzy qwerty asdf"), (3, "")]:
        assert out[i] == py_fp(text), i


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing guarantee (Schleimer et al.): documents sharing a substring
    of length >= w + k - 1 (= 11 at k=8, w=4) share a fingerprint; disjoint
    documents share none."""
    from pysemanticcomplexity_spark.operators.textstats import winnow_fingerprints
    shared = "the common passage appears verbatim here"
    docs = spark.createDataFrame(
        [(1, "prefix one %s suffix alpha" % shared),
         (2, "different beginning %s and another end" % shared),
         (3, "zzz qqq completely unrelated material xxyyzz 123456")],
        "doc_id long, text string")
    fps = {i: set() for i in (1, 2, 3)}
    for r in winnow_fingerprints(docs).collect():
        fps[r["id"]].add(r["fp"])
    assert fps[1] & fps[2]                 # shared passage -> shared prints
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_winnowing_compression_and_short_doc(spark):
    from pysemanticcomplexity_spark.operators.textstats import winnow_fingerprints
    long_doc = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, long_doc), (2, "tiny")],       # doc 2 shorter than k+w-1
        "doc_id long, text string")
    rows = winnow_fingerprints(docs).collect()
    n1 = sum(1 for r in rows if r["id"] == 1)
    assert not any(r["id"] == 2 for r in rows)
    # ~2/(w+1) of the ~len(t) k-grams retained; allow generous slack
    assert 0 < n1 < len(long_doc)


def test_simhash_pairs_reject_uncovered_hamming(spark):
    """Thresholds above n_bits-1 cannot be covered by pigeonhole blocks."""
    import pytest as _pytest
    from pysemanticcomplexity_spark.operators import dedup
    fps = spark.createDataFrame([(1, 0)], "id long, fingerprint long")
    with _pytest.raises(ValueError, match="max_hamming"):
        dedup.simhash_candidate_pairs(fps, max_hamming=32, n_bits=32)
    # but any threshold < n_bits now carries the exact pigeonhole guarantee
    assert dedup.simhash_candidate_pairs(fps, max_hamming=7,
                                         n_bits=32).count() == 0


def test_gopher_quality_flags(spark):
    """Each Gopher rule fires on its pathological document and the healthy
    document passes."""
    from pysemanticcomplexity_spark.operators.textstats import gopher_quality
    healthy = ("The quick brown fox jumps over the lazy dog and then it "
               "runs away to find some food for the rest of the day. " * 3)
    bullets = "\n".join("- item %d in a list" % i for i in range(30))
    symbols = "the word # and tag # more text # here # " * 10
    numbers = " ".join(str(i) for i in range(80))
    docs = spark.createDataFrame(
        [(1, healthy), (2, bullets), (3, symbols), (4, numbers), (5, "")],
        "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in gopher_quality(docs).collect()}
    assert got[1]["passes"] is True
    assert got[2]["passes"] is False and got[2]["bullet_line_frac"] == 1.0
    assert got[3]["passes"] is False and got[3]["symbol_ratio"] >= 0.1
    assert got[4]["passes"] is False and got[4]["alpha_word_frac"] == 0.0
    assert got[5]["passes"] is False and got[5]["n_words"] == 0
    assert got[5]["mean_word_len"] is None      # NULL, never a crash


def test_bpe_token_count_gpt2_style(spark):
    from pysemanticcomplexity_spark.operators.textstats import bpe_token_count
    docs = spark.createDataFrame(
        [(1, "Hello world, it's 2026!"), (2, ""), (3, "we'll don't I'm")],
        "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in bpe_token_count(docs).collect()}
    # ['Hello',' world',',',' it',"'s",' 2026','!'] -> 7 bpe; ws: hello,world,it,s,2026 -> 5
    assert got[1]["n_bpe_tokens"] == 7 and got[1]["n_ws_tokens"] == 5
    assert got[2]["n_bpe_tokens"] == 0 and got[2]["tokens_per_word"] is None
    # contractions split like GPT-2: we 'll  don 't  I 'm -> 6 bpe
    # (ws model also yields 6: we,ll,don,t,i,m -> ratio exactly 1.0)
    assert got[3]["n_bpe_tokens"] == 6
    assert got[3]["tokens_per_word"] == 1.0
    assert got[1]["tokens_per_word"] == pytest.approx(7 / 5)


def test_pii_scrub_matches_python(spark):
    import re
    from pysemanticcomplexity_spark.operators.textstats import (
        PII_PATTERNS, pii_scrub)
    rows = [
        (0, "contact bob@example.com or 555-123-4567, server 10.0.0.1, "
            "ssn 123-45-6789"),
        (1, "two mails a@b.co c.d@e-f.org and +1 212-555-0000 nope"),
        (2, "no pii here, just 1234 and 12.5 percent"),
        (3, ""),
        (4, "edge 999.999.999.999 and 123-45-678 (not an ssn)"),
        (5, "call +353 123-456-7890 or +971 555-123-4567 today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in pii_scrub(df).collect()}
    for i, text in rows:
        scrubbed = text
        for name, pat, repl in PII_PATTERNS:
            # sequential semantics: each class counts on the RUNNING text
            assert got[i][f"n_{name}"] == len(re.findall(pat, scrubbed)), \
                (i, name)
            scrubbed = re.sub(pat, repl, scrubbed)
        assert got[i]["text"] == scrubbed, i
        assert got[i]["n_pii"] == sum(got[i][f"n_{n}"]
                                      for n, _p, _r in PII_PATTERNS)
    assert got[0]["text"] == ("contact <EMAIL> or <PHONE>, server <IP>, "
                              "ssn <SSN>")
    assert got[4]["n_ssn"] == 0                 # 123-45-678 is not an SSN
    # 3-digit country codes are swallowed by the placeholder, not leaked
    assert got[5]["text"] == "call <PHONE> or <PHONE> today"


def test_repetition_stats_matches_python(spark):
    import re
    from collections import Counter
    from pysemanticcomplexity_spark.operators.textstats import (
        repetition_stats)
    rows = [
        (0, "line a\nline a\nline b\n\nline a"),
        (1, "spark spark spark spark joins data"),
        (2, "all distinct lines\nhere truly\nno repeats at all"),
        (3, ""),
        (4, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in repetition_stats(df).collect()}
    for i, text in rows:
        lines = [l.strip(" ") for l in text.split("\n")]
        lines = [l for l in lines if l]
        assert got[i]["n_lines"] == len(lines), i
        want_dup = (1.0 - len(set(lines)) / len(lines)) if lines else 0.0
        assert got[i]["dup_line_frac"] == pytest.approx(want_dup), i
        toks = re.findall("[a-z0-9]+", text.lower())
        grams = Counter(" ".join(toks[k:k + 2])
                        for k in range(len(toks) - 1))
        if grams:
            best = max(grams.items(), key=lambda kv: (kv[1], kv[0]))
            total = sum(len(t) for t in toks)
            assert got[i]["top_2gram_count"] == best[1], i
            want = best[1] * (len(best[0]) - 1) / total
            assert got[i]["top_2gram_frac"] == pytest.approx(want), i
        else:
            assert got[i]["top_2gram_count"] == 0
            assert got[i]["top_2gram_frac"] == 0.0


def test_pii_scrub_overlapping_span_counted_once(spark):
    """A phone-shaped run inside an email must be claimed by email alone:
    n_pii equals the number of placeholders actually emitted."""
    from pysemanticcomplexity_spark.operators.textstats import pii_scrub
    df = spark.createDataFrame(
        [(0, "reach me at 555-123-4567@example.com")],
        "doc_id long, text string")
    r = pii_scrub(df).collect()[0]
    assert r["text"] == "reach me at <EMAIL>"
    assert r["n_email"] == 1 and r["n_phone"] == 0
    assert r["n_pii"] == 1


def test_model_quality_score_matches_python(spark, docs):
    # independent python re-derivation of the hashed-linear model
    import math
    import re

    from pysemanticcomplexity_spark.operators.textstats import (
        FINGERPRINT_MOD as M, MODEL_N_BUCKETS as NB, MODEL_W_A as WA,
        MODEL_W_B as WB, model_quality_score)

    def poly(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % M
        return acc

    got = {r["id"]: r for r in model_quality_score(docs).collect()}
    for did, text in [(r["doc_id"], r["text"])
                      for r in docs.select("doc_id", "text").collect()]:
        toks = re.findall("[a-z0-9]+", text.lower())
        feats = [poly(t) % NB for t in toks] + \
            [poly(f"{a} {b}") % NB for a, b in zip(toks, toks[1:])]
        s = sum((WA * b + WB) % M for b in feats)
        r = got[did]
        assert r["n_feats"] == len(feats)
        assert r["logit_sum"] == s
        if feats:
            margin = s / len(feats) / M * 2.0 - 1.0
            assert abs(r["margin"] - margin) < 1e-12
            assert abs(r["prob"] - 1 / (1 + math.exp(-4 * margin))) < 1e-12
            assert r["mq_pass"] == (2 * s > len(feats) * M)
        else:
            assert r["margin"] is None and r["prob"] is None
            assert r["mq_pass"] is False


def test_model_quality_score_plan_shape(spark, docs):
    # gather kernel: ONE ArrowEvalPython (the weight gather) and no
    # per-row PythonUDF; expr kernel (default): NO Python at all
    from pysemanticcomplexity_spark import plans
    from pysemanticcomplexity_spark.operators.textstats import (
        model_quality_score)
    plan = plans.executed_plan(model_quality_score(docs, kernel="gather"))
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan        # no row-at-a-time Python
    plan_expr = plans.executed_plan(model_quality_score(docs))
    assert "EvalPython" not in plan_expr        # pure JVM fold
    assert "Exchange" not in plan_expr          # scan-side map


def test_model_quality_kernels_identical(spark, docs):
    from pysemanticcomplexity_spark.operators.textstats import (
        model_quality_score)
    a = sorted(map(tuple, model_quality_score(docs, kernel="expr").collect()))
    b = sorted(map(tuple,
                   model_quality_score(docs, kernel="gather").collect()))
    assert a == b


def test_pii_scrub_adversarial_runs_are_linear(spark):
    """ReDoS regression: the email class contains digits/./+/-, so an
    unbounded local-part quantifier made every start position in a
    crafted run eat O(n) before failing at '@' — O(n^2), ~50 h for one
    1 MB doc.  With RFC-bounded quantifiers these 300 KB adversarial
    docs must scrub in seconds (pre-fix this test effectively hangs),
    and real addresses must still redact."""
    from pysemanticcomplexity_spark.operators.textstats import pii_scrub
    rows = [
        (0, "+1-" * 100000),
        (1, "1." * 150000),
        (2, "a" * 150000 + "@" * 150000),
        (3, "x" * 100 + "reach me at real.user+tag@example.org ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in pii_scrub(df).collect()}
    assert got[0]["n_pii"] == 0
    assert got[1]["n_email"] == 0          # "1."*n is IP-shaped, not email
    assert got[1]["n_ipv4"] == 150000 // 4
    assert got[2]["n_email"] == 0
    assert got[3]["n_email"] == 1
    assert "<EMAIL>" in got[3]["text"]
    assert "real.user" not in got[3]["text"]
    # an over-long local part redacts only its RFC-valid 64-char tail
    long_local = "l" * 80 + "@d.com"
    r = pii_scrub(spark.createDataFrame([(9, long_local)],
                                        "doc_id long, text string")).collect()[0]
    assert r["n_email"] == 1 and r["text"] == "l" * 16 + "<EMAIL>"


def test_repetition_stats_adversarial_runs_are_linear(spark):
    """Perf regression: an expensive expression placed in the same select
    as explode() lands in the Project above the Generate and re-runs per
    OUTPUT row — the total_chars fold over n tokens ran n times (O(n^2),
    240 s for one 150 KB doc of repeated tokens).  All expensive columns
    now materialize below the explode; this 600 KB doc (200k identical
    tokens) must finish in seconds with exact counts."""
    from pysemanticcomplexity_spark.operators.textstats import (
        repetition_stats)
    n = 200000
    df = spark.createDataFrame([(0, "+1-" * n)], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert r["top_2gram_count"] == n - 1          # "1 1" everywhere
    assert r["top_2gram_frac"] == pytest.approx((n - 1) * 2 / n)
    assert r["n_lines"] == 1
