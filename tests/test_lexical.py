"""Token-only lexical features vs a pure-Python mirror of the reference
formulas (parsers/lexical/stanford.py:96-135, 159-171, 276-287)."""
import math
import re

import pytest

from pysemanticcomplexity_spark.operators.lexical import (
    SAMPLE_Z, TOKEN_RE, lexical_features)


def _ref_lexical(text, z=SAMPLE_Z):
    """Reference formulas applied to the SQL token model."""
    toks = re.findall(TOKEN_RE, text.lower())
    n, types = len(toks), len(set(toks))
    out = {"wordtokens": n, "wordtypes": types, "ndw": types}
    out["ndwz"] = len(set(toks[:z])) if n >= z else types
    out["ttr"] = types / n if n else None
    if n >= z:                       # _getmsttr: consecutive complete blocks
        rest, samples, s = toks, 0, 0.0
        while len(rest) >= z:
            samples += 1
            s += len(set(rest[:z])) / float(z)
            rest = rest[z:]
        out["msttr"] = s / samples
    else:
        out["msttr"] = out["ttr"]
    out["cttr"] = types / math.sqrt(2 * n) if n else None
    out["rttr"] = types / math.sqrt(n) if n else None
    out["logttr"] = math.log(types) / math.log(n) if n > 1 else None
    out["uber"] = ((math.log10(n) ** 2) / math.log10(n / types)
                   if n > 1 and types < n else None)
    return out


TEXTS = [
    "",                                          # empty
    "word",                                      # single token
    "aaa aaa aaa",                               # all same type
    "The quick brown fox jumps over the lazy dog again and again.",
    " ".join(f"tok{i % 17}" for i in range(173)),   # > 3 full z-blocks
    " ".join(f"w{i}" for i in range(50)),        # exactly z, all distinct
    "punct, only!!! ... ---",                    # punctuation-heavy
]


def test_matches_reference_formulas(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)),
                               "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in lexical_features(df).collect()}
    for i, text in enumerate(TEXTS):
        ref = _ref_lexical(text)
        for k, v in ref.items():
            g = got[i][k]
            if v is None:
                assert g is None, (i, k, g)
            elif isinstance(v, float):
                assert g == pytest.approx(v, abs=1e-12), (i, k, g, v)
            else:
                assert g == v, (i, k, g, v)


def test_msttr_less_than_ttr_on_repetitive_long_text(spark):
    """Segmental TTR corrects for length: a long repetitive doc has high
    per-segment diversity but low global TTR."""
    text = " ".join(f"tok{i % 40}" for i in range(400))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = lexical_features(df).collect()[0]
    assert r["msttr"] > r["ttr"]
    assert r["ndwz"] == 40                 # first 50 tokens hit all 40 types
