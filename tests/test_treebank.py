"""Treebank tokenizer sanity (golden values from the public PTB algorithm)."""
from pysemanticcomplexity_spark.treebank import tokenize, count_words


def test_basic_punct():
    assert tokenize("Hello, world.") == ["Hello", ",", "world", "."]


def test_contractions():
    assert tokenize("don't can't") == ["do", "n't", "ca", "n't"]
    assert tokenize("I'll go, they're here") == \
        ["I", "'ll", "go", ",", "they", "'re", "here"]
    assert tokenize("cannot") == ["can", "not"]


def test_quotes_parens():
    assert tokenize('She said "hi" (quietly).') == \
        ["She", "said", "``", "hi", "''", "(", "quietly", ")", "."]


def test_simple_words():
    assert count_words("the quick brown fox") == 4
    assert count_words("") == 0


def test_unicode_words():
    assert tokenize("naïve café") == ["naïve", "café"]
