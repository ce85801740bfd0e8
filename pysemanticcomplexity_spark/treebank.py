"""Pure-Python Penn-Treebank word tokenizer.

The reference counts words with NLTK's ``TreebankWordTokenizer``
(/root/reference/parsers/preprocessing/text.py:27,59-63); nltk is not
available in this environment, so this module reimplements the public
Penn-Treebank ``tokenizer.sed`` algorithm (the same rule set NLTK's
tokenizer implements) as an ordered list of regex substitutions.

Deterministic, pure Python — safe to ship into Arrow-batched pandas UDF
workers. If nltk *is* importable we delegate to it so word counts match the
reference bit-for-bit; the fallback implements the identical rule sequence.
"""
from __future__ import annotations

import re
from typing import List

__all__ = ["TreebankTokenizer", "tokenize", "count_words"]


class TreebankTokenizer:
    """Penn Treebank tokenization (ordered sed-style regex substitutions)."""

    STARTING_QUOTES = [
        (re.compile(r"^\""), r"``"),
        (re.compile(r"(``)"), r" \1 "),
        (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
    ]

    PUNCTUATION = [
        (re.compile(r"([:,])([^\d])"), r" \1 \2"),
        (re.compile(r"([:,])$"), r" \1 "),
        (re.compile(r"\.\.\."), r" ... "),
        (re.compile(r"[;@#$%&]"), r" \g<0> "),
        (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
        (re.compile(r"[?!]"), r" \g<0> "),
        (re.compile(r"([^'])' "), r"\1 ' "),
    ]

    PARENS_BRACKETS = [
        (re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> "),
        (re.compile(r"--"), r" -- "),
    ]

    ENDING_QUOTES = [
        (re.compile(r'"'), " '' "),
        (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
        (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
        (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
    ]

    CONTRACTIONS2 = [
        re.compile(p)
        for p in (
            r"(?i)\b(can)(not)\b",
            r"(?i)\b(d)('ye)\b",
            r"(?i)\b(gim)(me)\b",
            r"(?i)\b(gon)(na)\b",
            r"(?i)\b(got)(ta)\b",
            r"(?i)\b(lem)(me)\b",
            r"(?i)\b(mor)('n)\b",
            r"(?i)\b(wan)(na)(?=\s)",
        )
    ]
    CONTRACTIONS3 = [
        re.compile(p) for p in (r"(?i) ('t)(is)\b", r"(?i) ('t)(was)\b")
    ]

    # cheap superset guards: each rule group below can only match when its
    # guard substring occurs, so skipping the group on a miss is exactly
    # output-preserving (re.sub is identity without a match) while replacing
    # many full-string regex scans with one C-speed substring test.
    _CONTR2_HINT = re.compile(r"(?i)cannot|d'ye|gimme|gonna|gotta|lemme|mor'n|wanna")

    def tokenize(self, text: str) -> List[str]:
        if '"' in text or "`" in text or "''" in text:
            for regexp, substitution in self.STARTING_QUOTES:
                text = regexp.sub(substitution, text)
        for regexp, substitution in self.PUNCTUATION:
            text = regexp.sub(substitution, text)
        for regexp, substitution in self.PARENS_BRACKETS:
            text = regexp.sub(substitution, text)
        text = " " + text + " "
        if '"' in text:
            text = self.ENDING_QUOTES[0][0].sub(self.ENDING_QUOTES[0][1], text)
        has_apos = "'" in text    # checked after rule 0, which introduces ''
        if has_apos:
            for regexp, substitution in self.ENDING_QUOTES[1:]:
                text = regexp.sub(substitution, text)
        if self._CONTR2_HINT.search(text):
            for regexp in self.CONTRACTIONS2:
                text = regexp.sub(r" \1 \2 ", text)
        if has_apos:
            for regexp in self.CONTRACTIONS3:
                text = regexp.sub(r" \1 \2 ", text)
        return text.split()


try:  # pragma: no cover - exercised only when nltk is installed
    from nltk.tokenize.treebank import TreebankWordTokenizer as _NltkTok

    _TOKENIZER = _NltkTok()
except ImportError:
    _TOKENIZER = TreebankTokenizer()


def tokenize(text: str) -> List[str]:
    """Tokenize like the reference's TextPreprocessor.tokenize (text.py:59-60)."""
    return _TOKENIZER.tokenize(text)


def count_words(text: str) -> int:
    """Word count like TextPreprocessor.count_words (text.py:62-63)."""
    return len(tokenize(text))
