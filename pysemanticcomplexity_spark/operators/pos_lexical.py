"""POS-dependent lexical-complexity features — the remaining 2/3 of the
reference's lexical pipeline (parsers/lexical/stanford.py:82-302), closing
the gap left by the token-only TTR family in :mod:`operators.lexical`.

The reference's chain is  text -> Stanford POS tagger (Java, lemma_pos
lines per sentence) -> ``pos_tags_to_complexity`` (stanford.py:177-302),
producing 34 features.  The Stanford tagger is a vendored-Java dependency
that does not exist here, so — exactly as the gazetteer annotator replaces
DBpedia Spotlight for S7 — this module splits the chain at the reference's
own seam:

* :func:`pos_tag` — a DETERMINISTIC rule-based tagger replacement
  (closed-class lexicons + suffix rules), pure JVM expressions generated
  from a single rule table that also emits the identical DuckDB SQL
  (:func:`tagger_sql`), so the whole text->features chain is
  cross-engine hash-checkable.  Documented divergence: heuristic tags and
  no lemmatization beyond the be/have/do form maps (the only lemmas the
  feature semantics depend on, stanford.py:243 ``word not in ["be","have"]``).
* :func:`parse_tagged_lines` — the faithful adapter for EXTERNAL
  Stanford-style ``lemma_pos`` line input (stanford.py:199-209 semantics:
  lowercase+strip, the is-sentence letter/number test, ``split("_")[0]`` /
  ``[-1]``), so a user with real tagger output gets reference-exact
  features.
* :func:`pos_lexical_features` — ``pos_tags_to_complexity`` re-expressed
  as ONE conditional-aggregation pass (stanford.py:210-302): explode ->
  two broadcast lookup joins (word-rank / adjective dictionaries, bounded
  dimensions) -> a single groupBy(id) with conditional count-distincts
  plus an ordered collect_list for the positional features (ndwz, msttr).
  One shuffle, whole-stage codegen, zero Python in the hot path — at
  100 TB this is scan + broadcast + one partial-agg exchange.

Features: all 34 of stanford.py:296-302 EXCEPT ``ndwerz``/``ndwesz``
(stanford.py:136-156 draw from the *unseeded* stdlib RNG — irreproducible
by design, excluded) — 32 columns.  Ratios are NULL where the reference
raises ZeroDivisionError (no verbs / no lexical tokens / empty doc) or
returns inf (uber at types==tokens); documented, ANSI-safe.

Word lists: the reference ships BNC/ANC frequency files by download only
(README.md:50-62), so :func:`load_bnc_word_list` / :func:`load_anc_word_list`
re-implement the parsers (stanford.py:38-80) for deploy-time data, and a
small built-in common-word/adjective lexicon (public knowledge) backs the
default configuration.  :func:`top_frequent` mirrors the reference's
``_sort_key_by_value`` tail slice incl. its (frequency, word) tie-break
(stanford.py:33-35, 216).
"""
from __future__ import annotations

import string
from typing import Dict, Iterable, Set, Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "pos_tag", "parse_tagged_lines", "pos_lexical_features", "tagger_sql",
    "load_bnc_word_list", "load_anc_word_list", "top_frequent",
    "DEFAULT_WORD_FREQ", "DEFAULT_ADJ_WORDS", "SENTENCE_SPLIT_RE",
    "TOKEN_RE", "SAMPLE_Z", "WORD_RANK_LIMIT", "FEATURE_COLUMNS",
]

TOKEN_RE = "[a-z0-9]+"            # same token model as P5/T1/L1
SENTENCE_SPLIT_RE = "[.!?;]+"     # tagger's sentence model
SAMPLE_Z = 50                     # reference sample_size_mini (stanford.py:89)
WORD_RANK_LIMIT = 2000            # reference word_rank_limit (stanford.py:89)

# ---------------------------------------------------------------------------
# closed-class lexicons (standard English function words — public knowledge)

_BE_FORMS = ("be", "is", "are", "was", "were", "am", "been", "being")
_HAVE_FORMS = ("have", "has", "had", "having")
_DO_FORMS = ("do", "does", "did", "done", "doing")
_MODALS = ("can", "could", "will", "would", "shall", "should", "may",
           "might", "must")
_DETERMINERS = ("the", "a", "an", "this", "that", "these", "those", "each",
                "every", "either", "neither", "some", "any", "no", "all",
                "both", "half", "several", "enough", "such", "what",
                "which", "whose", "another")
_PRONOUNS = ("i", "you", "he", "she", "it", "we", "they", "me", "him",
             "her", "us", "them", "mine", "yours", "hers", "ours",
             "theirs", "my", "your", "his", "its", "our", "their",
             "myself", "yourself", "himself", "herself", "itself",
             "ourselves", "yourselves", "themselves", "who", "whom",
             "anyone", "everyone", "someone", "nobody", "anybody",
             "everybody", "somebody", "anything", "everything",
             "something", "nothing", "one")
_CONJUNCTIONS = ("and", "or", "but", "nor", "so", "yet")
_PREPOSITIONS = ("of", "in", "to", "with", "on", "at", "by", "from", "up",
                 "about", "into", "over", "after", "under", "between",
                 "out", "against", "during", "without", "before",
                 "around", "among", "through", "toward", "towards",
                 "upon", "within", "along", "across", "behind", "beyond",
                 "near", "above", "below", "off", "down", "since",
                 "until", "per", "via", "as", "for", "if", "than",
                 "because", "while", "where", "when", "how", "why",
                 "whether", "though", "although", "unless")
_CLOSED_ADVERBS = ("not", "never", "always", "often", "sometimes", "very",
                   "too", "quite", "rather", "almost", "already", "still",
                   "here", "there", "now", "then", "however", "thus",
                   "also", "again", "once", "twice", "soon", "just",
                   "even", "only", "well", "more", "most", "less",
                   "least", "much")

# lemma normalization — the ONLY lemmas the feature layer's semantics
# depend on (stanford.py:243 excludes the words "be"/"have" from verbs)
_LEMMA_MAP = {**{w: "be" for w in _BE_FORMS},
              **{w: "have" for w in _HAVE_FORMS},
              **{w: "do" for w in _DO_FORMS}}

# ordered tag rules; first match wins.  kinds: regex / word / suffix /
# suffixes / plural.  A single table drives BOTH the Spark Column builder
# (_tag_column) and the DuckDB CASE emitter (tagger_sql) — cross-engine
# identity by construction.
_ADJ_SUFFIXES = ("ous", "ful", "ive", "able", "ible", "ish", "less")
_TAG_RULES = (
    ("regex", "^[0-9]", "cd"),
    ("word", _BE_FORMS + _HAVE_FORMS + _DO_FORMS, "vb"),
    ("word", _MODALS, "md"),
    ("word", _DETERMINERS, "dt"),
    ("word", _PRONOUNS, "prp"),
    ("word", _CONJUNCTIONS, "cc"),
    ("word", _PREPOSITIONS, "in"),
    ("word", _CLOSED_ADVERBS, "rb"),
    ("suffix", ("ly", 4), "rb"),
    ("suffix", ("ing", 5), "vbg"),
    ("suffix", ("ed", 4), "vbd"),
    ("suffixes", (_ADJ_SUFFIXES, 5), "jj"),
    ("plural", None, "nns"),
)
_DEFAULT_TAG = "nn"

# ---------------------------------------------------------------------------
# built-in word lists (defaults for the no-external-data configuration)

# ~190 most common English words (classic public frequency lists), most
# frequent first; ranks become strictly-decreasing synthetic counts so the
# top-N cut needs no tie-break in the default path (tie-break logic is
# still exercised by the BNC/ANC loader tests).
_COMMON_WORDS = (
    "the of and a to in is you that it he was for on are as with his they "
    "i at be this have from or one had by word but not what all were we "
    "when your can said there use an each which she do how their if will "
    "up other about out many then them these so some her would make like "
    "him into time has look two more write go see number no way could "
    "people my than first water been call who oil its now find long down "
    "day did get come made may part over new sound take only little work "
    "know place year live me back give most very after thing our just "
    "name good sentence man think say great where help through much "
    "before line right too mean old any same tell boy follow came want "
    "show also around form three small set put end does another well "
    "large must big even such because turn here why ask went men read "
    "need land different home us move try kind hand picture again change "
    "off play spell air away animal house point page letter mother "
    "answer found study still learn should world high every near add "
    "food between own below country plant last school father keep tree "
    "never start city earth eye light thought head under story saw left "
    "dont few while along might close something seem next hard open "
    "example begin life always those both paper together got group often "
    "run important until children side feet car mile night walk white "
    "sea began grow took river four carry state once book hear stop "
    "without second later miss idea eat face watch far really almost let "
    "above girl"
).split()
DEFAULT_WORD_FREQ: Dict[str, int] = {
    w: 1_000_000 - i for i, w in enumerate(_COMMON_WORDS)}

DEFAULT_ADJ_WORDS: Set[str] = set(
    "good great new old big small large long little high low early late "
    "young important public bad quick slow easy hard strong weak full "
    "empty happy sad real free true false open deep wide rich poor safe "
    "clear dark light warm cold hot cool fast nice fine calm quiet loud "
    "bright recent major minor simple certain likely possible available "
    "different similar common rare general special local national social "
    "economic political human natural whole main sure only right left "
    "white black red green blue heavy soft short near".split())

FEATURE_COLUMNS = (
    "sentences", "wordtypes", "swordtypes", "lextypes", "slextypes",
    "wordtokens", "swordtokens", "lextokens", "slextokens", "ld", "ls1",
    "ls2", "vs1", "vs2", "cvs1", "ndw", "ndwz", "ttr", "msttr", "cttr",
    "rttr", "logttr", "uber", "lv", "vv1", "svv1", "cvv1", "vv2", "nv",
    "adjv", "advv", "modv")


# ---------------------------------------------------------------------------
# word-list managers (reference parser parity, stanford.py:38-80)

def load_bnc_word_list(lines: Iterable[str]) -> Tuple[Dict[str, int], ...]:
    """Parse BNC ``lemma pos frequency`` lines exactly as the reference's
    BNCWordListInformationManager.load_file (stanford.py:44-57): skip
    blanks and "Total words" rows, sum duplicate lemmas, route pos Adj /
    Verb / NoC|NoP into the adj/verb/noun dictionaries.

    Returns (worddict, adjdict, verbdict, noundict).
    """
    worddict: Dict[str, int] = {}
    adjdict: Dict[str, int] = {}
    verbdict: Dict[str, int] = {}
    noundict: Dict[str, int] = {}
    for raw in lines:
        word_info = raw.strip()
        if not word_info or "Total words" in word_info:
            continue
        lemma, pos, frequency = word_info.split()[:3]
        frequency = int(frequency)
        worddict[lemma] = worddict.get(lemma, 0) + frequency
        if pos == "Adj":
            adjdict[lemma] = adjdict.get(lemma, 0) + frequency
        elif pos == "Verb":
            verbdict[lemma] = verbdict.get(lemma, 0) + frequency
        elif pos in ("NoC", "NoP"):
            noundict[lemma] = noundict.get(lemma, 0) + frequency
    return worddict, adjdict, verbdict, noundict


def load_anc_word_list(lines: Iterable[str]) -> Tuple[Dict[str, int], ...]:
    """Parse ANC ``word lemma pos frequency`` lines exactly as the
    reference's ANCWordListInformationManager.load_file
    (stanford.py:60-80): route by the FIRST letter of the pos tag
    (J/V/N).  Returns (worddict, adjdict, verbdict, noundict)."""
    worddict: Dict[str, int] = {}
    adjdict: Dict[str, int] = {}
    verbdict: Dict[str, int] = {}
    noundict: Dict[str, int] = {}
    for raw in lines:
        word_info = raw.strip()
        if not word_info or "Total words" in word_info:
            continue
        _, lemma, pos, frequency = word_info.split()[:4]
        frequency = int(frequency)
        worddict[lemma] = worddict.get(lemma, 0) + frequency
        if pos[0] == "J":
            adjdict[lemma] = adjdict.get(lemma, 0) + frequency
        elif pos[0] == "V":
            verbdict[lemma] = verbdict.get(lemma, 0) + frequency
        elif pos[0] == "N":
            noundict[lemma] = noundict.get(lemma, 0) + frequency
    return worddict, adjdict, verbdict, noundict


def top_frequent(worddict: Dict[str, int], limit: int = WORD_RANK_LIMIT
                 ) -> Set[str]:
    """The reference's ``wordranks[-limit:]`` membership set: words sorted
    ascending by (frequency, word) — `_sort_key_by_value`'s (v, k) tuple
    sort, stanford.py:33-35 — then the last ``limit`` taken.  Ties at the
    cutoff frequency resolve to the lexicographically larger words, as in
    the reference."""
    ranked = [w for _, w in sorted((v, k) for k, v in worddict.items())]
    if limit <= 0:
        return set()
    return set(ranked[-limit:])


# ---------------------------------------------------------------------------
# the tagger (rule table -> Spark Column AND DuckDB SQL)

def _tag_column(w: Column) -> Column:
    """Spark CASE chain over the rule table (first match wins)."""
    expr = None
    for kind, arg, tag in _TAG_RULES:
        if kind == "regex":
            cond = w.rlike(arg)
        elif kind == "word":
            cond = w.isin(*arg)
        elif kind == "suffix":
            suf, min_len = arg
            cond = w.endswith(suf) & (F.length(w) >= min_len)
        elif kind == "suffixes":
            sufs, min_len = arg
            cond = F.length(w) >= min_len
            any_suf = w.endswith(sufs[0])
            for s in sufs[1:]:
                any_suf = any_suf | w.endswith(s)
            cond = cond & any_suf
        else:  # plural
            cond = (w.endswith("s") & ~w.endswith("ss") & ~w.endswith("us")
                    & ~w.endswith("is") & (F.length(w) >= 4))
        branch = F.when(cond, F.lit(tag))
        expr = branch if expr is None else expr.when(cond, F.lit(tag))
    return expr.otherwise(F.lit(_DEFAULT_TAG))


def _sql_in(words: Iterable[str]) -> str:
    return "(" + ", ".join("'" + w.replace("'", "''") + "'"
                           for w in sorted(words)) + ")"


def tagger_sql(word_expr: str = "w") -> str:
    """The DuckDB CASE expression computing the SAME tag as
    :func:`_tag_column` for a lowercase ``[a-z0-9]+`` token — generated
    from the same rule table, so the two engines cannot drift."""
    w = word_expr
    arms = []
    for kind, arg, tag in _TAG_RULES:
        if kind == "regex":
            cond = f"regexp_matches({w}, '{arg}')"
        elif kind == "word":
            cond = f"{w} IN {_sql_in(arg)}"
        elif kind == "suffix":
            suf, min_len = arg
            cond = f"({w} LIKE '%{suf}' AND length({w}) >= {min_len})"
        elif kind == "suffixes":
            sufs, min_len = arg
            ors = " OR ".join(f"{w} LIKE '%{s}'" for s in sufs)
            cond = f"(length({w}) >= {min_len} AND ({ors}))"
        else:  # plural
            cond = (f"({w} LIKE '%s' AND {w} NOT LIKE '%ss' "
                    f"AND {w} NOT LIKE '%us' AND {w} NOT LIKE '%is' "
                    f"AND length({w}) >= 4)")
        arms.append(f"WHEN {cond} THEN '{tag}'")
    return "CASE " + " ".join(arms) + f" ELSE '{_DEFAULT_TAG}' END"


def lemma_sql(word_expr: str = "w") -> str:
    """DuckDB expression for the be/have/do lemma normalization applied by
    :func:`pos_tag` (mirrors ``_LEMMA_MAP``)."""
    w = word_expr
    return (f"CASE WHEN {w} IN {_sql_in(_BE_FORMS)} THEN 'be' "
            f"WHEN {w} IN {_sql_in(_HAVE_FORMS)} THEN 'have' "
            f"WHEN {w} IN {_sql_in(_DO_FORMS)} THEN 'do' ELSE {w} END")


def pos_tag(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """text -> (id, line_idx, tok_idx, word, pos): the deterministic
    Stanford-tagger replacement.  Sentences are ``[.!?;]+`` splits of the
    lowercased text; tokens are ``[a-z0-9]+`` runs (the shared P5/T1/L1
    token model); tags come from the closed-class + suffix rule table;
    be/have/do forms are lemma-normalized (the only lemmas the feature
    semantics consult).  Lines with no token yield no rows — with this
    tagger every such line is also a non-sentence, matching the
    reference's letter/number test up to its whitespace-only quirk
    (stanford.py:119-124; documented divergence).

    Pure JVM expressions (split/posexplode/regexp/CASE) — row-local, no
    shuffle, streaming-legal; Catalyst keeps text-column pruning intact.
    """
    lines = (docs.select(F.col(id_col).alias("id"),
                         F.posexplode(F.split(F.lower(F.col(text_col)),
                                              SENTENCE_SPLIT_RE))
                         .alias("line_idx", "line")))
    toks = (lines.select(
        "id", "line_idx",
        F.posexplode(F.regexp_extract_all("line", F.lit(TOKEN_RE), F.lit(0)))
        .alias("tok_idx", "w")))
    lemma = F.element_at(
        F.map_from_arrays(
            F.lit(list(_LEMMA_MAP.keys())).cast("array<string>"),
            F.lit(list(_LEMMA_MAP.values())).cast("array<string>")),
        F.col("w"))
    return toks.select(
        "id", "line_idx", "tok_idx",
        F.coalesce(lemma, F.col("w")).alias("word"),
        _tag_column(F.col("w")).alias("pos"))


_PUNCT = string.punctuation


def parse_tagged_lines(tagged_lines: DataFrame, id_col: str = "id",
                       line_idx_col: str = "line_idx",
                       line_col: str = "line") -> DataFrame:
    """Adapter for EXTERNAL Stanford-style tagger output — one row per
    ``lemma_pos``-token line (a sentence), reference semantics
    (stanford.py:199-209): strip + lowercase; drop non-sentence lines
    (the letter/number test — any ASCII alphanumeric or internal
    whitespace char, stanford.py:115-124); whitespace-split; word =
    ``split("_")[0]``, pos = ``split("_")[-1]``.  ALL tokens are kept
    (including punctuation-pos ones) so the sentence count downstream
    matches the reference; :func:`pos_lexical_features` applies the
    pos-substring filter itself (stanford.py:209)."""
    line = F.lower(F.trim(F.col(line_col)))
    rows = (tagged_lines
            .select(F.col(id_col).alias("id"),
                    F.col(line_idx_col).alias("line_idx"),
                    line.alias("line"))
            .filter(F.col("line").rlike("[a-z0-9 \\t\\n\\r\\x0b\\x0c]")))
    toks = rows.select(
        "id", "line_idx",
        F.posexplode(F.split("line", r"\s+")).alias("tok_idx", "t"))
    parts = F.split("t", "_")
    return (toks.filter(F.length("t") > 0)
            .select("id", "line_idx", "tok_idx",
                    F.element_at(parts, 1).alias("word"),
                    F.element_at(parts, -1).alias("pos")))


def pos_lexical_features(tagged: DataFrame,
                         word_freq: Dict[str, int] = None,
                         adj_words: Set[str] = None,
                         word_rank_limit: int = WORD_RANK_LIMIT,
                         z: int = SAMPLE_Z) -> DataFrame:
    """``pos_tags_to_complexity`` (stanford.py:177-302) over a tagged
    token table (id, line_idx, tok_idx, word, pos) -> one row per doc
    with the 32 deterministic features (``ndwerz``/``ndwesz`` excluded —
    unseeded RNG, stanford.py:136-156).

    Distributed shape: the word-rank and adjective dictionaries are
    bounded dimensions -> two broadcast left joins flag each token; ONE
    groupBy(id) then computes every count / conditional count-distinct
    plus an ordered ``collect_list`` of kept words for the positional
    features (first-z NDW, segmental TTR — stanford.py:126-171), and the
    ratio block is a row-local projection.  One shuffle total; NULL where
    the reference divides by zero (or hits inf: uber at types==tokens).

    Token filter = reference line 209: pos excluded iff it is a SUBSTRING
    of ``string.punctuation`` (Python ``in`` on str), or 'sent'/'sym'
    (empty pos is excluded likewise).  Sophistication = word outside the
    top ``word_rank_limit`` of :func:`top_frequent`; adverbs are lexical
    only when the word (or its -ly stem) is in the adjective dictionary
    (stanford.py:232-239).
    """
    spark = tagged.sparkSession
    word_freq = DEFAULT_WORD_FREQ if word_freq is None else word_freq
    adj_words = DEFAULT_ADJ_WORDS if adj_words is None else adj_words
    frequent = top_frequent(word_freq, word_rank_limit)

    freq_df = spark.createDataFrame([(w,) for w in sorted(frequent)],
                                    "word: string") \
        .withColumn("_freq", F.lit(True))
    adj_df = spark.createDataFrame([(w,) for w in sorted(adj_words)],
                                   "aw: string") \
        .withColumn("_adj", F.lit(True))

    pos, word = F.col("pos"), F.col("word")
    keep = ~((F.length(pos) == 0)
             | (F.instr(F.lit(_PUNCT), pos) > 0)
             | pos.isin("sent", "sym"))
    base = tagged.withColumn("_keep", keep)
    # -ly stem without a per-row regexp: 'ly$' strips one trailing 'ly',
    # which endswith + substring reproduces exactly (incl. word == 'ly'
    # -> ''), at a fraction of the regex engine's per-row cost
    ly_stem = F.when(word.endswith("ly"),
                     F.substring(word, 1, F.length(word) - 2)) \
        .otherwise(word)
    t = (base
         .join(F.broadcast(freq_df), "word", "left")
         .join(F.broadcast(adj_df.withColumnRenamed("_adj", "_adj_w")),
               word == F.col("aw"), "left").drop("aw")
         .join(F.broadcast(adj_df.withColumnRenamed("_adj", "_adj_s")),
               ly_stem == F.col("aw"), "left")
         .drop("aw"))

    kp = F.col("_keep")
    soph = kp & F.col("_freq").isNull()          # word not in top-N
    is_noun = kp & pos.startswith("n")
    is_adj = kp & pos.startswith("j")
    is_adv = (kp & pos.startswith("r")
              & (F.col("_adj_w").isNotNull()
                 | (word.endswith("ly") & F.col("_adj_s").isNotNull())))
    is_verb = kp & pos.startswith("v") & ~word.isin("be", "have")
    is_lex = is_noun | is_adj | is_adv | is_verb

    # Scale shape: the naive single groupBy(id) with 12 conditional
    # count-distincts plans an Expand node (one input copy per distinct
    # group -> ~13x shuffle volume) plus SortAggregate for the ordered
    # collect_list.  Instead the distinct counts are rewritten as a
    # two-phase hash aggregation: per-(id, word) bool_or flags + token
    # sums (a word counts toward a *type* iff ANY of its tokens meets the
    # condition, which is exactly count_distinct(when(cond, word))), then
    # per-id sums of flags — all partial-aggregated map-side, shuffle
    # carries one row per distinct (id, word), no Expand.  The ordered
    # kept-word list (positional features) and the single sentences
    # distinct live in their own branch; both branches hash-partition by
    # id so the final join adds no shuffle beyond theirs.
    type_conds = [
        ("wordtypes", kp, True),
        ("swordtypes", soph & (pos != "cd"), True),
        ("lextypes", is_lex, True),
        ("slextypes", is_lex & soph, True),
        ("verbtypes", is_verb, True),
        ("sverbtypes", is_verb & soph, True),
        ("adjtypes", is_adj, True),
        ("advtypes", is_adv, True),
        ("nountypes", is_noun, True),
        ("wordtokens", kp, False),
        ("swordtokens", soph & (pos != "cd"), False),
        ("lextokens", is_lex, False),
        ("slextokens", is_lex & soph, False),
        ("verbtokens", is_verb, False),
        ("nountokens", is_noun, False),
    ]
    pre = t.groupBy("id", "word").agg(*[
        (F.bool_or(cond) if is_type else F.sum(cond.cast("long")))
        .alias(f"_{name}")
        for name, cond, is_type in type_conds])
    counts = pre.groupBy("id").agg(*[
        F.sum(F.col(f"_{name}").cast("long")).alias(name)
        for name, _cond, _ in type_conds])

    # the positional branch needs only (id, line_idx, tok_idx, word,
    # _keep) — building it from `base` rather than `t` stops Spark from
    # re-evaluating the tokenize/tag tree AND the three broadcast joins a
    # second time (left joins are not pruned even when their columns go
    # unused; the round-5 plan carried two full copies of the upstream)
    ordered = (base.groupBy("id").agg(
        F.count_distinct("line_idx").alias("sentences"),
        F.array_sort(F.collect_list(F.when(
            kp, F.struct("line_idx", "tok_idx", "word")))).alias("_lm")))
    g = counts.join(ordered, "id")
    g = g.withColumn("_lm", F.transform("_lm", lambda s: s["word"]))

    n = F.col("wordtokens")
    nd = n.cast("double")
    types = F.col("wordtypes")
    td = types.cast("double")

    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den.cast("double"))

    ttr = ratio(types, n)
    ndwz = F.when(n >= z, F.size(F.array_distinct(F.slice("_lm", 1, z)))
                  .cast("long")).otherwise(types)
    blocks = (n / z).cast("long")
    seg_ttrs = F.transform(
        F.sequence(F.lit(0).cast("long"), blocks - 1),
        lambda b: F.size(F.array_distinct(
            F.slice("_lm", (b * z + 1).cast("int"), z))).cast("double") / z)
    msttr = F.when(n >= z,
                   F.aggregate(seg_ttrs, F.lit(0.0), lambda a, x: a + x)
                   / blocks.cast("double")).otherwise(ttr)

    vtyp = F.col("verbtypes")
    vtok = F.col("verbtokens")
    svt = F.col("sverbtypes")
    lext = F.col("lextokens")

    out = g.select(
        "id", "sentences", "wordtypes", "swordtypes", "lextypes",
        "slextypes", "wordtokens", "swordtokens", "lextokens",
        "slextokens",
        ratio(F.col("lextokens"), n).alias("ld"),
        ratio(F.col("slextokens"), lext).alias("ls1"),
        ratio(F.col("swordtypes"), types).alias("ls2"),
        ratio(svt, vtok).alias("vs1"),
        ratio(svt * svt, vtok).alias("vs2"),
        F.when(vtok > 0, svt.cast("double")
               / F.sqrt(2.0 * vtok.cast("double"))).alias("cvs1"),
        types.alias("ndw"), ndwz.alias("ndwz"),
        ttr.alias("ttr"), msttr.cast("double").alias("msttr"),
        F.when(n > 0, td / F.sqrt(2.0 * nd)).alias("cttr"),
        F.when(n > 0, td / F.sqrt(nd)).alias("rttr"),
        F.when(n > 1, F.log(td) / F.log(nd)).alias("logttr"),
        F.when((n > 1) & (types < n),
               (F.log10(nd) * F.log10(nd)) / F.log10(nd / td))
        .alias("uber"),
        ratio(F.col("lextypes"), lext).alias("lv"),
        ratio(vtyp, vtok).alias("vv1"),
        ratio(vtyp * vtyp, vtok).alias("svv1"),
        F.when(vtok > 0, vtyp.cast("double")
               / F.sqrt(2.0 * vtok.cast("double"))).alias("cvv1"),
        ratio(vtyp, lext).alias("vv2"),
        ratio(F.col("nountypes"), F.col("nountokens")).alias("nv"),
        ratio(F.col("adjtypes"), lext).alias("adjv"),
        ratio(F.col("advtypes"), lext).alias("advv"),
        ratio(F.col("advtypes") + F.col("adjtypes"), lext).alias("modv"))
    return out
