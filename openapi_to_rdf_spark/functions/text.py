"""Text-analysis column functions for training-data pipelines.

Everything here is a pure ``pyspark.sql.functions`` Column expression — JVM
whole-stage-codegen, no Python in the hot path — so a 100 TB documents scan
stays a single codegen'd stage with full predicate pushdown. Each function has
an exact ANSI-SQL twin used as its DuckDB oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small multilingual stopword inventory: enough for a deterministic n-gram /
# stopword language-ID heuristic (the operator pattern; swap in a real list at
# deploy time). Ordered dict → deterministic tie-breaking.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den", "von", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "los"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "que", "dans", "pour"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array (not [''])."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, and single
    punctuation marks each count as one token (the regex stand-in for a BPE
    tokenizer). Extraction-based (RE2-compatible — no lookarounds), so the
    DuckDB oracle can run the identical pattern."""
    return F.size(F.regexp_extract_all(
        col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio(col: Column) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    nonspace = F.length(F.regexp_replace(col, r"\s", ""))
    punct = F.length(F.regexp_replace(col, r"[\w\s]", ""))
    return F.when(nonspace > 0, punct / nonspace).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(col))
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Heuristic doc-quality in [0,1]: length band + low punctuation +
    stopword presence (the C4/Gopher-style filter shape)."""
    n = token_count(col)
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    stop_ok = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return F.round((len_ok + punct_ok + stop_ok) / 3, 6)


def lang_scores(col: Column) -> Column:
    """Per-language stopword hit counts as a struct (the n-gram heuristic).
    The token array is bound once as a lambda variable (see word_ngrams) so
    the tokenization isn't re-inlined per language."""
    toks = tokens(F.lower(col))

    def hits(t):
        fields = []
        for lang, words in STOPWORDS.items():
            stops = F.array(*[F.lit(w) for w in words])
            fields.append(
                F.size(F.filter(t, lambda x: F.array_contains(stops, x)))
                .alias(lang))
        return F.struct(*fields)

    return F.element_at(F.transform(F.array(toks), hits), 1)


def lang_id(col: Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when no hits.
    Ties break by STOPWORDS key order (deterministic). The score struct is
    computed once per row (bound as a lambda variable), not once per
    comparison."""
    langs = list(STOPWORDS)

    def pick(s):
        best = F.greatest(*[s[lang] for lang in langs])
        expr = F.lit("und")
        for lang in reversed(langs):
            expr = F.when(s[lang] == best, F.lit(lang)).otherwise(expr)
        return F.when(best > 0, expr).otherwise(F.lit("und"))

    return F.element_at(F.transform(F.array(lang_scores(col)), pick), 1)


def normalized_text(col: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip non-alnum."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", ""), r"\s+", " ")


def doc_fingerprint(col: Column) -> Column:
    """Content fingerprint of the normalized text (exact-dup key)."""
    return F.md5(normalized_text(col))


def winnowing_fingerprints(col: Column, k: int = 5, window: int = 4) -> Column:
    """MOSS-style winnowing: hash every k-gram of the normalized text, then
    keep the MIN hash of each sliding window of ``window`` consecutive
    k-grams (distinct, sorted). Robust document fingerprints — two documents
    sharing any sufficiently long passage share fingerprints regardless of
    position. Pure JVM (array slicing + aggregate), oracle-expressible.
    """
    # positional k-gram hashes (char_ngrams dedups, so hash positionally);
    # md5 hex as the hash so the DuckDB oracle computes identical values —
    # window-min is then lexicographic over hex strings in both engines
    norm = normalized_text(col)

    def fps_of(t):
        n_grams = F.length(t) - k + 1
        hashes = F.transform(F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
                             lambda i: F.md5(F.substring(t, i, k)))

        # second binding level: without it, the full `hashes` expression tree
        # is re-inlined into every window slice → O(n²) md5 calls per row
        def mins_of(hs):
            n_windows = F.size(hs) - window + 1
            return F.array_sort(F.array_distinct(F.transform(
                F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
                lambda w: F.array_min(F.slice(hs, w, window)))))

        return F.element_at(F.transform(F.array(hashes), mins_of), 1)

    return F.element_at(F.transform(F.array(norm), fps_of), 1)


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-gram shingles of the alnum-normalized, lowercased
    text (array<string>, JVM-side) — the exact-Jaccard verification basis for
    MinHash candidates. Short strings are right-padded with '_' to n."""
    norm = F.regexp_replace(F.lower(col), "[^a-z0-9]", "")
    # NB: Spark's rpad TRUNCATES strings longer than the target length —
    # pad only the short case
    s = F.when(F.length(norm) < n, F.rpad(norm, n, "_")).otherwise(norm)

    def grams_of(t):  # bound once — see word_ngrams
        idx = F.sequence(F.lit(1), F.length(t) - n + 1)
        return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))

    return F.element_at(F.transform(F.array(s), grams_of), 1)


def lm_normalized(col: Column) -> Column:
    """LM normalization: lowercase, every [^a-z0-9]+ run -> one space, trim.
    Keeps word boundaries (unlike char_ngrams' strip-everything), so the
    char-LM sees spacing structure. DuckDB twin:
    ``trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))``."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def char_ngrams_all(col: Column, n: int = 3) -> Column:
    """ALL character n-grams of the LM-normalized text, in order, WITH
    multiplicity (array<string>) — the event stream a character n-gram
    language model counts and scores. Texts shorter than n yield []."""
    norm = lm_normalized(col)

    def grams_of(t):  # bound once — see word_ngrams
        idx = F.sequence(F.lit(1), F.length(t) - n + 1)
        g = F.transform(idx, lambda i: F.substring(t, i, n))
        # guard: sequence(1, 0) would COUNT DOWN in Spark → explicit branch
        return F.when(F.length(t) >= n, g).otherwise(
            F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(norm), grams_of), 1)


def word_ngrams_all(col: Column, n: int = 2) -> Column:
    """ALL word n-grams in order (NOT distinct) — the counting basis for
    repetition ratios, where multiplicity is the signal Jaccard discards."""
    toks = tokens(normalized_text(col))

    def grams_of(t):
        idx = F.sequence(F.lit(0), F.size(t) - n)
        g = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1)
                                              for j in range(n)]))
        return F.when(F.size(t) >= n, g).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), grams_of), 1)


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (distinct, for Jaccard)."""
    toks = tokens(normalized_text(col))

    # bind the token array ONCE as a lambda variable: referencing `toks`
    # directly inside the per-gram lambda would inline the whole
    # normalize+regex+split tree into every element_at call (O(n_grams)
    # full-text regex passes per row — measured 30ms/doc vs <1ms with the
    # binding)
    def grams_of(t):
        idx = F.sequence(F.lit(0), F.size(t) - n)
        g = F.array_distinct(F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1)
                                              for j in range(n)])))
        # guard: sequence(0, -1) would COUNT DOWN in Spark → explicit branch
        return F.when(F.size(t) >= n, g).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), grams_of), 1)


def readability_counts(col: Column) -> Column:
    """(words, sentences, syllables) struct for readability formulas —
    pure codegen, engine-portable by construction:

    - words: whitespace token count;
    - sentences: runs of ``[.!?]`` (min 1 — a fragment is one sentence);
    - syllables: vowel-group count over the lowercased text
      (``[aeiouy]+`` runs), the standard dictionary-free heuristic.
      No per-word min-1 correction (identical in SQL engines either
      way; documented bias: all-consonant tokens contribute 0).
    """
    t = F.trim(col)
    words = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+")))
    sentences = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    syllables = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    return F.struct(words.alias("words"), sentences.alias("sentences"),
                    syllables.alias("syllables"))


def flesch_reading_ease(col: Column) -> Column:
    """Flesch reading ease (Flesch 1948):
    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)`` over
    :func:`readability_counts`; NULL for empty text (no words). A core
    pretraining quality signal (easy text ↔ high scores) that
    complements the Gopher rule battery — one codegen projection, zero
    shuffles."""
    c = readability_counts(col)
    w = c.getField("words").cast("double")
    s = c.getField("sentences").cast("double")
    y = c.getField("syllables").cast("double")
    return F.when(w > 0,
                  F.lit(206.835) - F.lit(1.015) * (w / s)
                  - F.lit(84.6) * (y / w))
