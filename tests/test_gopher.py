"""Gopher/MassiveText rule-based quality filter (operators/lm_quality.
gopher_rules): each rule trips on a purpose-built document while clean
prose passes; signal values are checked against hand-computed ground
truth. Cross-engine exactness is the driver query ``doc_gopher``
(DuckDB twin) at sf0.01."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.lm_quality import gopher_rules  # noqa: E402

PROSE = ("the quick brown fox jumps over the lazy dog and then runs back "
         "to the barn with great speed because it wants to have dinner "
         "that is waiting there of course " * 2).strip()


def _rows(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r.doc_id: r for r in gopher_rules(df, **kw).collect()}


def test_clean_prose_passes(spark):
    r = _rows(spark, [(1, PROSE)])[1]
    assert r.gopher_pass
    assert r.n_words == len(PROSE.split())
    assert r.stop_hits >= 2 and r.alpha_word_frac == 1.0


def test_too_short_fails(spark):
    r = _rows(spark, [(1, "tiny doc")])[1]
    assert not r.gopher_pass and r.n_words == 2


def test_symbol_ratio_trips(spark):
    text = PROSE + " " + "#" * 30 + "..." * 10
    r = _rows(spark, [(1, text)])[1]
    # 30 hashes + 10 ellipses over ~60 words >> 0.1
    assert r.symbol_word_ratio > 0.1 and not r.gopher_pass


def test_bullet_lines_trip(spark):
    bullets = "\n".join(f"- {w} item" for w in PROSE.split())
    r = _rows(spark, [(1, bullets)])[1]
    assert r.bullet_frac == 1.0 and not r.gopher_pass


def test_ellipsis_lines_trip(spark):
    text = "\n".join(f"{ln} ..." for ln in [PROSE[:50], PROSE[50:100],
                                            PROSE[100:150]])
    r = _rows(spark, [(1, PROSE + "\n" + text)])[1]
    assert r.ellipsis_frac == 0.75


def test_alpha_word_frac_trips(spark):
    text = PROSE + " " + " ".join(["12345"] * 60)
    r = _rows(spark, [(1, text)])[1]
    assert r.alpha_word_frac < 0.8 and not r.gopher_pass


def test_stopword_rule_trips(spark):
    # enough words, alphabetic, right lengths — but no MassiveText stopword
    text = " ".join(["lorem", "ipsum", "dolor", "sit", "amet"] * 12)
    r = _rows(spark, [(1, text)])[1]
    assert r.stop_hits == 0 and not r.gopher_pass


def test_mean_word_len_signal(spark):
    r = _rows(spark, [(1, "aa bbbb cccccc")])[1]
    assert abs(r.mean_word_len - 4.0) < 1e-9


def test_thresholds_are_tunable(spark):
    r = _rows(spark, [(1, "the dog ran to the barn with that have be of")],
              min_words=5)[1]
    assert r.gopher_pass


def test_empty_text_is_all_zero_fail(spark):
    r = _rows(spark, [(1, "")])[1]
    assert (r.n_words, r.stop_hits, r.mean_word_len) == (0, 0, 0.0)
    assert not r.gopher_pass


def test_gopher_signals_bounded_on_adversarial_text(spark):
    """Ratios stay in [0,1], counts non-negative, nothing null/NaN —
    across unicode, control chars, whitespace-only and symbol-only docs."""
    import math

    adversarial = [
        "", " ", "\n\n\n", "\t \r\n", "####", "...", "…", "• - *",
        "日本語のテキストです これはテストです",
        "🎉🎉🎉 emoji only 🎉", "a", "a\nb\nc", "- bullet\n- bullet",
        "x " * 500, "ALL CAPS SHOUTING TEXT HERE",
        "mixed 123 numbers 456 and words",
        "ümlaut café naïve façade", "\x00\x01\x02",
    ]
    df = spark.createDataFrame(list(enumerate(adversarial)),
                               ["doc_id", "text"])
    from openapi_to_rdf_spark.operators.lm_quality import gopher_rules

    for r in gopher_rules(df).collect():
        assert r.n_words >= 0 and r.stop_hits in range(9)
        for v in (r.bullet_frac, r.ellipsis_frac, r.alpha_word_frac):
            assert v is not None and not math.isnan(v) and 0.0 <= v <= 1.0
        # symbols PER WORD — legitimately exceeds 1 on symbol-heavy docs
        assert (r.symbol_word_ratio is not None
                and not math.isnan(r.symbol_word_ratio)
                and r.symbol_word_ratio >= 0.0)
        assert r.mean_word_len >= 0.0
        assert r.gopher_pass in (True, False)
