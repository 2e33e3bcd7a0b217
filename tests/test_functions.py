"""Unit tests for the vectorized string/scoring kernels."""

import numpy as np
import pyarrow as pa
import pandas as pd
import pytest

from titan_ray.functions import langid
from titan_ray.functions.features import compute_features, token_count
from titan_ray.functions.lm import default_lm
from titan_ray.functions.scrub import Scrubber, blacklist_mask_pandas
from titan_ray.functions.strings import (
    char_class_counts,
    distinct_window_ratio,
    multi_arange,
    rolling_ngram_hash,
    string_view,
    word_counts,
)


def test_string_view_roundtrip():
    arr = pa.array(["abc", "", None, "déjà"], type=pa.string())
    data, offsets, valid = string_view(arr)
    assert bytes(data[offsets[0] : offsets[1]]) == b"abc"
    assert offsets[1] == offsets[2]  # empty row
    assert not valid[2]
    assert bytes(data[offsets[3] : offsets[4]]).decode() == "déjà"


def test_string_view_sliced_offset():
    arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
    data, offsets, valid = string_view(arr)
    assert offsets[0] == 0
    assert bytes(data[offsets[0] : offsets[1]]) == b"bb"
    assert bytes(data[offsets[1] : offsets[2]]) == b"cc"


def test_multi_arange():
    out = multi_arange(np.array([0, 10, 20]), np.array([2, 0, 3]))
    assert out.tolist() == [0, 1, 20, 21, 22]


def test_rolling_hash_deterministic():
    d = np.frombuffer(b"hello world", dtype=np.uint8)
    h1 = rolling_ngram_hash(d, 3)
    h2 = rolling_ngram_hash(d.copy(), 3)
    assert (h1 == h2).all()
    # same trigram at different positions hashes identically
    d2 = np.frombuffer(b"xyzlo wab", dtype=np.uint8)
    assert rolling_ngram_hash(d, 3)[3] == rolling_ngram_hash(d2, 3)[3]  # "lo "


def test_word_counts_and_classes():
    arr = pa.array(["one two  three", " lead", "tail ", "", None, "a1b2!"])
    data, offsets, _ = string_view(arr)
    assert word_counts(data, offsets).tolist() == [3, 1, 1, 0, 0, 1]
    cls = char_class_counts(data, offsets)
    assert cls["digit"].tolist()[5] == 2
    assert cls["punct"].tolist()[5] == 1


def test_distinct_window_ratio_repetition():
    arr = pa.array(["abcdefghijklmnop", "aaaaaaaaaaaaaaaa", "ab"])
    data, offsets, _ = string_view(arr)
    r = distinct_window_ratio(data, offsets, n=4)
    assert r[0] == 0.0          # all 4-grams distinct
    assert r[1] > 0.8           # heavy repetition
    assert r[2] == 0.0          # too short => 0


def test_langid_languages():
    samples = {
        "en": "The children walk to school along the river every morning and talk about stories.",
        "de": "Die Kinder gehen jeden Morgen am Fluss entlang zur Schule und sprechen über Geschichten.",
        "fr": "Les enfants marchent vers l'école le long de la rivière chaque matin.",
        "es": "Los niños caminan a la escuela junto al río cada mañana y hablan de historias.",
        "ru": "Дети идут в школу вдоль реки каждое утро и говорят об историях.",
        "zh": "孩子们每天早上沿着河边走路上学，谈论他们读过的故事。",
    }
    langs, conf = langid.detect(pa.array(list(samples.values())))
    assert list(langs) == list(samples)
    assert (conf > 0.2).all()


def test_langid_empty_and_null():
    langs, conf = langid.detect(pa.array([None, "", "ab"]))
    assert list(langs) == ["und", "und", "und"]
    assert conf.tolist() == [0.0, 0.0, 0.0]


def test_perplexity_orders_text_quality():
    lm = default_lm()
    ppl = lm.perplexity(
        pa.array(
            [
                "The quick brown fox jumps over the lazy dog near the river.",
                "qzx vbnm wkj zzqp xjv mmnb qqq zzz kjhgf pouy werq zxcv",
            ]
        )
    )
    assert ppl[0] < 20 < ppl[1]


def test_perplexity_deterministic():
    lm = default_lm()
    arr = pa.array(["Some mild weather today with a light wind."] * 3)
    p = lm.perplexity(arr)
    assert p[0] == p[1] == p[2]


def test_scrubber_rules():
    s = Scrubber()
    assert s.scrub_one("mail a.b@c.org now") == "mail [EMAIL] now"
    assert s.scrub_one("ssn 123-45-6789.") == "ssn [SSN]."
    assert s.scrub_one("card 4111 1111 1111 1111!") == "card [CARD]!"
    assert s.scrub_one("call 555-123-4567 or +1 555-123-4567") == "call [PHONE] or [PHONE]"
    assert s.scrub_one("ip 10.0.0.1 ok") == "ip [IP] ok"
    assert s.scrub_one("a frakking mess") == "a [TOX] mess"
    assert s.scrub_one(None) is None
    # pandas path identical to scalar path
    texts = ["x 1.2.3.4 y", "no pii here", "a@b.co"]
    assert s.scrub_pandas(pd.Series(texts, dtype="string")).tolist() == [s.scrub_one(t) for t in texts]


def test_blacklist_mask():
    m = blacklist_mask_pandas(pd.Series(["ok", "has BLOCKLISTED_TOKEN inside", None]))
    assert m.tolist() == [False, True, False]


def test_token_count_bpe_ish():
    out = token_count(pa.array(["hello, world! x2", ""]))
    # hello , world ! x 2 => 6
    assert out.tolist() == [6, 0]


def test_compute_features_schema():
    f = compute_features(pa.array(["The good dog walks.", None]))
    for k in ("lang", "lang_conf", "ppl", "n_chars", "n_words", "rep_ratio",
              "punct_ratio", "digit_ratio", "alpha_ratio", "stopword_ratio", "token_count"):
        assert k in f and len(f[k]) == 2
    assert f["n_chars"][1] == 0


def test_charlm_from_tables_identical():
    # reconstructing from tables() must skip training yet score identically
    # (the shared-plasma path in stages.scorer relies on this)
    from titan_ray.functions.lm import CharLM

    lm = default_lm()
    clone = CharLM.from_tables(*lm.tables())
    arr = pa.array(["The quick brown fox.", "qzx vbnm wkj", "", None])
    assert clone.perplexity(arr).tolist() == lm.perplexity(arr).tolist()


def test_langid_set_table_roundtrip():
    import numpy as np

    tab = langid.table()
    ro = tab.copy()
    ro.setflags(write=False)  # plasma views arrive read-only
    langid.set_table(ro)
    try:
        langs, conf = langid.detect(pa.array(["the cat sat on the mat and spoke english"]))
        assert langs[0] == "en" and conf[0] > 0
    finally:
        langid.set_table(tab)
