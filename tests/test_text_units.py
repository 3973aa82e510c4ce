"""Text-layer units: normalization, LTS edges, sentence splitting, ids."""

import pytest

from open_speech_tpu.text import g2p
from open_speech_tpu.text.g2p_langs import base_lang, ipa_phonemize


def test_normalize_abbreviations():
    out = g2p.normalize_text("Dr. Smith vs Mr. Jones")
    assert "doctor" in out and "versus" in out and "mister" in out


def test_normalize_money_and_percent():
    assert "five dollars" in g2p.normalize_text("$5 tip")
    assert "ninety nine percent" in g2p.normalize_text("99% sure")


def test_normalize_decimal():
    assert "three point one" in g2p.normalize_text("3.1 meters")


def test_number_big_values():
    n = g2p._number_to_words
    assert n("1000") == "one thousand"
    assert n("1500") == "one thousand five hundred"
    assert n("2000000") == "two million"
    assert n("-7") == "minus seven"


def test_word_to_phonemes_silent_e():
    assert "EY" in g2p.word_to_phonemes("make")
    assert "AY" in g2p.word_to_phonemes("time")


def test_word_to_phonemes_digraphs():
    assert g2p.word_to_phonemes("ship")[0] == "SH"
    assert g2p.word_to_phonemes("chip")[0] == "CH"
    assert g2p.word_to_phonemes("think")[0] == "TH"
    assert "NG" in g2p.word_to_phonemes("ring")


def test_lexicon_overrides_rules():
    assert g2p.word_to_phonemes("enough") == "IH N AH F".split()
    assert g2p.word_to_phonemes("through") == "TH R UW".split()


def test_to_ids_bounded_and_reversible_shape():
    p = g2p.RuleG2P()
    ids = p.to_ids("The quick brown fox jumps over the lazy dog!")
    assert all(0 <= i < g2p.N_PHONEMES for i in ids)
    assert ids.count(g2p.PHONEME_TO_ID["<bos>"]) == 1
    assert ids.count(g2p.PHONEME_TO_ID["<eos>"]) == 1


def test_split_sentences_preserves_terminators():
    parts = g2p.split_sentences("One two. Three? Four!")
    assert parts == ["One two.", "Three?", "Four!"]


@pytest.mark.parametrize("lang", ["es", "de", "fr", "it", "pt"])
def test_each_language_produces_nonempty_ipa(lang):
    out = ipa_phonemize("una prueba simple", lang)
    assert out and any(ch.strip() for ch in out)


@pytest.mark.parametrize(
    "voice,lang",
    [
        ("piper/de_DE-thorsten-high", "de"),
        ("es_ES-carlfm-x_low", "es"),
        ("en_GB-alan-medium", "en"),
        ("fr-fr", "fr"),
    ],
)
def test_base_lang_matrix(voice, lang):
    assert base_lang(voice) == lang


def test_punctuation_survives_language_rules():
    out = "".join(ipa_phonemize("hola, mundo.", "es"))
    assert "," in out and "." in out


def test_normalize_titles_before_capitalized_names():
    from open_speech_tpu.text.g2p import normalize_text

    assert normalize_text("Dr. Smith met Mr. Jones.") == "doctor smith met mister jones."


def test_normalize_dotted_latinisms():
    from open_speech_tpu.text.g2p import normalize_text

    assert normalize_text("Use e.g. apples, i.e. fruit.") == (
        "use for example apples, that is fruit."
    )


def test_ipa_to_arpabet_roundtrip_symbols():
    from open_speech_tpu.text.g2p_langs import ipa_to_arpabet

    # espeak-style en-us output with stress/length marks
    assert ipa_to_arpabet(list("həlˈoʊ wˈɜːld")) == [
        "HH", "AH", "L", "OW", " ", "W", "ER", "L", "D",
    ]


def test_to_ids_with_id_map_never_falls_back_to_arpabet_space():
    import pytest

    from open_speech_tpu.text.g2p import RuleG2P

    with pytest.raises(ValueError, match="language_not_supported"):
        RuleG2P().to_ids("hello", id_map={"^": [1]}, voice="ko")


def test_pronunciation_value_with_backslash_is_literal():
    from open_speech_tpu.text.pronunciation import PronunciationDictionary

    d = PronunciationDictionary()
    d.set_mapping({"AI": "a\\1 eye"})
    assert d.apply("AI is here") == "a\\1 eye is here"
