"""Drop-rate gate on mixed-register CJK corpora.

Round-4 verdict missing #3: everyday text spoke, but formal/news text
with mid-frequency characters could trip the serving drop gate. These
fixtures (tests/data/{ja,zh}_corpus.txt — first-party text, 15 news-style
+ 15 conversational lines each) measure the lexicons the way the
reference's misaki stack would be measured: fraction of ideographs the
reading pass cannot voice. Gate: <1% (reference breadth:
src/tts/backends/kokoro.py:112-122 via jieba+pypinyin / pyopenjtalk).

The end-to-end check also runs the full phonemize path (reading pass →
kana/pinyin → IPA) so a lexicon entry that the downstream transducer
cannot consume still counts against the gate.
"""

import os

import pytest

from open_speech_tpu.text.cjk_lexicon import _is_kanji, ja_apply, zh_apply

DATA = os.path.join(os.path.dirname(__file__), "data")


def _corpus(name: str) -> str:
    with open(os.path.join(DATA, name), encoding="utf-8") as f:
        return f.read()


@pytest.mark.parametrize(
    "fname,apply",
    [("ja_corpus.txt", ja_apply), ("zh_corpus.txt", zh_apply)],
    ids=["ja", "zh"],
)
def test_reading_pass_drop_rate_under_1pct(fname, apply):
    text = _corpus(fname)
    total = sum(1 for c in text if _is_kanji(c))
    assert total > 400, "fixture should be a real corpus, not a snippet"
    out = apply(text)
    unread = sum(1 for c in out if _is_kanji(c))
    rate = unread / total
    missing = "".join(sorted({c for c in out if _is_kanji(c)}))
    assert rate < 0.01, f"drop rate {rate:.2%} (missing: {missing})"


@pytest.mark.parametrize(
    "fname,voice", [("ja_corpus.txt", "ja"), ("zh_corpus.txt", "zh")],
    ids=["ja", "zh"],
)
def test_full_phonemize_drop_rate_under_1pct(fname, voice):
    from open_speech_tpu.text.g2p_langs import ipa_phonemize_ex

    text = _corpus(fname)
    total = sum(1 for c in text if _is_kanji(c))
    dropped = 0
    produced = 0
    for line in text.strip().splitlines():
        res = ipa_phonemize_ex(line, voice)
        assert res is not None
        phonemes, drops = res
        dropped += drops
        produced += len(phonemes)
    assert produced > 10 * len(text.strip().splitlines())
    assert dropped / total < 0.01, f"e2e drop rate {dropped / total:.2%}"
