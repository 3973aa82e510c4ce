"""Per-language grapheme→IPA rules for TTS front-ends.

The reference gets multi-language G2P from espeak-ng (piper) and misaki
(kokoro) — C libraries that are not available here. For languages with
largely phonemic orthographies (es/de/fr/it/pt) a compact transducer of
ordered, context-aware letter rules produces serviceable IPA; English runs
through the ARPAbet G2P (text/g2p.py) and maps to IPA. Languages whose
text→sound mapping needs a real lexicon (ja/zh/hi/ko) are *not* claimed:
``supported_language`` returns False so the serving layer can gate voices
instead of silently reading them with English rules (the round-1 failure
mode this module removes).

Rule format: ordered ``(regex, ipa)`` pairs; at each position the first
matching pattern consumes its match and emits the IPA string. Patterns may
use lookahead/lookbehind for context (e.g. Spanish ``c`` before e/i).
"""

from __future__ import annotations

import re
import unicodedata

# ── ARPAbet → IPA (for the English path) ──────────────────────────────

ARPABET_TO_IPA = {
    "AA": "ɑ", "AE": "æ", "AH": "ə", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "B": "b", "CH": "tʃ", "D": "d", "DH": "ð", "EH": "ɛ", "ER": "ɚ",
    "EY": "eɪ", "F": "f", "G": "ɡ", "HH": "h", "IH": "ɪ", "IY": "i",
    "JH": "dʒ", "K": "k", "L": "l", "M": "m", "N": "n", "NG": "ŋ",
    "OW": "oʊ", "OY": "ɔɪ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ",
    "T": "t", "TH": "θ", "UH": "ʊ", "UW": "u", "V": "v", "W": "w",
    "Y": "j", "Z": "z", "ZH": "ʒ",
    " ": " ", ",": ",", ".": ".", "?": "?", "!": "!",
}

# ── letter→IPA rule tables ────────────────────────────────────────────
# Order matters: first match wins. All input is lowercased NFC.

_ES_RULES = [
    (r"ch", "tʃ"), (r"ll", "ʝ"), (r"ñ", "ɲ"), (r"rr", "r"),
    (r"qu(?=[ei])", "k"), (r"gu(?=[ei])", "ɡ"), (r"gü", "ɡw"),
    (r"c(?=[ei])", "θ"), (r"c", "k"), (r"z", "θ"),
    (r"g(?=[ei])", "x"), (r"j", "x"), (r"h", ""),
    (r"v", "b"), (r"y(?=[aeiou])", "ʝ"), (r"y", "i"),
    (r"á", "ˈa"), (r"é", "ˈe"), (r"í", "ˈi"), (r"ó", "ˈo"), (r"ú", "ˈu"),
    (r"a", "a"), (r"e", "e"), (r"i", "i"), (r"o", "o"), (r"u", "u"),
    (r"b", "b"), (r"d", "d"), (r"f", "f"), (r"g", "ɡ"), (r"k", "k"),
    (r"l", "l"), (r"m", "m"), (r"n", "n"), (r"p", "p"), (r"r", "ɾ"),
    (r"s", "s"), (r"t", "t"), (r"w", "w"), (r"x", "ks"),
]

_DE_RULES = [
    (r"sch", "ʃ"), (r"tsch", "tʃ"),
    (r"ch(?<=[aou]ch)", "x"), (r"ch", "ç"),
    (r"ei", "aɪ"), (r"ai", "aɪ"), (r"ie", "iː"), (r"eu", "ɔʏ"),
    (r"äu", "ɔʏ"), (r"au", "aʊ"),
    (r"^sp", "ʃp"), (r"^st", "ʃt"),  # word-initial only (match anchors at 0)
    (r"ß", "s"), (r"tz", "ts"), (r"z", "ts"), (r"ck", "k"),
    (r"qu", "kv"), (r"v", "f"), (r"w", "v"), (r"j", "j"),
    (r"s(?=[aeiouäöü])", "z"),
    (r"ä", "ɛ"), (r"ö", "ø"), (r"ü", "y"),
    (r"a", "a"), (r"e", "ə"), (r"i", "ɪ"), (r"o", "ɔ"), (r"u", "ʊ"),
    (r"b", "b"), (r"c", "k"), (r"d", "d"), (r"f", "f"), (r"g", "ɡ"),
    (r"h", "h"), (r"k", "k"), (r"l", "l"), (r"m", "m"), (r"n", "n"),
    (r"p", "p"), (r"r", "ʁ"), (r"s", "s"), (r"t", "t"), (r"x", "ks"),
    (r"y", "y"),
]

_FR_RULES = [
    (r"eau", "o"), (r"eaux", "o"), (r"au", "o"), (r"ou", "u"),
    (r"oi", "wa"), (r"gn", "ɲ"), (r"ch", "ʃ"), (r"ph", "f"),
    (r"ain\b", "ɛ̃"), (r"in\b", "ɛ̃"), (r"un\b", "œ̃"),
    (r"on\b", "ɔ̃"), (r"an\b", "ɑ̃"), (r"en\b", "ɑ̃"),
    (r"ain(?=[^aeiouy])", "ɛ̃"), (r"in(?=[^aeiouy])", "ɛ̃"),
    (r"on(?=[^aeiouy])", "ɔ̃"), (r"an(?=[^aeiouy])", "ɑ̃"),
    (r"en(?=[^aeiouy])", "ɑ̃"),
    (r"ai", "ɛ"), (r"ei", "ɛ"), (r"é", "e"), (r"è", "ɛ"), (r"ê", "ɛ"),
    (r"à", "a"), (r"â", "ɑ"), (r"ç", "s"), (r"œ", "œ"), (r"î", "i"),
    (r"ô", "o"), (r"û", "y"),
    (r"qu", "k"), (r"gu(?=[ei])", "ɡ"),
    (r"c(?=[eiy])", "s"), (r"c", "k"), (r"g(?=[eiy])", "ʒ"), (r"j", "ʒ"),
    (r"h", ""), (r"u", "y"),
    # final consonants usually silent (loi de position, approximate)
    (r"[dtsxzp]\b", ""), (r"es\b", ""), (r"e\b", ""),
    (r"a", "a"), (r"e", "ə"), (r"i", "i"), (r"o", "o"), (r"y", "i"),
    (r"b", "b"), (r"d", "d"), (r"f", "f"), (r"g", "ɡ"), (r"k", "k"),
    (r"l", "l"), (r"m", "m"), (r"n", "n"), (r"p", "p"), (r"r", "ʁ"),
    (r"s", "s"), (r"t", "t"), (r"v", "v"), (r"w", "w"), (r"x", "ks"),
    (r"z", "z"),
]

_IT_RULES = [
    (r"sc(?=[ei])", "ʃ"), (r"sch", "sk"), (r"gli", "ʎ"), (r"gn", "ɲ"),
    (r"ch", "k"), (r"gh", "ɡ"),
    (r"c(?=[ei])", "tʃ"), (r"c", "k"), (r"g(?=[ei])", "dʒ"), (r"g", "ɡ"),
    (r"z", "ts"), (r"h", ""),
    (r"à", "ˈa"), (r"è", "ˈɛ"), (r"é", "ˈe"), (r"ì", "ˈi"), (r"ò", "ˈɔ"),
    (r"ù", "ˈu"),
    (r"a", "a"), (r"e", "e"), (r"i", "i"), (r"o", "o"), (r"u", "u"),
    (r"b", "b"), (r"d", "d"), (r"f", "f"), (r"k", "k"), (r"l", "l"),
    (r"m", "m"), (r"n", "n"), (r"p", "p"), (r"q", "k"), (r"r", "r"),
    (r"s", "s"), (r"t", "t"), (r"v", "v"), (r"w", "w"), (r"x", "ks"),
    (r"y", "j"),
]

_PT_RULES = [
    (r"lh", "ʎ"), (r"nh", "ɲ"), (r"ch", "ʃ"), (r"ç", "s"),
    (r"qu(?=[ei])", "k"), (r"gu(?=[ei])", "ɡ"),
    (r"ão", "ɐ̃w"), (r"õe", "õj"), (r"ã", "ɐ̃"), (r"õ", "õ"),
    (r"á", "ˈa"), (r"â", "ˈɐ"), (r"é", "ˈɛ"), (r"ê", "ˈe"), (r"í", "ˈi"),
    (r"ó", "ˈɔ"), (r"ô", "ˈo"), (r"ú", "ˈu"),
    (r"c(?=[ei])", "s"), (r"c", "k"), (r"g(?=[ei])", "ʒ"), (r"j", "ʒ"),
    (r"x", "ʃ"), (r"h", ""), (r"ou", "o"),
    (r"(?<=[aeiou])s(?=[aeiou])", "z"),
    (r"a", "a"), (r"e", "e"), (r"i", "i"), (r"o", "o"), (r"u", "u"),
    (r"b", "b"), (r"d", "d"), (r"f", "f"), (r"g", "ɡ"), (r"k", "k"),
    (r"l", "l"), (r"m", "m"), (r"n", "n"), (r"p", "p"), (r"r", "ʁ"),
    (r"s", "s"), (r"t", "t"), (r"v", "v"), (r"w", "w"), (r"z", "z"),
]

LANG_RULES: dict[str, list[tuple[str, str]]] = {
    "es": _ES_RULES,
    "de": _DE_RULES,
    "fr": _FR_RULES,
    "it": _IT_RULES,
    "pt": _PT_RULES,
}

# ── Japanese: kana → IPA ──────────────────────────────────────────────
# Fully regular (the reference's misaki[ja] adds a kanji lexicon via
# pyopenjtalk; kanji here is reported via the drop counter instead of
# silently misread). Digraphs (palatalized kya/sho/...) listed first.

_KANA_BASE = {
    "あ": "a", "い": "i", "う": "ɯ", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "kɯ", "け": "ke", "こ": "ko",
    "が": "ɡa", "ぎ": "ɡi", "ぐ": "ɡɯ", "げ": "ɡe", "ご": "ɡo",
    "さ": "sa", "し": "ɕi", "す": "sɯ", "せ": "se", "そ": "so",
    "ざ": "za", "じ": "ʥi", "ず": "zɯ", "ぜ": "ze", "ぞ": "zo",
    "た": "ta", "ち": "ʨi", "つ": "ʦɯ", "て": "te", "と": "to",
    "だ": "da", "ぢ": "ʥi", "づ": "zɯ", "で": "de", "ど": "do",
    "な": "na", "に": "ɲi", "ぬ": "nɯ", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "çi", "ふ": "ɸɯ", "へ": "he", "ほ": "ho",
    "ば": "ba", "び": "bi", "ぶ": "bɯ", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pɯ", "ぺ": "pe", "ぽ": "po",
    "ま": "ma", "み": "mi", "む": "mɯ", "め": "me", "も": "mo",
    "や": "ja", "ゆ": "jɯ", "よ": "jo",
    "ら": "ɾa", "り": "ɾi", "る": "ɾɯ", "れ": "ɾe", "ろ": "ɾo",
    "わ": "wa", "ゐ": "i", "ゑ": "e", "を": "o", "ん": "ɴ",
    "ぁ": "a", "ぃ": "i", "ぅ": "ɯ", "ぇ": "e", "ぉ": "o",
    "ゔ": "bɯ",
}

_KANA_DIGRAPH = {
    "きゃ": "kʲa", "きゅ": "kʲɯ", "きょ": "kʲo",
    "ぎゃ": "ɡʲa", "ぎゅ": "ɡʲɯ", "ぎょ": "ɡʲo",
    "しゃ": "ɕa", "しゅ": "ɕɯ", "しょ": "ɕo",
    "じゃ": "ʥa", "じゅ": "ʥɯ", "じょ": "ʥo",
    "ちゃ": "ʨa", "ちゅ": "ʨɯ", "ちょ": "ʨo",
    "にゃ": "ɲa", "にゅ": "ɲɯ", "にょ": "ɲo",
    "ひゃ": "ça", "ひゅ": "çɯ", "ひょ": "ço",
    "びゃ": "bʲa", "びゅ": "bʲɯ", "びょ": "bʲo",
    "ぴゃ": "pʲa", "ぴゅ": "pʲɯ", "ぴょ": "pʲo",
    "みゃ": "mʲa", "みゅ": "mʲɯ", "みょ": "mʲo",
    "りゃ": "ɾʲa", "りゅ": "ɾʲɯ", "りょ": "ɾʲo",
    # katakana-only foreign combinations
    "ファ": "ɸa", "フィ": "ɸi", "フェ": "ɸe", "フォ": "ɸo",
    "ティ": "ti", "ディ": "di", "トゥ": "tɯ", "ドゥ": "dɯ",
    "ウィ": "wi", "ウェ": "we", "ウォ": "wo",
    "シェ": "ɕe", "ジェ": "ʥe", "チェ": "ʨe",
}


def _hira(ch: str) -> str:
    """Katakana → hiragana (same syllabary, offset 0x60)."""
    o = ord(ch)
    return chr(o - 0x60) if 0x30A1 <= o <= 0x30F6 else ch


def _ja_to_ipa(word: str) -> tuple[str, int]:
    """Kana word → (IPA string, count of untransducible chars)."""
    out: list[str] = []
    dropped = 0
    i = 0
    n = len(word)
    while i < n:
        two = word[i : i + 2]
        two_h = "".join(_hira(c) for c in two)
        if two in _KANA_DIGRAPH:
            out.append(_KANA_DIGRAPH[two])
            i += 2
            continue
        if two_h in _KANA_DIGRAPH:
            out.append(_KANA_DIGRAPH[two_h])
            i += 2
            continue
        ch = word[i]
        h = _hira(ch)
        if h in ("っ",):  # sokuon: geminate the next consonant
            nxt = word[i + 1 : i + 3]
            nxt_ipa = None
            nh = "".join(_hira(c) for c in nxt)
            if nh in _KANA_DIGRAPH:
                nxt_ipa = _KANA_DIGRAPH[nh]
            elif nh[:1] in _KANA_BASE:
                nxt_ipa = _KANA_BASE[nh[:1]]
            out.append(nxt_ipa[0] if nxt_ipa else "ʔ")
            i += 1
            continue
        if ch == "ー":  # chōonpu: lengthen preceding vowel
            out.append("ː")
            i += 1
            continue
        if h in _KANA_BASE:
            out.append(_KANA_BASE[h])
            i += 1
            continue
        dropped += 1  # kanji or unknown symbol: no lexicon here
        i += 1
    return "".join(out), dropped


# ── Mandarin: pinyin → IPA ────────────────────────────────────────────
# Tones map to the kokoro arrow symbols (misaki[zh] convention: the
# checkpoint vocab carries →/↗/↓/↘ for tones 1-4). Raw hanzi needs a
# reading lexicon (reference: misaki[zh] via jieba/pypinyin) and is
# counted as dropped.

_PINYIN_INITIALS = [
    ("zh", "ʈʂ"), ("ch", "ʈʂʰ"), ("sh", "ʂ"),
    ("b", "p"), ("p", "pʰ"), ("m", "m"), ("f", "f"),
    ("d", "t"), ("t", "tʰ"), ("n", "n"), ("l", "l"),
    ("g", "k"), ("k", "kʰ"), ("h", "x"),
    ("j", "ʨ"), ("q", "ʨʰ"), ("x", "ɕ"),
    ("r", "ɻ"), ("z", "ʦ"), ("c", "ʦʰ"), ("s", "s"),
    ("y", "j"), ("w", "w"),
]

_PINYIN_FINALS = [
    ("iong", "jʊŋ"), ("iang", "jɑŋ"), ("uang", "wɑŋ"), ("ueng", "wəŋ"),
    ("iao", "jaʊ"), ("uai", "waɪ"), ("ian", "jɛn"), ("uan", "wan"),
    ("ang", "ɑŋ"), ("eng", "əŋ"), ("ong", "ʊŋ"), ("ing", "iŋ"),
    ("üan", "ɥɛn"), ("üe", "ɥe"), ("ün", "yn"),
    ("ia", "ja"), ("ie", "je"), ("iu", "joʊ"), ("in", "in"),
    ("ua", "wa"), ("uo", "wo"), ("ui", "weɪ"), ("un", "wən"),
    ("ai", "aɪ"), ("ei", "eɪ"), ("ao", "aʊ"), ("ou", "oʊ"),
    ("an", "an"), ("en", "ən"), ("er", "ɚ"),
    ("a", "a"), ("o", "o"), ("e", "ɤ"), ("i", "i"), ("u", "u"), ("ü", "y"),
]

_ZH_TONES = {"1": "→", "2": "↗", "3": "↓", "4": "↘", "5": ""}

# pinyin tone diacritics → (bare vowel, tone digit)
_PINYIN_TONE_MARKS = {
    "ā": ("a", "1"), "á": ("a", "2"), "ǎ": ("a", "3"), "à": ("a", "4"),
    "ē": ("e", "1"), "é": ("e", "2"), "ě": ("e", "3"), "è": ("e", "4"),
    "ī": ("i", "1"), "í": ("i", "2"), "ǐ": ("i", "3"), "ì": ("i", "4"),
    "ō": ("o", "1"), "ó": ("o", "2"), "ǒ": ("o", "3"), "ò": ("o", "4"),
    "ū": ("u", "1"), "ú": ("u", "2"), "ǔ": ("u", "3"), "ù": ("u", "4"),
    "ǖ": ("ü", "1"), "ǘ": ("ü", "2"), "ǚ": ("ü", "3"), "ǜ": ("ü", "4"),
}

_SIBILANT_INITIALS = ("ʦ", "ʦʰ", "s", "ʈʂ", "ʈʂʰ", "ʂ", "ɻ")


def _zh_syllable_to_ipa(syl: str) -> str | None:
    """One pinyin syllable (tone digit or mark, e.g. 'zhong1'/'hǎo') → IPA."""
    tone = ""
    bare = []
    for ch in syl:
        if ch in _PINYIN_TONE_MARKS:
            v, t = _PINYIN_TONE_MARKS[ch]
            bare.append(v)
            tone = _ZH_TONES[t]
        elif ch in _ZH_TONES:
            tone = _ZH_TONES[ch]
        elif ch == "v":  # common ASCII stand-in for ü
            bare.append("ü")
        else:
            bare.append(ch)
    s = "".join(bare)
    if not s:
        return None
    initial_ipa = ""
    for pat, ipa in _PINYIN_INITIALS:
        if s.startswith(pat):
            initial_ipa = ipa
            s = s[len(pat):]
            break
    if not s and initial_ipa:  # e.g. "m" interjection
        return initial_ipa + tone
    for pat, ipa in _PINYIN_FINALS:
        if s == pat:
            # apical vowel after sibilants: zi/ci/si/zhi/chi/shi/ri
            if pat == "i" and initial_ipa in _SIBILANT_INITIALS:
                ipa = "ɨ"
            # jü/qü/xü written without umlaut: ju → tɕy
            if pat in ("u", "un", "uan") and initial_ipa in ("ʨ", "ʨʰ", "ɕ"):
                ipa = {"u": "y", "un": "yn", "uan": "ɥɛn"}[pat]
            return initial_ipa + ipa + tone
    return None


def _zh_to_ipa(word: str) -> tuple[str, int]:
    """Pinyin text (syllables with tone digits/marks) → (IPA, dropped).

    Hanzi characters are counted as dropped (no reading lexicon)."""
    # already-split syllable? try whole word first, then greedy split
    out: list[str] = []
    dropped = 0
    for chunk in re.findall(r"[a-zümāáǎàēéěèīíǐìōóǒòūúǔùǖǘǚǜ1-5]+|.", word):
        if len(chunk) == 1 and not chunk.isascii() and chunk not in _PINYIN_TONE_MARKS:
            dropped += 1  # hanzi / unknown
            continue
        ipa = _zh_syllable_to_ipa(chunk)
        if ipa is not None:
            out.append(ipa)
            continue
        # greedy multi-syllable split: longest prefix that parses
        rest = chunk
        ok = True
        while rest:
            for ln in range(min(7, len(rest)), 0, -1):
                ipa = _zh_syllable_to_ipa(rest[:ln])
                if ipa is not None:
                    out.append(ipa)
                    rest = rest[ln:]
                    break
            else:
                ok = False
                break
        if not ok:
            dropped += len(rest)
    return "".join(out), dropped


# ── Hindi: Devanagari → IPA ───────────────────────────────────────────
# Devanagari is near-phonemic: consonants carry an inherent schwa unless
# a matra or virama follows; word-final schwa deletes (standard Hindi).

_DEV_CONS = {
    "क": "k", "ख": "kʰ", "ग": "ɡ", "घ": "ɡʰ", "ङ": "ŋ",
    "च": "ʧ", "छ": "ʧʰ", "ज": "ʤ", "झ": "ʤʰ", "ञ": "ɲ",
    "ट": "ʈ", "ठ": "ʈʰ", "ड": "ɖ", "ढ": "ɖʰ", "ण": "ɳ",
    "त": "t", "थ": "tʰ", "द": "d", "ध": "dʰ", "न": "n",
    "प": "p", "फ": "pʰ", "ब": "b", "भ": "bʰ", "म": "m",
    "य": "j", "र": "ɾ", "ल": "l", "व": "ʋ",
    "श": "ʃ", "ष": "ʂ", "स": "s", "ह": "h",
    "ड़": "ɽ", "ढ़": "ɽʰ", "क़": "q", "ख़": "x", "ग़": "ɣ",
    "ज़": "z", "फ़": "f", "ऱ": "ɾ", "य़": "j",
}

_DEV_VOWELS = {
    "अ": "ə", "आ": "ɑ", "इ": "ɪ", "ई": "i", "उ": "ʊ", "ऊ": "u",
    "ऋ": "ɾɪ", "ए": "e", "ऐ": "ɛ", "ओ": "o", "औ": "ɔ",
    "ऑ": "ɒ", "ऍ": "æ",
}

_DEV_MATRAS = {
    "ा": "ɑ", "ि": "ɪ", "ी": "i", "ु": "ʊ", "ू": "u", "ृ": "ɾɪ",
    "े": "e", "ै": "ɛ", "ो": "o", "ौ": "ɔ", "ॉ": "ɒ", "ॅ": "æ",
}

_DEV_VIRAMA = "्"
_DEV_ANUSVARA = "ं"
_DEV_CANDRABINDU = "ँ"
_DEV_VISARGA = "ः"
_DEV_NUKTA = "़"


def _hi_to_ipa(word: str) -> tuple[str, int]:
    out: list[str] = []
    dropped = 0
    i = 0
    n = len(word)
    while i < n:
        ch = word[i]
        two = word[i : i + 2]
        cons = _DEV_CONS.get(two) or _DEV_CONS.get(ch)
        if cons is not None:
            step = 2 if two in _DEV_CONS else 1
            i += step
            # nukta folded into the two-char lookup; stray nukta skipped
            if i < n and word[i] == _DEV_NUKTA:
                i += 1
            out.append(cons)
            if i < n and word[i] in _DEV_MATRAS:
                out.append(_DEV_MATRAS[word[i]])
                i += 1
            elif i < n and word[i] == _DEV_VIRAMA:
                i += 1  # conjunct: no vowel
            elif i < n or len(out) == 1:
                # inherent schwa; deleted word-finally (standard Hindi)
                # except for a lone-consonant word
                out.append("ə")
            continue
        if ch in _DEV_VOWELS:
            out.append(_DEV_VOWELS[ch])
            i += 1
            continue
        if ch == _DEV_ANUSVARA:
            out.append("n")
            i += 1
            continue
        if ch == _DEV_CANDRABINDU:
            out.append("̃")
            i += 1
            continue
        if ch == _DEV_VISARGA:
            out.append("h")
            i += 1
            continue
        if ch in (_DEV_VIRAMA, _DEV_NUKTA, "ऽ"):
            i += 1
            continue
        dropped += 1
        i += 1
    return "".join(out), dropped


_LEXICAL_LANGS = {"ja": _ja_to_ipa, "zh": _zh_to_ipa, "hi": _hi_to_ipa}

# 0-9 per language so digits aren't read with English words
_DIGITS = {
    "es": "cero uno dos tres cuatro cinco seis siete ocho nueve".split(),
    "de": "null eins zwei drei vier fünf sechs sieben acht neun".split(),
    "fr": "zéro un deux trois quatre cinq six sept huit neuf".split(),
    "it": "zero uno due tre quattro cinque sei sette otto nove".split(),
    "pt": "zero um dois três quatro cinco seis sete oito nove".split(),
}

_COMPILED: dict[str, list[tuple[re.Pattern, str]]] = {}


def _rules_for(lang: str) -> list[tuple[re.Pattern, str]]:
    if lang not in _COMPILED:
        _COMPILED[lang] = [
            (re.compile(pat), ipa) for pat, ipa in LANG_RULES[lang]
        ]
    return _COMPILED[lang]


def base_lang(voice_or_lang: str) -> str:
    """'de_DE-thorsten-medium' / 'fr-fr' / 'es' → 'de'/'fr'/'es'."""
    tok = voice_or_lang.split("/")[-1]
    return re.split(r"[-_]", tok.lower())[0] or "en"


def supported_language(voice_or_lang: str) -> bool:
    lang = base_lang(voice_or_lang)
    return lang == "en" or lang in LANG_RULES or lang in _LEXICAL_LANGS


def _word_to_ipa(word: str, lang: str) -> str:
    rules = _rules_for(lang)
    out: list[str] = []
    i = 0
    while i < len(word):
        for pat, ipa in rules:
            m = pat.match(word, i)
            if m and m.end() > i:
                out.append(ipa)
                i = m.end()
                break
        else:
            i += 1  # unknown character: skip
    return "".join(out)


def ipa_phonemize_ex(text: str, lang: str) -> tuple[list[str], int] | None:
    """Text → (IPA character list, dropped-char count).

    Rule-table languages (es/de/fr/it/pt) transduce letter rules; ja/zh/hi
    use the kana/pinyin/Devanagari transducers (chars needing a reading
    lexicon — kanji, hanzi — are counted as dropped, never misread).
    Returns None when ``lang`` has no path (caller should gate the voice
    rather than fall back to English pronunciation).
    """
    lang = base_lang(lang)
    lexical = _LEXICAL_LANGS.get(lang)
    if lang not in LANG_RULES and lexical is None:
        return None
    text = unicodedata.normalize("NFC", text.lower())
    if lang in _DIGITS:
        digits = _DIGITS[lang]
        text = re.sub(
            r"\d", lambda m: " " + digits[int(m.group(0))] + " ", text
        )
    chars: list[str] = []
    dropped = 0
    word_re = r"[^\W_]+" if lexical else r"[^\W\d_]+"
    for token in re.findall(word_re + r"|[,.?!、。？！]", text, re.UNICODE):
        if token in ",.?!":
            chars.append(token)
            continue
        if token in "、。？！":  # CJK punctuation → vocab equivalents
            chars.append({"、": ",", "。": ".", "？": "?", "！": "!"}[token])
            continue
        if chars and chars[-1] not in (" ", ",", ".", "?", "!"):
            chars.append(" ")
        if lexical:
            ipa, miss = lexical(token)
            chars.extend(ipa)
            dropped += miss
        else:
            chars.extend(_word_to_ipa(token, lang))
    return chars, dropped


def ipa_phonemize(text: str, lang: str) -> list[str] | None:
    """Back-compat wrapper: IPA chars only (see ``ipa_phonemize_ex``)."""
    res = ipa_phonemize_ex(text, lang)
    return None if res is None else res[0]


# espeak output quirks / multi-char sequences → kokoro vocab symbols.
# The kokoro checkpoint vocab encodes affricates as single codepoints
# (ʧ ʤ ʦ ʨ ʥ); espeak --ipa emits tied or plain digraphs. Order matters.
_IPA_NORM_SEQ = [
    ("t͡ʃ", "ʧ"), ("d͡ʒ", "ʤ"), ("t͡s", "ʦ"), ("d͡z", "ʣ"),
    ("t͡ɕ", "ʨ"), ("d͡ʑ", "ʥ"),
    ("tʃ", "ʧ"), ("dʒ", "ʤ"), ("tɕ", "ʨ"), ("dʑ", "ʥ"),
    ("g", "ɡ"), ("'", "ˈ"), ("ˑ", "ː"),
    ("‿", " "), ("|", " "), ("‖", " "), ("_", " "), ("͡", ""),
    # precomposed nasal vowels (pt) -> base + combining tilde U+0303
    # (both in the kokoro alphabet); ʏ (de/espeak) -> nearest in-vocab vowel
    ("\u00e3", "a\u0303"),
    ("\u1ebd", "e\u0303"),
    ("\u0129", "i\u0303"),
    ("\u00f5", "o\u0303"),
    ("\u0169", "u\u0303"),
    ("\u028f", "\u028a"),
]


def normalize_ipa(chars: list[str]) -> list[str]:
    """Normalize an espeak/transducer IPA stream onto the kokoro symbol set.

    Fuses affricate digraphs into the single-codepoint vocab symbols,
    fixes ascii 'g', maps separators to space — so checkpoint-vocab encoding
    drops only genuinely unknown symbols (which the caller counts/report).
    """
    s = "".join(chars)
    for pat, rep in _IPA_NORM_SEQ:
        s = s.replace(pat, rep)
    s = re.sub(r"\s+", " ", s)
    return list(s.strip())


def arpabet_to_ipa(phones: list[str]) -> list[str]:
    """ARPAbet phoneme list → IPA character list (English path)."""
    chars: list[str] = []
    for p in phones:
        chars.extend(ARPABET_TO_IPA.get(p, ""))
    return chars


# Inverse map for the espeak→built-in-id-space path, extended with the
# en-us symbols espeak emits that the forward table never produces
# (rhotic/reduced vowels, flap, glottal stop). Length marks and stress
# are stripped before matching, so the long vowels resolve via their
# base symbol (ɑː→ɑ→AA).
_IPA_TO_ARPABET: dict[str, str] = {
    ipa: arp for arp, ipa in ARPABET_TO_IPA.items() if ipa.strip()
}
_IPA_TO_ARPABET.update({
    "ɚ": "ER", "ɜ": "ER", "ɝ": "ER", "ɐ": "AH", "ʌ": "AH", "ɒ": "AA",
    "əʊ": "OW", "ɪə": "IH R", "eə": "EH R", "ʊə": "UH R",
    "ɾ": "D", "ʔ": "T", "ɫ": "L", "r": "R", "ʍ": "W", "x": "K",
    "e": "EH", "o": "OW", "a": "AE", "ᵻ": "IH", "ɵ": "AH",
    "ʧ": "CH", "ʤ": "JH",
    " ": " ", ",": ",", ".": ".", "?": "?", "!": "!",
})
_IPA_ARPA_KEYS_2 = {k for k in _IPA_TO_ARPABET if len(k) == 2}


def ipa_to_arpabet(chars: list[str]) -> list[str]:
    """IPA character stream → ARPAbet phonemes (greedy longest match).

    Used when espeak provides the phonemization but the consumer is the
    built-in ARPAbet id space (no checkpoint vocab). Stress/length/tie
    marks are prosody-only there and are dropped; unknown symbols are
    skipped rather than misread.
    """
    s = "".join(normalize_ipa(chars))
    for mark in ("ˈ", "ˌ", "ː", "̩", "̯", "͡"):
        s = s.replace(mark, "")
    out: list[str] = []
    i = 0
    while i < len(s):
        pair = s[i : i + 2]
        if pair in _IPA_ARPA_KEYS_2:
            out.extend(_IPA_TO_ARPABET[pair].split())
            i += 2
            continue
        hit = _IPA_TO_ARPABET.get(s[i])
        if hit is not None:
            # .split() eats the word-boundary symbol itself — keep it
            out.extend(hit.split() or [hit])
        i += 1
    return out
