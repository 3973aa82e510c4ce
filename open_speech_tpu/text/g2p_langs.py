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
    return lang == "en" or lang in LANG_RULES


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


def ipa_phonemize(text: str, lang: str) -> list[str] | None:
    """Text → list of IPA characters for a rule-table language.

    Returns None when ``lang`` has no rule table (caller should gate the
    voice rather than fall back to English pronunciation).
    """
    lang = base_lang(lang)
    if lang not in LANG_RULES:
        return None
    text = unicodedata.normalize("NFC", text.lower())
    digits = _DIGITS[lang]
    text = re.sub(r"\d", lambda m: " " + digits[int(m.group(0))] + " ", text)
    chars: list[str] = []
    for token in re.findall(r"[^\W\d_]+|[,.?!]", text, re.UNICODE):
        if token in ",.?!":
            chars.append(token)
            continue
        if chars and chars[-1] not in (" ", ",", ".", "?", "!"):
            chars.append(" ")
        chars.extend(_word_to_ipa(token, lang))
    return chars


def arpabet_to_ipa(phones: list[str]) -> list[str]:
    """ARPAbet phoneme list → IPA character list (English path)."""
    chars: list[str] = []
    for p in phones:
        chars.extend(ARPABET_TO_IPA.get(p, ""))
    return chars
