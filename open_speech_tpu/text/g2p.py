"""Grapheme-to-phoneme for TTS front-ends (host-side, text domain).

The reference leans on espeak-ng/misaki C libraries via the kokoro/piper
packages (SURVEY §2.8). Neither is installed here, so this is a
self-contained English G2P: text normalization (numbers, abbreviations), a
lexicon of high-frequency irregular words, and letter-to-sound rules for the
long tail. Output is ARPAbet-style phonemes mapped to a stable id space that
the JAX TTS models consume. Swappable: if espeak-ng appears on the host,
``EspeakG2P`` uses it transparently.
"""

from __future__ import annotations

import re
import shutil
import subprocess

# Phoneme inventory: ARPAbet + pause/boundary marks. Order is the id space.
PHONEMES = [
    "<pad>", "<bos>", "<eos>", " ", ",", ".", "?", "!",
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z",
    "ZH",
]
PHONEME_TO_ID = {p: i for i, p in enumerate(PHONEMES)}
N_PHONEMES = len(PHONEMES)

_ONES = "zero one two three four five six seven eight nine".split()
_TEENS = (
    "ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen "
    "nineteen".split()
)
_TENS = "zero ten twenty thirty forty fifty sixty seventy eighty ninety".split()

_ABBREV = {
    "mr": "mister", "mrs": "missus", "dr": "doctor", "st": "saint",
    "vs": "versus", "etc": "etcetera", "e.g": "for example", "i.e": "that is",
}

# High-frequency irregular words (letter-to-sound rules get these wrong)
_LEXICON: dict[str, str] = {
    "the": "DH AH", "a": "AH", "of": "AH V", "to": "T UW", "and": "AE N D",
    "is": "IH Z", "was": "W AH Z", "are": "AA R", "were": "W ER",
    "you": "Y UW", "your": "Y AO R", "i": "AY", "he": "HH IY",
    "she": "SH IY", "we": "W IY", "they": "DH EY", "one": "W AH N",
    "two": "T UW", "once": "W AH N S", "who": "HH UW", "what": "W AH T",
    "where": "W EH R", "there": "DH EH R", "their": "DH EH R",
    "said": "S EH D", "says": "S EH Z", "do": "D UW", "does": "D AH Z",
    "done": "D AH N", "have": "HH AE V", "has": "HH AE Z", "had": "HH AE D",
    "would": "W UH D", "could": "K UH D", "should": "SH UH D",
    "laugh": "L AE F", "enough": "IH N AH F", "through": "TH R UW",
    "though": "DH OW", "thought": "TH AO T", "tough": "T AH F",
    "women": "W IH M IH N", "woman": "W UH M AH N", "people": "P IY P AH L",
    "hello": "HH AH L OW", "world": "W ER L D", "live": "L IH V",
    "love": "L AH V", "move": "M UW V", "give": "G IH V", "gone": "G AO N",
    "come": "K AH M", "some": "S AH M", "because": "B IH K AH Z",
    "eye": "AY", "eyes": "AY Z", "busy": "B IH Z IY", "sure": "SH UH R",
    "answer": "AE N S ER", "island": "AY L AH N D", "hour": "AW ER",
    "honest": "AA N AH S T", "many": "M EH N IY", "any": "EH N IY",
    "again": "AH G EH N", "against": "AH G EH N S T", "great": "G R EY T",
    "heart": "HH AA R T", "water": "W AO T ER", "speech": "S P IY CH",
}

# Ordered letter-to-sound rules: (pattern, phonemes). Longest-match first.
_LTS_RULES: list[tuple[str, str]] = [
    ("tion", "SH AH N"), ("sion", "ZH AH N"), ("ough", "AO"),
    ("augh", "AO"), ("eigh", "EY"), ("igh", "AY"),
    ("tch", "CH"), ("dge", "JH"), ("sch", "S K"),
    ("ch", "CH"), ("sh", "SH"), ("th", "TH"), ("ph", "F"), ("wh", "W"),
    ("ng", "NG"), ("qu", "K W"), ("ck", "K"), ("gh", "G"), ("kn", "N"),
    ("wr", "R"), ("oo", "UW"), ("ee", "IY"), ("ea", "IY"), ("ai", "EY"),
    ("ay", "EY"), ("oa", "OW"), ("ou", "AW"), ("ow", "OW"), ("oi", "OY"),
    ("oy", "OY"), ("au", "AO"), ("aw", "AO"), ("ar", "AA R"), ("er", "ER"),
    ("ir", "ER"), ("or", "AO R"), ("ur", "ER"), ("oe", "OW"), ("ie", "IY"),
    ("ue", "UW"), ("ei", "EY"), ("ey", "IY"),
    ("a", "AE"), ("b", "B"), ("c", "K"), ("d", "D"), ("e", "EH"),
    ("f", "F"), ("g", "G"), ("h", "HH"), ("i", "IH"), ("j", "JH"),
    ("k", "K"), ("l", "L"), ("m", "M"), ("n", "N"), ("o", "AA"),
    ("p", "P"), ("r", "R"), ("s", "S"), ("t", "T"), ("u", "AH"),
    ("v", "V"), ("w", "W"), ("x", "K S"), ("y", "Y"), ("z", "Z"),
]


def _number_to_words(num: str) -> str:
    try:
        n = int(num)
    except ValueError:
        return " point ".join(_number_to_words(p) for p in num.split("."))
    if n < 0:
        return "minus " + _number_to_words(str(-n))
    if n < 10:
        return _ONES[n]
    if n < 20:
        return _TEENS[n - 10]
    if n < 100:
        tens, ones = divmod(n, 10)
        return _TENS[tens] + (f" {_ONES[ones]}" if ones else "")
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        out = f"{_ONES[hundreds]} hundred"
        return out + (f" {_number_to_words(str(rest))}" if rest else "")
    if n < 1_000_000:
        thousands, rest = divmod(n, 1000)
        out = f"{_number_to_words(str(thousands))} thousand"
        return out + (f" {_number_to_words(str(rest))}" if rest else "")
    millions, rest = divmod(n, 1_000_000)
    out = f"{_number_to_words(str(millions))} million"
    return out + (f" {_number_to_words(str(rest))}" if rest else "")


def normalize_text(text: str) -> str:
    """Expand numbers/abbreviations; collapse whitespace; lowercase."""
    text = text.strip()
    text = re.sub(
        r"\b(\w+)\.(?=\s+[a-z])",
        lambda m: _ABBREV.get(m.group(1).lower(), m.group(0)),
        text,
    )
    text = re.sub(
        r"\b([a-zA-Z]+)\b",
        lambda m: _ABBREV.get(m.group(1).lower(), m.group(1)),
        text,
    )
    text = re.sub(r"\$(\d+)", lambda m: _number_to_words(m.group(1)) + " dollars", text)
    text = re.sub(r"(\d+(?:\.\d+)?)%", lambda m: _number_to_words(m.group(1)) + " percent", text)
    text = re.sub(r"\d+(?:\.\d+)?", lambda m: _number_to_words(m.group(0)), text)
    text = re.sub(r"\s+", " ", text)
    return text.lower()


def word_to_phonemes(word: str) -> list[str]:
    """One word -> phoneme list via lexicon, else letter-to-sound rules."""
    if word in _LEXICON:
        return _LEXICON[word].split()
    phones: list[str] = []
    i = 0
    # silent-e heuristic: drop trailing 'e' of CVCe words, lengthen the vowel
    work = word
    if (
        len(work) > 3
        and work.endswith("e")
        and work[-2] not in "aeiou"
        and work[-3] in "aeiou"
    ):
        long_map = {"a": "EY", "e": "IY", "i": "AY", "o": "OW", "u": "UW"}
        work = work[:-1]
        # mark the vowel position for long substitution
        vowel_idx = len(work) - 2
    else:
        vowel_idx = -1
    while i < len(work):
        for pat, phs in _LTS_RULES:
            if work.startswith(pat, i):
                if i == vowel_idx and pat in "aeiou":
                    phones.append({"a": "EY", "e": "IY", "i": "AY", "o": "OW", "u": "UW"}[pat])
                else:
                    phones.extend(phs.split())
                i += len(pat)
                break
        else:
            i += 1  # unknown char: skip
    return phones


def piper_phoneme_ids(phones: list[str], id_map: dict) -> list[int]:
    """Encode IPA phonemes with a piper voice's phoneme_id_map.

    Piper framing: BOS "^", pad "_" interspersed after every phoneme,
    EOS "$" (piper-phonemize convention; map values are id lists).
    """
    ids = list(id_map.get("^", [1]))
    pad = list(id_map.get("_", [0]))
    ids.extend(pad)
    for p in phones:
        if p in id_map:
            ids.extend(id_map[p])
            ids.extend(pad)
    ids.extend(id_map.get("$", [2]))
    return ids


class RuleG2P:
    """Self-contained normalizer + lexicon + LTS G2P."""

    name = "rule"

    def supports_language(self, voice_or_lang: str) -> bool:
        from open_speech_tpu.text.g2p_langs import supported_language

        return supported_language(voice_or_lang)

    def phonemize_ipa(self, text: str, voice: str = "en-us") -> list[str] | None:
        """IPA phoneme characters.

        English goes through the ARPAbet path and maps to IPA; rule-table
        languages (es/de/fr/it/pt) transduce directly. Returns None for
        unsupported languages so callers gate the voice instead of serving
        English pronunciations (reference G2P is full espeak-ng)."""
        from open_speech_tpu.text.g2p_langs import (
            arpabet_to_ipa,
            base_lang,
            ipa_phonemize,
        )

        if base_lang(voice) == "en":
            return arpabet_to_ipa(self.phonemize(text))
        return ipa_phonemize(text, voice)

    def phonemize(self, text: str) -> list[str]:
        text = normalize_text(text)
        out: list[str] = []
        for token in re.findall(r"[a-z']+|[,.?!]", text):
            if token in ",.?!":
                out.append(token)
            else:
                if out and out[-1] not in (" ", ",", ".", "?", "!"):
                    out.append(" ")
                out.extend(word_to_phonemes(token.replace("'", "")))
        return out

    def to_ids(
        self,
        text: str,
        bos_eos: bool = True,
        id_map: dict | None = None,
        voice: str = "en-us",
    ) -> list[int]:
        """Phoneme ids. With a piper ``phoneme_id_map`` (converted voices),
        encode espeak IPA through it; otherwise the built-in ARPAbet space."""
        if id_map:
            phones = self.phonemize_ipa(text, voice=voice)
            if phones is not None:
                return piper_phoneme_ids(phones, id_map)
        ids = [PHONEME_TO_ID[p] for p in self.phonemize(text) if p in PHONEME_TO_ID]
        if bos_eos:
            return [PHONEME_TO_ID["<bos>"]] + ids + [PHONEME_TO_ID["<eos>"]]
        return ids


class EspeakG2P(RuleG2P):
    """espeak-ng-backed G2P when the binary exists (closest to reference)."""

    name = "espeak"

    @staticmethod
    def available() -> bool:
        return shutil.which("espeak-ng") is not None

    def supports_language(self, voice_or_lang: str) -> bool:
        return True  # espeak-ng ships ~100 language voices

    def phonemize_ipa(self, text: str, voice: str = "en-us") -> list[str] | None:
        try:
            out = subprocess.run(
                ["espeak-ng", "-q", "--ipa", "-v", voice, text],
                capture_output=True, text=True, timeout=10, check=True,
            ).stdout
            return [ch for ch in out.strip() if not ch.isspace()]
        except Exception:  # noqa: BLE001
            return None

    def phonemize(self, text: str) -> list[str]:
        try:
            out = subprocess.run(
                ["espeak-ng", "-q", "-x", text],
                capture_output=True, text=True, timeout=10, check=True,
            ).stdout
            # espeak ascii phonemes -> nearest ARPAbet (coarse map)
            return [p for p in re.findall(r"[a-zA-Z@:]+", out)]
        except Exception:  # noqa: BLE001
            return super().phonemize(text)


def get_g2p() -> RuleG2P:
    return EspeakG2P() if EspeakG2P.available() else RuleG2P()


def split_sentences(text: str) -> list[str]:
    """Sentence splitting for per-sentence streaming synthesis."""
    parts = re.split(r"(?<=[.!?])\s+", text.strip())
    return [p for p in parts if p]
