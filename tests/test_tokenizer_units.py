"""Whisper tokenizer layout/codec units.

The special-token layout must match openai/whisper exactly for converted
checkpoints to decode correctly; these tests pin the layout arithmetic,
the sot-sequence construction, timestamp math, and the byte-level BPE
fallback's reversibility.
"""

import pytest

from open_speech_tpu.models.whisper.tokenizer import (
    SpecialTokens,
    get_tokenizer,
)


def test_large_v3_layout():
    sp = SpecialTokens.from_vocab(51866, 100, 1501)
    assert sp.eot == 50257
    assert sp.sot == 50258
    assert sp.lang_begin == 50259
    assert sp.translate == 50359
    assert sp.transcribe == 50360
    assert sp.no_timestamps == 50364
    assert sp.timestamp_begin == 50365
    assert sp.timestamp_begin + sp.n_timestamps == 51866


def test_multilingual_v2_layout():
    sp = SpecialTokens.from_vocab(51865, 99, 1501)
    assert sp.eot == 50257
    assert sp.timestamp_begin == 50364


def test_sot_sequence_variants():
    sp = SpecialTokens.from_vocab(51866, 100, 1501)
    with_ts = sp.sot_sequence("en", "transcribe")
    no_ts = sp.sot_sequence("en", "transcribe", timestamps=False)
    assert with_ts == [sp.sot, sp.lang_token("en"), sp.transcribe]
    assert no_ts == with_ts + [sp.no_timestamps]
    assert sp.sot_sequence("en", "translate")[2] == sp.translate


def test_timestamp_seconds_roundtrip():
    sp = SpecialTokens.from_vocab(51866, 100, 1501)
    assert sp.timestamp_seconds(sp.timestamp_begin) == 0.0
    assert sp.timestamp_seconds(sp.timestamp_begin + 50) == pytest.approx(1.0)
    assert sp.is_timestamp(sp.timestamp_begin)
    assert not sp.is_timestamp(sp.timestamp_begin - 1)


def test_lang_token_roundtrip():
    sp = SpecialTokens.from_vocab(51866, 100, 1501)
    for code in ("en", "de", "ja", "zh"):
        assert sp.lang_code(sp.lang_token(code)) == code


def test_fallback_tokenizer_byte_roundtrip():
    tok = get_tokenizer(n_vocab=51866, n_langs=100)
    text = "Hello, wörld! 123"
    ids = tok.encode(text)
    assert tok.decode(ids) == text


def test_fallback_decode_skips_specials():
    tok = get_tokenizer(n_vocab=51866, n_langs=100)
    sp = tok.special
    ids = tok.encode("hi")
    noisy = [sp.sot, *ids, sp.timestamp_begin + 3, sp.eot]
    assert tok.decode(noisy) == "hi"


def test_tiny_vocab_layout_consistent():
    tok = get_tokenizer(n_vocab=384, n_langs=2)
    sp = tok.special
    assert sp.timestamp_begin + sp.n_timestamps == 384
    assert 0 < sp.eot < sp.sot < sp.lang_begin
