"""End-to-end greedy decode parity on a converted HF checkpoint.

Closes the round-1 gap "no end-to-end converted-checkpoint → decode →
exact tokens test": a random HF WhisperForConditionalGeneration is saved,
converted through our loader, and our jitted KV-cached greedy decode loop
must emit exactly the tokens a step-by-step torch argmax loop emits under
the same logit suppression. This proves the full inference path — weight
mapping, encoder, prefill, per-step cached attention, position offsets,
argmax — not just single-call logits (tests/test_hf_parity.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from open_speech_tpu.models.whisper.convert import load_params
from open_speech_tpu.models.whisper.decode import (
    DecodeOptions,
    _suppress_mask,
    greedy_decode,
)
from open_speech_tpu.models.whisper.model import encode
from open_speech_tpu.models.whisper.tokenizer import get_tokenizer


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    cfg = transformers.WhisperConfig(
        vocab_size=1000,
        num_mel_bins=80,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        d_model=64,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=1500,
        max_target_positions=448,
        pad_token_id=999,
        bos_token_id=998,
        eos_token_id=997,
        decoder_start_token_id=996,
    )
    torch.manual_seed(3)
    model = transformers.WhisperForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hfw_e2e")
    model.save_pretrained(d, safe_serialization=True)
    params, jcfg = load_params(str(d), dtype=jnp.float32)
    return model, params, jcfg


def test_greedy_decode_exact_token_parity(converted):
    model, params, jcfg = converted
    tok = get_tokenizer(n_vocab=jcfg.n_vocab, n_langs=jcfg.n_langs)
    sp = tok.special
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5

    max_new = 24
    opts = DecodeOptions(
        timestamps=False, suppress_blank=False, temperature=0.0,
        max_new_tokens=max_new,
    )
    prompt = np.asarray(
        [sp.sot_sequence("en", "transcribe", timestamps=False)], np.int32
    )

    enc = encode(params, jnp.asarray(mel), jcfg)
    res = greedy_decode(params, jcfg, sp, enc, prompt, opts)
    ours = list(res.tokens[0][: res.lengths[0]])

    # torch reference: literal argmax loop under the identical static mask
    mask = torch.from_numpy(_suppress_mask(jcfg.n_vocab, sp, opts))
    ids = list(prompt[0])
    ref: list[int] = []
    with torch.no_grad():
        feats = torch.from_numpy(mel)
        for _ in range(max_new):
            logits = model(
                input_features=feats,
                decoder_input_ids=torch.tensor([ids], dtype=torch.long),
            ).logits[0, -1]
            nxt = int(torch.argmax(logits + mask))
            if nxt == sp.eot:
                break
            ref.append(nxt)
            ids.append(nxt)

    assert ours == ref
    assert len(ref) > 0  # the parity must cover actual sampled tokens


def test_greedy_decode_batch_matches_single(converted):
    """Batched decode rows equal independent single-row decodes (the slot
    semantics the continuous batcher relies on)."""
    model, params, jcfg = converted
    sp = get_tokenizer(n_vocab=jcfg.n_vocab, n_langs=jcfg.n_langs).special
    rng = np.random.default_rng(11)
    mel = rng.standard_normal((3, 80, 3000)).astype(np.float32) * 0.5
    opts = DecodeOptions(
        timestamps=False, suppress_blank=False, max_new_tokens=16
    )
    prompt1 = np.asarray(
        [sp.sot_sequence("en", "transcribe", timestamps=False)], np.int32
    )
    enc = encode(params, jnp.asarray(mel), jcfg)
    batch = greedy_decode(
        params, jcfg, sp, enc, np.repeat(prompt1, 3, axis=0), opts
    )
    for i in range(3):
        single = greedy_decode(params, jcfg, sp, enc[i : i + 1], prompt1, opts)
        assert list(batch.tokens[i][: batch.lengths[i]]) == list(
            single.tokens[0][: single.lengths[0]]
        )
