"""Pallas flash attention vs the jnp reference (interpret mode on CPU).

Round-1 weak item: the Pallas kernel silently fell back to the O(T²)
reference whenever per-example kv_length masking was requested. The
masked kernel now exists (scalar-prefetched lengths + dead-block skip);
these tests pin it against mha_reference, including ragged lengths,
causal+masked combinations, and block-boundary lengths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.attention import (
    _flash_attention_tpu_dyn,
    mha_reference,
)


def _qkv(b=2, h=2, t_q=16, t_k=64, d=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
    return mk(b, h, t_q, d), mk(b, h, t_k, d), mk(b, h, t_k, d)


@pytest.mark.parametrize(
    "lengths", [[64, 64], [40, 17], [8, 64], [1, 33]]
)
def test_masked_flash_matches_reference(lengths):
    q, k, v = _qkv()
    kv_len = jnp.asarray(lengths, jnp.int32)
    ref = mha_reference(q, k, v, kv_length=kv_len)
    out = _flash_attention_tpu_dyn(
        q, k, v, kv_len, block_q=8, block_k=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_masked_flash_block_boundary_lengths():
    q, k, v = _qkv(t_k=48, seed=1)
    for length in (16, 32, 48):  # exact multiples of block_k
        kv_len = jnp.asarray([length, length], jnp.int32)
        ref = mha_reference(q, k, v, kv_length=kv_len)
        out = _flash_attention_tpu_dyn(
            q, k, v, kv_len, block_q=8, block_k=16, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, err_msg=str(length)
        )


def test_masked_causal_flash_matches_reference():
    q, k, v = _qkv(t_q=32, t_k=32, seed=2)
    kv_len = jnp.asarray([20, 32], jnp.int32)
    ref = mha_reference(q, k, v, causal=True, kv_length=kv_len)
    out = _flash_attention_tpu_dyn(
        q, k, v, kv_len, causal=True, block_q=8, block_k=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("t_q,t_k", [(8, 40), (16, 64), (24, 24)])
def test_causal_rectangular_is_end_aligned(t_q, t_k):
    """causal=True with t_k != t_q uses decode alignment (query end maps
    to key end), matching mha_reference — the kernel previously
    start-aligned the diagonal, silently truncating history on TPU."""
    q, k, v = _qkv(t_q=t_q, t_k=t_k, seed=7)
    kv_len = jnp.asarray([t_k, t_k], jnp.int32)
    ref = mha_reference(q, k, v, causal=True)
    out = _flash_attention_tpu_dyn(
        q, k, v, kv_len, causal=True, block_q=8, block_k=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_masked_flash_pads_ragged_kv():
    """kv not a block multiple: padding masked, result still matches."""
    q, k, v = _qkv(t_k=50, seed=3)
    kv_len = jnp.asarray([50, 23], jnp.int32)
    ref = mha_reference(q, k, v, kv_length=kv_len)
    out = _flash_attention_tpu_dyn(
        q, k, v, kv_len, block_q=8, block_k=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_zero_attendable_rows_return_zeros():
    """kv_length 0 rows (and causal rows left of the first key) return
    zeros on both the reference and kernel paths — not a uniform average
    over masked columns."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((2, 2, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 16, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 16, 8)), jnp.float32)
    out = np.asarray(
        mha_reference(q, k, v, kv_length=jnp.asarray([0, 5], jnp.int32))
    )
    assert np.all(out[0] == 0.0)
    assert np.any(out[1] != 0.0)
    # kernel (interpret mode) agrees
    from open_speech_tpu.ops.attention import _flash_attention_tpu_dyn

    got = np.asarray(
        _flash_attention_tpu_dyn(
            q, k, v, jnp.asarray([0, 5], jnp.int32),
            block_q=8, block_k=8, interpret=True,
        )
    )
    np.testing.assert_allclose(got, out, atol=2e-6)


def test_beam_select_attention_matches_materialized_gather():
    """beam_select_attention over un-permuted caches + a lineage row_map
    must equal decode_attention over caches physically gathered to the
    beams (the classic formulation) for arbitrary ancestries."""
    from open_speech_tpu.ops.attention import (
        beam_select_attention,
        decode_attention,
    )

    rng = np.random.default_rng(7)
    b, k, h, t, d = 2, 3, 2, 16, 8
    bk = b * k
    q = jnp.asarray(rng.standard_normal((bk, h, 1, d)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((bk, h, t, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((bk, h, t, d)), jnp.float32)
    # random ancestry: each (beam, pos) points at some slot of its own
    # batch row's k-group
    local = rng.integers(0, k, (bk, t))
    base = (np.arange(bk) // k * k)[:, None]
    row_map = jnp.asarray(base + local, jnp.int32)
    length = jnp.full((bk,), 11, jnp.int32)

    got = np.asarray(
        beam_select_attention(q, kc, vc, row_map, length, k)
    )
    # oracle: physically gather the caches per (row, position)
    kcn, vcn = np.asarray(kc), np.asarray(vc)
    k_g = np.empty_like(kcn)
    v_g = np.empty_like(vcn)
    rm = np.asarray(row_map)
    for j in range(bk):
        for pos in range(t):
            k_g[j, :, pos, :] = kcn[rm[j, pos], :, pos, :]
            v_g[j, :, pos, :] = vcn[rm[j, pos], :, pos, :]
    want = np.asarray(
        decode_attention(q, jnp.asarray(k_g), jnp.asarray(v_g), length)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
