"""Whisper fine-tuning: sharded training step (no reference counterpart).

The reference is inference-only; this module adds a capability the TPU build
gets almost for free from the functional model: a full training step
(teacher-forced cross-entropy over the decoder, AdamW update) that jits over
a ("data", "model") mesh — batch sharded over data, matmuls tensor-parallel
over model, gradients all-reduced by GSPMD. Used for fine-tuning on domain
audio and by the multi-chip dry-run harness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from open_speech_tpu.models.whisper.model import (
    WhisperConfig,
    decoder_forward,
    encode,
)


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def loss_fn(params, batch, cfg: WhisperConfig):
    """Teacher-forced NLL. batch: {mel [B,M,T], tokens [B,S], mask [B,S]}.

    tokens[:, :-1] are inputs, tokens[:, 1:] targets; mask marks real
    (non-pad) target positions.
    """
    enc_out = encode(params, batch["mel"], cfg)
    logits = decoder_forward(params, batch["tokens"][:, :-1], enc_out, cfg)
    targets = batch["tokens"][:, 1:]
    mask = batch["mask"][:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@partial(jax.jit, static_argnames=("cfg", "optimizer"), donate_argnums=(0, 1))
def train_step(params, opt_state, batch, cfg: WhisperConfig, optimizer):
    """One update. Shapes/shardings flow from the inputs' placement."""
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, cfg)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def init_train_state(params, optimizer):
    return optimizer.init(params)
