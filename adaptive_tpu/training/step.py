"""The jitted training step: loss, grads, clipping, dual-optimizer updates.

Reference parity:
* loss: CrossEntropyLoss over pack_padded_sequence'd scores vs. shifted
  targets (train.py:101-102,208; baseline_attention.py:228) == masked mean CE
  over positions t < length-1 with target captions[:, t+1]. Static padded
  shapes + masking replace packing (TPU needs static shapes).
* grad clip: clip_grad_norm_(decoder.LSTM params, max_norm=5) — global norm
  over the 4 LSTM tensors only, scale max/(norm+1e-6) (train.py:213-214).
* update order: decoder step with the closure's grads, then encoder step
  reusing the SAME gradients when fine-tuning is on (train.py:108-115).
* on-device augmentation (random crop + flip + normalize) runs inside the
  step, replacing the host-side torchvision pipeline (train.py:29-34).

One jitted function; `encoder_on` is a static arg (two executables: epochs
before/after CNN fine-tune start — mirrors train.py:89-91).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from adaptive_tpu.ops.preprocess import train_preprocess
from adaptive_tpu.training.optim import DualOptimizer


def masked_ce_sum(scores: jnp.ndarray, captions: jnp.ndarray, lengths: jnp.ndarray):
    """(sum of NLL over valid positions, number of valid positions).

    scores [B,T,V] from teacher forcing over captions [B,T]; target at step t
    is captions[:, t+1]; positions t < length-1 are valid (train.py:101-102).
    Split from the mean so gradient accumulation can combine microbatches
    exactly (sum/count accumulate linearly; means of means do not when
    microbatches hold different valid-token counts)."""
    B, T, V = scores.shape
    logits = scores[:, : T - 1, :].astype(jnp.float32)
    targets = captions[:, 1:]
    mask = jnp.arange(T - 1)[None, :] < (lengths[:, None] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask), jnp.sum(mask)


def masked_ce_loss(scores: jnp.ndarray, captions: jnp.ndarray, lengths: jnp.ndarray):
    """Mean cross-entropy over valid next-token positions (see masked_ce_sum)."""
    s, n = masked_ce_sum(scores, captions, lengths)
    return s / jnp.maximum(n, 1)


def clip_lstm_grads(grads: Dict, max_norm: float) -> Tuple[Dict, jnp.ndarray]:
    """torch clip_grad_norm_ over decoder.LSTM params only (train.py:213-214)."""
    lstm = grads["decoder"]["lstm"]
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(lstm)))
    coef = jnp.minimum(max_norm / (total + 1e-6), 1.0)
    clipped = jax.tree.map(lambda g: g * coef, lstm)
    new_grads = dict(grads)
    new_grads["decoder"] = dict(grads["decoder"])
    new_grads["decoder"]["lstm"] = clipped
    return new_grads, total


class StepOutput(NamedTuple):
    params: Any
    model_state: Any
    opt_state: Any
    loss: jnp.ndarray
    lstm_grad_norm: jnp.ndarray


def make_train_step(model, dual: DualOptimizer, cf):
    """Returns train_step(params, model_state, opt_state, batch, rng, encoder_on).

    batch: images uint8 NHWC [B,S,S,3], captions int32 [B,T], lengths int32 [B].
    """
    crop = cf.train_crop_size
    max_norm = cf.train_lstm_maxnormal
    accum = max(1, int(getattr(cf, "train_grad_accum_steps", 1)))

    def sum_loss_fn(params, model_state, batch, rng, encoder_on: bool):
        if not encoder_on:
            # Before the CNN fine-tune epoch the reference computes ResNet
            # grads and throws them away (train.py:108-115 steps only the
            # decoder group). Stopping gradients at the ResNet params lets XLA
            # dead-code-eliminate the entire conv backward — same updates
            # (decoder group excludes resnet, optim.py param_group_masks),
            # ~2x step throughput for epochs < fine-tune start. affine_a/b sit
            # after the backbone so their grads don't need the conv backward.
            enc = dict(params["encoder"])
            enc["resnet"] = jax.lax.stop_gradient(enc["resnet"])
            params = {**params, "encoder": enc}
        if model.dropout_rate:
            # One key for crop/flip, one for dropout masks; rate==0 keeps the
            # single-key path so existing runs stay bit-identical.
            rng, drop_rng = jax.random.split(rng)
        else:
            drop_rng = None
        images = train_preprocess(rng, batch["images"], crop, model.compute_dtype)
        scores, _, new_state = model.forward(
            params, model_state, images, batch["captions"], train=True,
            dropout_rng=drop_rng,
        )
        sum_nll, n_valid = masked_ce_sum(scores, batch["captions"], batch["lengths"])
        return sum_nll, (n_valid, new_state)

    def grads_full(params, model_state, batch, rng, encoder_on):
        (sum_nll, (n_valid, new_state)), grads = jax.value_and_grad(
            sum_loss_fn, has_aux=True
        )(params, model_state, batch, rng, encoder_on)
        n = jnp.maximum(n_valid, 1).astype(jnp.float32)
        return jax.tree.map(lambda g: g / n, grads), sum_nll / n, new_state

    def grads_accum(params, model_state, batch, rng, encoder_on):
        """lax.scan over `accum` microbatches; grads == the full-batch gradient
        exactly (sum-of-NLL grads and valid counts accumulate linearly, one
        division at the end). BN running stats update once per microbatch —
        standard grad-accumulation semantics (torch behaves the same)."""
        B = batch["images"].shape[0]
        assert B % accum == 0, (
            f"train_grad_accum_steps={accum} must divide batch size {B}"
        )
        micro = {k: v.reshape(accum, B // accum, *v.shape[1:]) for k, v in batch.items()}
        keys = jax.random.split(rng, accum)

        # With the encoder frozen its grads are identically zero (stop_gradient
        # above): keep the ~230 MB f32 ResNet subtree OUT of the scan carry —
        # this is exactly the memory-bound regime accumulation exists for.
        # encoder_on is static, so plain Python branching here.
        if encoder_on:
            prune = lambda t: t
            unprune = lambda g: g
        else:
            prune = lambda t: {
                **t, "encoder": {k: v for k, v in t["encoder"].items() if k != "resnet"}
            }
            unprune = lambda g: {
                **g,
                "encoder": {
                    **g["encoder"],
                    "resnet": jax.tree.map(
                        lambda p: jnp.zeros_like(p), params["encoder"]["resnet"]
                    ),
                },
            }
        g0 = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), prune(params))

        def body(carry, inp):
            g, s_nll, s_n, state = carry
            mb, key = inp
            (sum_nll, (n, state)), gm = jax.value_and_grad(sum_loss_fn, has_aux=True)(
                params, state, mb, key, encoder_on
            )
            g = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), g, prune(gm))
            return (g, s_nll + sum_nll, s_n + n, state), None

        (g, s_nll, s_n, new_state), _ = jax.lax.scan(
            body, (g0, jnp.float32(0), jnp.int32(0), model_state), (micro, keys)
        )
        n = jnp.maximum(s_n, 1).astype(jnp.float32)
        grads = jax.tree.map(lambda a, p: (a / n).astype(p.dtype), g, prune(params))
        return unprune(grads), s_nll / n, new_state

    @partial(jax.jit, static_argnames=("encoder_on",), donate_argnums=(0, 1, 2))
    def train_step(params, model_state, opt_state, batch, rng, encoder_on: bool = False):
        compute = grads_accum if accum > 1 else grads_full
        grads, loss, new_model_state = compute(params, model_state, batch, rng, encoder_on)
        grads, lstm_norm = clip_lstm_grads(grads, max_norm)

        upd_d, new_d = dual.decoder_tx.update(grads, opt_state["decoder"], params)
        params = optax.apply_updates(params, upd_d)
        if encoder_on:
            # reference reuses the same backward's grads for the encoder step
            # (train.py:111-115, adam path)
            upd_e, new_e = dual.encoder_tx.update(grads, opt_state["encoder"], params)
            params = optax.apply_updates(params, upd_e)
        else:
            new_e = opt_state["encoder"]
        return StepOutput(params, new_model_state, {"decoder": new_d, "encoder": new_e}, loss, lstm_norm)

    return train_step


def make_eval_loss_step(model, cf):
    """Jitted masked-CE eval loss on a batch (no aug: center semantics differ —
    eval uses resize, handled by caller's preprocessing)."""

    @jax.jit
    def eval_loss(params, model_state, images, captions, lengths):
        scores, _, _ = model.forward(params, model_state, images, captions, train=False)
        return masked_ce_loss(scores, captions, lengths)

    return eval_loss
