"""Dual optimizers (decoder / encoder-finetune) with torch-equivalent updates.

Reference parity: model_factory.py:27-93 —
* decoder group = encoder.affine_a + encoder.affine_b + all decoder params
  (model_factory.py:63-66); NOTE encoder.affine_h0/affine_c0 are in NEITHER
  group in the reference (never optimized) — replicated intentionally.
* encoder group = ResNet children [opt_fine_tune_cnn_start_layer:]
  (model_factory.py:35-39), stepped only from epoch
  opt_fine_tune_cnn_start_epoch+1 (train.py:89-91,111-115).
* per-group optimizer choice adam | sgd(nesterov) | lbfgs with the cfg's
  hyperparameters (model_factory.py:42-77). torch Adam's weight_decay is L2
  added to the gradient before moments => optax add_decayed_weights *before*
  the adam transform.

Learning rates are injected hyperparams so the host-side plateau scheduler
can adjust them without re-jitting.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from adaptive_tpu.models.resnet import finetune_mask


def _adam(lr, b1, b2, wd):
    tx = optax.chain(
        optax.add_decayed_weights(wd) if wd else optax.identity(),
        optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),  # torch Adam eps
        optax.scale_by_learning_rate(lr),
    )
    return tx


def _sgd(lr, momentum, wd):
    return optax.chain(
        optax.add_decayed_weights(wd) if wd else optax.identity(),
        optax.trace(decay=momentum, nesterov=True),
        optax.scale_by_learning_rate(lr),
    )


def make_group_optimizer(kind: str, cfg_prefix: str, cf) -> optax.GradientTransformation:
    """kind: 'rnn' (decoder group) or 'cnn' (encoder group)."""
    opt_name = getattr(cf, f"opt_{kind}_optimization")

    def knob(name):
        return getattr(cf, f"opt_{kind}_{name}")

    if opt_name == "adam":
        base = lambda learning_rate: _adam(
            learning_rate, knob("adam_alpha"), knob("adam_beta"), knob("adam_weight_decay")
        )
        lr0 = knob("adam_learning_rate")
    elif opt_name == "sgd":
        base = lambda learning_rate: _sgd(
            learning_rate, knob("sgd_momentum"), knob("sgd_weight_decay")
        )
        lr0 = knob("sgd_learning_rate")
    elif opt_name == "lbfgs":
        # lr-carrier transform ONLY: when a group is 'lbfgs' the train loop
        # routes through training/lbfgs.py:make_lbfgs_train_step (closure
        # semantics), whose curvature memory lives under
        # opt_state['<group>_lbfgs']. This inject_hyperparams state is never
        # stepped but IS the group's scheduled learning rate: get_lr/set_lr
        # target it, so the plateau scheduler rescales L-BFGS lrs exactly as
        # torch does (train.py:57-60,184-194). It must stay stateless — an
        # earlier optax.lbfgs carrier allocated the full 2*h*n curvature
        # zeros here (5+ GB dead weight at the reference's history=50) whose
        # XLA-aliased zero buffers also broke train-step buffer donation.
        base = lambda learning_rate: optax.scale_by_learning_rate(learning_rate)
        lr0 = knob("lbfgs_lr")
    else:
        raise ValueError(f"unknown optimizer {opt_name!r}")

    return optax.inject_hyperparams(base)(learning_rate=lr0)


def param_group_masks(params: Dict, cf) -> Tuple[Dict, Dict]:
    """(decoder_mask, encoder_mask): boolean pytrees over the full param tree.

    decoder group: encoder.affine_a/affine_b + decoder.* (model_factory.py:63-66)
    encoder group: resnet children [start_layer:]        (model_factory.py:35-39)
    """
    enc = params["encoder"]
    false_like = lambda t: jax.tree.map(lambda _: False, t)
    true_like = lambda t: jax.tree.map(lambda _: True, t)

    decoder_mask = {
        "encoder": {
            "resnet": false_like(enc["resnet"]),
            "affine_a": true_like(enc["affine_a"]),
            "affine_b": true_like(enc["affine_b"]),
            "affine_h0": false_like(enc["affine_h0"]),  # never optimized in ref
            "affine_c0": false_like(enc["affine_c0"]),
        },
        "decoder": true_like(params["decoder"]),
    }
    encoder_mask = {
        "encoder": {
            "resnet": finetune_mask(enc["resnet"], cf.opt_fine_tune_cnn_start_layer),
            "affine_a": false_like(enc["affine_a"]),
            "affine_b": false_like(enc["affine_b"]),
            "affine_h0": false_like(enc["affine_h0"]),
            "affine_c0": false_like(enc["affine_c0"]),
        },
        "decoder": false_like(params["decoder"]),
    }
    return decoder_mask, encoder_mask


class DualOptimizer(NamedTuple):
    """Two masked optimizers sharing the param tree."""

    decoder_tx: optax.GradientTransformation
    encoder_tx: optax.GradientTransformation
    decoder_mask: Any
    encoder_mask: Any
    encoder_is_lbfgs: bool
    decoder_is_lbfgs: bool


def _grouped(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Apply tx to mask=True leaves, zero updates elsewhere. (optax.masked
    alone passes non-masked grads through unchanged — that would apply raw
    grads to frozen params.)"""
    labels = jax.tree.map(lambda m: "on" if m else "off", mask)
    return optax.multi_transform({"on": tx, "off": optax.set_to_zero()}, labels)


def make_dual_optimizer(params: Dict, cf) -> Tuple[DualOptimizer, Dict]:
    dmask, emask = param_group_masks(params, cf)
    dtx = _grouped(make_group_optimizer("rnn", "opt_rnn", cf), dmask)
    etx = _grouped(make_group_optimizer("cnn", "opt_cnn", cf), emask)
    opt_state = {"decoder": dtx.init(params), "encoder": etx.init(params)}
    # L-BFGS curvature memory lives in opt_state so checkpoints round-trip it
    if cf.opt_rnn_optimization == "lbfgs":
        from adaptive_tpu.training.lbfgs import init_lbfgs_entry

        opt_state["decoder_lbfgs"] = init_lbfgs_entry(
            params, dmask, cf.opt_rnn_lbfgs_lr, cf.opt_rnn_lbfgs_history
        )
    if cf.opt_cnn_optimization == "lbfgs":
        from adaptive_tpu.training.lbfgs import init_lbfgs_entry

        opt_state["encoder_lbfgs"] = init_lbfgs_entry(
            params, emask, cf.opt_cnn_lbfgs_lr, cf.opt_cnn_lbfgs_history
        )
    dual = DualOptimizer(
        decoder_tx=dtx,
        encoder_tx=etx,
        decoder_mask=dmask,
        encoder_mask=emask,
        encoder_is_lbfgs=cf.opt_cnn_optimization == "lbfgs",
        decoder_is_lbfgs=cf.opt_rnn_optimization == "lbfgs",
    )
    return dual, opt_state


def get_lr(opt_state, group: str) -> float:
    """Current injected learning rate of a grouped optimizer state.

    Host callers (scheduler, logging) get a plain float; under a jit trace
    (the L-BFGS train step reads the lr it feeds its inner transform,
    lbfgs.py:150) the traced scalar is returned as-is."""
    inject = opt_state[group].inner_states["on"].inner_state
    lr = inject.hyperparams["learning_rate"]
    return lr if isinstance(lr, jax.core.Tracer) else float(lr)


def set_lr(opt_state, group: str, lr: float):
    """Functionally set the injected learning rate (host-side scheduler hook)."""
    masked = opt_state[group].inner_states["on"]
    inject = masked.inner_state
    hp = dict(inject.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_masked = masked._replace(inner_state=inject._replace(hyperparams=hp))
    new_group = opt_state[group]._replace(
        inner_states={**opt_state[group].inner_states, "on": new_masked}
    )
    return {**opt_state, group: new_group}
