"""L-BFGS with torch-closure semantics for a masked parameter group.

Reference parity: torch.optim.LBFGS(lr, max_iter, history_size) driven by a
closure that re-evaluates loss+grads (model_factory.py:54-56,74-75;
train.py:197-219) — each optimizer.step(closure) performs up to max_iter
inner iterations on the current mini-batch. SURVEY.md hard-part #6 notes
optax has no turnkey equivalent; this module builds one from optax.lbfgs:
the group's parameters are partitioned out of the full tree, a pure
value_fn closes over the frozen remainder and the batch, and a lax.scan of
max_iter update+linesearch iterations reproduces the closure loop. L-BFGS
memory persists across batches (as torch's does).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def partition(params: Any, mask: Any) -> Tuple[Any, Any]:
    """Split params into (trainable, frozen) trees by boolean mask; the
    non-selected side holds None placeholders."""
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def combine(trainable: Any, frozen: Any) -> Any:
    return jax.tree.map(
        lambda t, f: t if f is None else f,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def make_lbfgs_tx(lr: float, history: int) -> optax.GradientTransformation:
    """The group's real L-BFGS transform. lr is read per step so the plateau
    scheduler can rescale it (torch rescales any optimizer's lr,
    train.py:57-60,184-194); the state structure is lr-independent."""
    return optax.lbfgs(
        learning_rate=lr,
        memory_size=history,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=15),
    )


def init_lbfgs_entry(params: Any, mask: Any, lr: float, history: int) -> Any:
    """Curvature-memory state over the masked trainable subset. Lives in the
    opt_state dict (keys 'decoder_lbfgs'/'encoder_lbfgs') so checkpoint
    save/restore round-trips it — an L-BFGS run resumes bit-identically."""
    trainable, _ = partition(params, mask)
    return make_lbfgs_tx(lr, history).init(trainable)


class LBFGSGroup:
    """Closure-style L-BFGS over one masked param group (stateless: the
    curvature memory is passed in/out as `entry`)."""

    def __init__(self, mask: Any, max_iter: int, history: int):
        self.mask = mask
        self.max_iter = max_iter
        self.history = history

    def step(
        self,
        params: Any,
        loss_of_params: Callable[[Any], jnp.ndarray],
        entry: Any,
        lr: float,
    ) -> Tuple[Any, Any, jnp.ndarray]:
        """One torch-style optimizer.step(closure): up to max_iter L-BFGS
        iterations on this batch. Returns (new full params, new entry,
        first loss as a traced scalar — no host sync, so the whole train
        step stays jittable)."""
        trainable, frozen = partition(params, self.mask)
        tx = make_lbfgs_tx(lr, self.history)

        def value_fn(tr):
            return loss_of_params(combine(tr, frozen))

        value_and_grad = optax.value_and_grad_from_state(value_fn)

        def body(carry, _):
            tr, st = carry
            v, g = value_and_grad(tr, state=st)
            updates, st = tx.update(
                g, st, tr, value=v, grad=g, value_fn=value_fn
            )
            tr = optax.apply_updates(tr, updates)
            return (tr, st), v

        (trainable, entry), values = jax.lax.scan(
            body, (trainable, entry), None, length=self.max_iter
        )
        return combine(trainable, frozen), entry, values[0]


def make_lbfgs_train_step(model, dual, cf):
    """Train step used when either optimizer group is 'lbfgs'.

    Reference semantics (train.py:108-115 + model_optimize:197-219): the
    decoder group steps first; when CNN fine-tuning is on, the encoder group
    steps after — adam/sgd groups reuse the initial backward's gradients,
    lbfgs groups re-evaluate the loss closure up to max_iter times on the
    same batch. BN running stats update once from the initial forward (not
    per inner L-BFGS iteration). One jitted program per encoder_on value,
    like the adam/sgd step (step.py:167) — the inner closure loop is a
    lax.scan, so the max_iter re-evaluations never leave the device
    (eager dispatch through this rig's ~2 ms/op tunnel would dominate).
    """
    import optax

    from adaptive_tpu.ops.preprocess import train_preprocess
    from adaptive_tpu.training.optim import get_lr
    from adaptive_tpu.training.step import StepOutput, clip_lstm_grads, masked_ce_loss

    groups = {}
    if dual.decoder_is_lbfgs:
        groups["decoder"] = LBFGSGroup(
            dual.decoder_mask, cf.opt_rnn_lbfgs_max_iter, cf.opt_rnn_lbfgs_history
        )
    if dual.encoder_is_lbfgs:
        groups["encoder"] = LBFGSGroup(
            dual.encoder_mask, cf.opt_cnn_lbfgs_max_iter, cf.opt_cnn_lbfgs_history
        )

    # NO buffer donation here (unlike step.py:167): optax.lbfgs's curvature
    # state holds the previous params tree, which at step 1 ALIASES the live
    # params leaves — donating both trees donates the same buffer twice.
    @partial(jax.jit, static_argnames=("encoder_on",))
    def train_step(params, state, opt_state, batch, rng, encoder_on=False):
        def loss_fn(p, s):
            images = train_preprocess(
                rng, batch["images"], cf.train_crop_size, model.compute_dtype
            )
            scores, _, new_s = model.forward(p, s, images, batch["captions"], train=True)
            return masked_ce_loss(scores, batch["captions"], batch["lengths"]), new_s

        (loss, new_state), grads = jax.value_and_grad(
            lambda p: loss_fn(p, state), has_aux=True
        )(params)
        grads, lstm_norm = clip_lstm_grads(grads, cf.train_lstm_maxnormal)
        value_fn = lambda p: loss_fn(p, state)[0]  # noqa: E731 - closure for lbfgs

        new_opt = dict(opt_state)
        if "decoder" in groups:
            params, new_opt["decoder_lbfgs"], _ = groups["decoder"].step(
                params, value_fn, opt_state["decoder_lbfgs"], get_lr(opt_state, "decoder")
            )
        else:
            upd, new_opt["decoder"] = dual.decoder_tx.update(
                grads, opt_state["decoder"], params
            )
            params = optax.apply_updates(params, upd)

        if encoder_on:
            if "encoder" in groups:
                params, new_opt["encoder_lbfgs"], _ = groups["encoder"].step(
                    params, value_fn, opt_state["encoder_lbfgs"], get_lr(opt_state, "encoder")
                )
            else:
                upd, new_opt["encoder"] = dual.encoder_tx.update(
                    grads, opt_state["encoder"], params
                )
                params = optax.apply_updates(params, upd)

        return StepOutput(params, new_state, new_opt, loss, lstm_norm)

    return train_step
