"""L-BFGS with torch-closure semantics for a masked parameter group.

Reference parity: torch.optim.LBFGS(lr, max_iter, history_size) driven by a
closure that re-evaluates loss+grads (model_factory.py:54-56,74-76;
train.py:197-219) — each optimizer.step(closure) performs up to max_iter
inner iterations on the current mini-batch. The reference passes NO
line_search_fn, so steps are plain lr-scaled moves along the two-loop
direction (first-ever iteration: t = min(1, 1/|g|_1) * lr), with torch's
convergence breaks (tolerance_grad=1e-7 on max|g|, tolerance_change=1e-9 on
step size / loss change / directional derivative). L-BFGS curvature memory
persists across batches (as torch's does), including torch's quirk of
forming the first (s, y) pair of a new batch against the previous batch's
last gradient.

TPU-first shape: the group's trainable subset is flattened to ONE vector
(jax.flatten_util.ravel_pytree) and the s/y history lives as two [h, n]
ring-buffer matrices updated with in-place dynamic slice writes — the
two-loop recursion becomes h masked dot products over contiguous rows
instead of 2*h tree_maps over a 50-deep list of pytrees, and the state
never aliases the live params tree, so the train step can donate it (at the
reference's history_size=50 the memory is ~5 GB fp32 for the decoder group;
an earlier optax.lbfgs+zoom-linesearch formulation double-carried that and
compile-OOMed the 16 GB v5e). The inner closure loop is a lax.while_loop
(torch's convergence breaks exit it early), so the max_iter re-evaluations
never leave the device — eager dispatch through this rig's ~2 ms/op tunnel
would dominate.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

# torch.optim.LBFGS defaults (the reference passes only lr/max_iter/history)
TOLERANCE_GRAD = 1e-7
TOLERANCE_CHANGE = 1e-9
CURVATURE_EPS = 1e-10  # torch: pairs kept only when y.s > 1e-10


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


class LBFGSMemory(NamedTuple):
    """Curvature state over the FLAT trainable vector. Ring buffer: row
    (head-1) % h is the newest pair; `count` rows are valid. Persisted in
    the opt_state dict (keys 'decoder_lbfgs'/'encoder_lbfgs') so checkpoint
    save/restore round-trips it — an L-BFGS run resumes bit-identically.
    Holds parameter/gradient DIFFS, never the params themselves (donation-
    safe: nothing here aliases the live params tree)."""

    s: jnp.ndarray          # [h, n] parameter diffs   (torch old_stps)
    y: jnp.ndarray          # [h, n] gradient diffs    (torch old_dirs)
    rho: jnp.ndarray        # [h]    1 / (y . s)
    head: jnp.ndarray       # int32  next ring write slot
    count: jnp.ndarray      # int32  valid rows
    d: jnp.ndarray          # [n]    last direction    (torch state['d'])
    t: jnp.ndarray          # f32    last step size    (torch state['t'])
    prev_grad: jnp.ndarray  # [n]    last gradient     (torch prev_flat_grad)
    prev_loss: jnp.ndarray  # f32
    n_iter: jnp.ndarray     # int32  cumulative inner iterations


def init_lbfgs_entry(params: Any, mask: Any, lr: float, history: int) -> LBFGSMemory:
    """Fresh curvature memory sized to the masked trainable subset. (lr is
    unused at init — it is read per step so the plateau scheduler can
    rescale it, torch train.py:57-60,184-194 — but kept in the signature so
    optim.py builds entries uniformly.)"""
    del lr
    trainable, _ = partition(params, mask)
    flat, _ = ravel_pytree(trainable)
    n = flat.shape[0]
    f = flat.dtype
    return LBFGSMemory(
        s=jnp.zeros((history, n), f),
        y=jnp.zeros((history, n), f),
        rho=jnp.zeros((history,), f),
        head=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        d=jnp.zeros((n,), f),
        t=jnp.zeros((), f),
        prev_grad=jnp.zeros((n,), f),
        prev_loss=jnp.zeros((), f),
        n_iter=jnp.zeros((), jnp.int32),
    )


def _two_loop(mem: LBFGSMemory, g: jnp.ndarray, h: int) -> jnp.ndarray:
    """Two-loop recursion (Nocedal & Wright alg. 7.4) over the ring buffer:
    d = -H.g with H_diag = (y.s)/(y.y) of the newest pair (identity when the
    memory is empty — then d = -g, torch's first-iteration branch)."""
    q = -g

    def newest_to_oldest(k, carry):
        q, al = carry
        i = (mem.head - 1 - k) % h
        valid = k < mem.count
        a = mem.rho[i] * jnp.dot(mem.s[i], q)
        q = jnp.where(valid, q - a * mem.y[i], q)
        al = al.at[i].set(jnp.where(valid, a, 0.0))
        return q, al

    q, al = jax.lax.fori_loop(0, h, newest_to_oldest, (q, jnp.zeros((h,), g.dtype)))

    newest = (mem.head - 1) % h
    ys = jnp.where(mem.count > 0, 1.0 / mem.rho[newest], 1.0)
    yy = jnp.dot(mem.y[newest], mem.y[newest])
    h_diag = jnp.where(mem.count > 0, ys / yy, 1.0)
    r = q * h_diag

    def oldest_to_newest(k, r):
        i = (mem.head - mem.count + k) % h
        valid = k < mem.count
        be = mem.rho[i] * jnp.dot(mem.y[i], r)
        return jnp.where(valid, r + (al[i] - be) * mem.s[i], r)

    return jax.lax.fori_loop(0, h, oldest_to_newest, r)


class LBFGSGroup:
    """Closure-style L-BFGS over one masked param group (stateless: the
    curvature memory is passed in/out as `entry`)."""

    def __init__(self, mask: Any, max_iter: int, history: int,
                 grad_transform: Optional[Callable[[Any], Tuple[Any, jnp.ndarray]]] = None):
        self.mask = mask
        self.max_iter = max_iter
        self.history = history
        # Applied to the TREE gradient on every closure evaluation, before
        # flattening — the reference's closure clips decoder.LSTM grads
        # inside itself (train.py:203-216 with lstm_clip_grad=True), so
        # torch's LBFGS consumes CLIPPED gradients for every direction and
        # curvature pair. Returns (transformed grads, aux scalar); the aux
        # from the LAST evaluation is reported by step() — the reference logs
        # clip_grad_norm_'s return from the last closure call (total_norm[-1],
        # train.py:219). The decoder group passes clip_lstm_grads here; the
        # encoder group passes None (train.py:113 calls with False).
        self.grad_transform = grad_transform
        # torch's default eval budget max_eval = max_iter*5//4 (the reference
        # does not override it). Without a linesearch each inner iteration
        # costs exactly one re-evaluation (the initial closure is eval #1 and
        # the max_iter-th iteration skips its re-eval), so the budget caps
        # the iteration count at max(1, max_eval-1) — it binds only for
        # max_iter < 4 (e.g. max_iter=2 runs ONE iteration, as torch does);
        # the reference's max_iter=20 is unaffected.
        self.max_eval = max_iter * 5 // 4
        self.effective_iters = min(max_iter, max(1, self.max_eval - 1))

    def step(
        self,
        params: Any,
        loss_of_params: Callable[[Any], jnp.ndarray],
        entry: LBFGSMemory,
        lr: float,
    ) -> Tuple[Any, LBFGSMemory, jnp.ndarray, Any, jnp.ndarray]:
        """One torch-style optimizer.step(closure): up to max_iter plain
        lr-scaled L-BFGS iterations on this batch, with torch's convergence
        breaks. Returns (new full params, new entry, first loss, eval_params,
        last grad_transform aux) — all traced, no host sync, so the whole
        train step stays jittable. eval_params is the point of the LAST
        closure evaluation (== the final params only when the final update
        was re-evaluated; torch skips the re-eval on the max_iter'th
        iteration, leaving .grad one update stale) — it is where torch's
        .grad buffers point after step(closure) returns, which the
        reference's encoder_optimizer.step() then consumes (train.py:111-114).
        """
        trainable, frozen = partition(params, self.mask)
        flat0, unravel = ravel_pytree(trainable)
        h = self.history

        def value_and_grad_flat(x):
            v, g_tree = jax.value_and_grad(
                lambda tr: loss_of_params(combine(tr, frozen))
            )(unravel(x))
            aux = jnp.zeros((), jnp.float32)
            if self.grad_transform is not None:
                g_tree, aux = self.grad_transform(g_tree)
                aux = aux.astype(jnp.float32)
            return v, ravel_pytree(g_tree)[0], aux

        loss0, g0, aux0 = value_and_grad_flat(flat0)
        # torch returns immediately when the initial gradient already
        # satisfies tolerance_grad — params and curvature state untouched
        done0 = jnp.max(jnp.abs(g0)) <= TOLERANCE_GRAD

        def cond(carry):
            k, _, _, _, _, done, _, _ = carry
            return (k < self.effective_iters) & ~done

        def body(carry):
            k, x, v, g, mem, _, x_eval, aux = carry
            n_iter = mem.n_iter + 1
            is_first = n_iter == 1

            # curvature pair from the PREVIOUS iteration's (d, t, prev_grad)
            # — torch forms it at the top of the next iteration, including
            # across step()/batch boundaries
            def with_pair(m):
                y = g - m.prev_grad
                s = m.d * m.t
                ys = jnp.dot(y, s)

                def push(mm):
                    return mm._replace(
                        s=mm.s.at[mm.head].set(s),
                        y=mm.y.at[mm.head].set(y),
                        rho=mm.rho.at[mm.head].set(1.0 / ys),
                        head=(mm.head + 1) % h,
                        count=jnp.minimum(mm.count + 1, h),
                    )

                return jax.lax.cond(ys > CURVATURE_EPS, push, lambda mm: mm, m)

            mem = jax.lax.cond(is_first, lambda m: m, with_pair, mem)
            d = _two_loop(mem, g, h)
            t = jnp.where(
                is_first, jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g))) * lr, lr
            ).astype(g.dtype)
            mem = mem._replace(d=d, t=t, prev_grad=g, prev_loss=v, n_iter=n_iter)

            gtd = jnp.dot(g, d)
            stop_pre = gtd > -TOLERANCE_CHANGE  # not a descent direction
            x2 = jnp.where(stop_pre, x, x + t * d)
            # torch skips the closure re-evaluation only on the max_iter'th
            # iteration ("no use to re-evaluate that function here") — NOT
            # when the exit reason is the max_eval budget, where the re-eval
            # runs first and the break happens after it (so .grad/.eval point
            # land on the final params in that case)
            last = (k + 1) >= self.max_iter
            skip = stop_pre | last
            v2, g2, aux2 = jax.lax.cond(
                skip, lambda: (v, g, aux), lambda: value_and_grad_flat(x2)
            )
            x_eval2 = jnp.where(skip, x_eval, x2)
            done = (
                stop_pre
                | (jnp.max(jnp.abs(g2)) <= TOLERANCE_GRAD)
                | (jnp.max(jnp.abs(t * d)) <= TOLERANCE_CHANGE)
                | (jnp.abs(v2 - v) < TOLERANCE_CHANGE)
            )
            return k + 1, x2, v2, g2, mem, done, x_eval2, aux2

        _, flat, _, _, entry, _, x_eval, aux = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), flat0, loss0, g0, entry, done0, flat0, aux0),
        )
        return (
            combine(unravel(flat), frozen),
            entry,
            loss0,
            combine(unravel(x_eval), frozen),
            aux,
        )


def make_lbfgs_train_step(model, dual, cf):
    """Train step used when either optimizer group is 'lbfgs'.

    Reference semantics (train.py:108-115 + model_optimize:197-219): the
    decoder group steps first; when CNN fine-tuning is on, the encoder group
    steps after — adam/sgd groups reuse the initial backward's gradients,
    lbfgs groups re-evaluate the loss closure up to max_iter times on the
    same batch. BN running stats update once from the initial forward (not
    per inner L-BFGS iteration). One jitted program per encoder_on value,
    like the adam/sgd step (step.py:167). Donation matches step.py: the
    LBFGSMemory state holds only s/y diffs (never the params tree), so
    params/state/opt_state donate cleanly — at the reference's
    history_size=50 the ~5 GB curvature memory would otherwise be carried
    twice per step (measured compile-OOM on the 16 GB v5e).
    """
    import optax

    from adaptive_tpu.models import decoders as D
    from adaptive_tpu.models import encoder as E
    from adaptive_tpu.ops.preprocess import train_preprocess
    from adaptive_tpu.training.optim import get_lr
    from adaptive_tpu.training.step import StepOutput, clip_lstm_grads, masked_ce_loss

    from adaptive_tpu.ops.dropout import make_dropout

    groups = {}
    if dual.decoder_is_lbfgs:
        # the reference's decoder closure clips LSTM grads on EVERY
        # re-evaluation (model_optimize with lstm_clip_grad=True,
        # train.py:108,213-214) — torch's LBFGS sees clipped gradients, and
        # the clip's pre-clip norm from the LAST evaluation is the logged
        # total_norm[-1] (train.py:219)
        groups["decoder"] = LBFGSGroup(
            dual.decoder_mask, cf.opt_rnn_lbfgs_max_iter, cf.opt_rnn_lbfgs_history,
            grad_transform=lambda g: clip_lstm_grads(g, cf.train_lstm_maxnormal),
        )
    if dual.encoder_is_lbfgs:
        # encoder closure runs with lstm_clip_grad=False (train.py:113)
        groups["encoder"] = LBFGSGroup(
            dual.encoder_mask, cf.opt_cnn_lbfgs_max_iter, cf.opt_cnn_lbfgs_history
        )

    @partial(jax.jit, static_argnames=("encoder_on",), donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, batch, rng, encoder_on=False):
        if model.dropout_rate:
            # One key for crop/flip, one for dropout (step.py:96-101).
            # Dropout masks are a trace-time-counter fold of drop_rng
            # (ops/dropout.py), so every closure evaluation inside the
            # L-BFGS while_loop sees the SAME masks: the inner objective
            # stays deterministic, which is what the convergence breaks
            # assume. (torch would resample per closure call; the reference
            # hardcodes rate 0 — this knob is an extension.)
            rng, drop_rng = jax.random.split(rng)
        else:
            drop_rng = None

        def loss_fn(p, s):
            images = train_preprocess(
                rng, batch["images"], cf.train_crop_size, model.compute_dtype
            )
            scores, _, new_s = model.forward(
                p, s, images, batch["captions"], train=True, dropout_rng=drop_rng
            )
            return masked_ce_loss(scores, batch["captions"], batch["lengths"]), new_s

        value_fn = lambda p: loss_fn(p, state)[0]  # noqa: E731 - closure for lbfgs
        new_opt = dict(opt_state)
        eval_params = params

        if "decoder" in groups:
            # The torch closure re-evaluates the FULL model every inner
            # L-BFGS iteration (train.py:197-219) — but during the decoder
            # group's step the ResNet trunk's params and BN state are fixed
            # (the decoder group holds only affine_a/b + decoder.*,
            # optim.py), so the trunk's output is loop-invariant. Hoist it:
            # one trunk forward feeds every inner evaluation; the closure
            # re-runs only the affine heads + the teacher-forced decoder.
            # Identical math (deterministic preprocess rng, fixed BN batch
            # stats), but the inner loop no longer re-runs — or holds live —
            # a ResNet-152 forward per evaluation. No separate full backward
            # is needed on this path: loss/BN state come from this forward,
            # the logged LSTM norm from the group's last evaluation, and the
            # encoder branch below re-derives its grads at eval_params.
            images = train_preprocess(
                rng, batch["images"], cf.train_crop_size, model.compute_dtype
            )
            A_flat, a_g, new_state = E.encoder_features(
                params["encoder"], state, images.astype(model.compute_dtype),
                model.arch, train=True,
            )

            def dec_value_fn(p):
                # fresh closure per trace: its trace-time fold counter starts
                # at 0 every time, so the initial evaluation and every
                # while-loop evaluation draw identical masks per site
                drop = (
                    make_dropout(drop_rng, model.dropout_rate)
                    if model.dropout_rate else None
                )
                V, v_g, h0, c0 = E.encoder_heads(p["encoder"], A_flat, a_g, drop)
                scores, _, _ = D.decoder_forward(
                    p["decoder"], model.spec, V, v_g, batch["captions"], h0, c0,
                    drop=drop,
                )
                return masked_ce_loss(scores, batch["captions"], batch["lengths"])

            params, new_opt["decoder_lbfgs"], loss, eval_params, lstm_norm = (
                groups["decoder"].step(
                    params, dec_value_fn, opt_state["decoder_lbfgs"],
                    get_lr(opt_state, "decoder"),
                )
            )
        else:
            # decoder is adam/sgd (so the encoder group is the lbfgs one):
            # torch calls the closure exactly once inside step(closure) —
            # loss, grads, and the logged LSTM norm all come from that single
            # evaluation. The decoder group never contains resnet (optim.py
            # param_group_masks) and the encoder-lbfgs step below re-runs its
            # own closure, so the trunk's weight gradients here are always
            # discarded: stop_gradient lets XLA DCE the conv backward
            # (same optimization as step.py:85-95).
            def initial_loss_fn(p):
                enc = dict(p["encoder"])
                enc["resnet"] = jax.lax.stop_gradient(enc["resnet"])
                return loss_fn({**p, "encoder": enc}, state)

            (loss, new_state), grads = jax.value_and_grad(
                initial_loss_fn, has_aux=True
            )(params)
            grads, lstm_norm = clip_lstm_grads(grads, cf.train_lstm_maxnormal)
            upd, new_opt["decoder"] = dual.decoder_tx.update(
                grads, opt_state["decoder"], params
            )
            params = optax.apply_updates(params, upd)

        if encoder_on:
            if "encoder" in groups:
                params, new_opt["encoder_lbfgs"], _, _, _ = groups["encoder"].step(
                    params, value_fn, opt_state["encoder_lbfgs"], get_lr(opt_state, "encoder")
                )
            else:
                # The reference's encoder_optimizer.step() consumes the .grad
                # buffers left by the decoder closure's LAST evaluation
                # (train.py:111-114 after model_optimize) — NOT the first
                # backward's. Encoder params are untouched by the decoder
                # step, so re-derive those grads with one full backward at
                # the decoder group's final evaluation point. Only the
                # encoder group's own grads are consumed (encoder_tx is
                # masked): stop_gradient at every other leaf DCEs the unused
                # per-weight cotangents (notably the [*, 10k] vocab head's).
                def enc_loss_fn(p):
                    p = jax.tree.map(
                        lambda x, m: x if m else jax.lax.stop_gradient(x),
                        p, dual.encoder_mask,
                    )
                    return loss_fn(p, state)[0]

                enc_grads = jax.grad(enc_loss_fn)(eval_params)
                upd, new_opt["encoder"] = dual.encoder_tx.update(
                    enc_grads, opt_state["encoder"], params
                )
                params = optax.apply_updates(params, upd)

        return StepOutput(params, new_state, new_opt, loss, lstm_norm)

    return train_step
