"""Batched beam search with EOS masking — a capability the reference only had
as a TODO (reference for_wzn:3: "beam search").

Vectorized over (batch, beam): each step scores all beams with the shared
decode cell (one MXU-batched call over B*W rows inside a lax.scan), expands
top-k over the beam x vocab grid, and freezes finished beams by forcing the
<end> continuation at log-prob 0 so their scores are final. Optional length
normalization (score / len^alpha, Wu et al. 2016).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from adaptive_tpu.decoding.greedy import prepare_cached
from adaptive_tpu.ops.preprocess import eval_preprocess

NEG_INF = -1e9


class BeamOutput(NamedTuple):
    ids: jnp.ndarray     # [B, L] best beam's tokens
    score: jnp.ndarray   # [B] best beam's (normalized) log-prob
    all_ids: jnp.ndarray  # [B, W, L] every beam
    all_scores: jnp.ndarray  # [B, W]
    attention: jnp.ndarray  # [B, L, K] best beam's spatial attention maps
    beta: jnp.ndarray       # [B, L] best beam's sentinel gate (zeros if non-adaptive)


def make_beam_decoder(model, cf, beam_size: int = None, length_alpha: float = 0.0):
    W = beam_size if beam_size is not None else cf.beam_size
    if W < 1:
        raise ValueError(f"beam_size must be >= 1, got {W}")
    max_len = cf.decode_max_len
    start = cf.decode_start_token
    eos = cf.decode_eos_token
    size = cf.train_crop_size
    sentinel_prev = cf.sampler_sentinel_uses_prev_hidden
    early_exit = getattr(cf, "decode_early_exit", False)
    scan_prefix = min(getattr(cf, "decode_scan_prefix", 0), max_len)
    # the fused Pallas beam head (beam_head_topk) consumes the same hoisted
    # padded vocab head as greedy; the XLA fallback never reads it
    with_head = model.use_pallas and model.spec.variant == "adaptive_attention"
    prepare = prepare_cached(model, with_head=with_head)
    if with_head:
        from adaptive_tpu.ops.pallas.fused_step import beam_major_supported

        # beam-major layout: share each image's V/pv across its W beam rows
        # inside the fused cell. decode_beam_major=False is the escape hatch
        # back to the tiled per-row layout; widths whose row block would
        # exceed the kernel's VMEM budget fall back automatically.
        beam_major = getattr(cf, "decode_beam_major", True) and beam_major_supported(W)
    else:
        beam_major = False

    def decode_body(prepared, images_u8, tp_axis=None, head_tp=False) -> BeamOutput:
        images = eval_preprocess(images_u8, size, model.compute_dtype)
        V, v_g, h0, c0 = model.encode_inference(None, None, images, prepared=prepared)
        params = {"decoder": prepared["decoder"]}
        B = V.shape[0]
        K = V.shape[1]

        def tile(x):  # [B, ...] -> [B*W, ...]
            return jnp.repeat(x, W, axis=0)

        vg_t = tile(v_g)
        pv = model.precompute_slots(params, V)
        head = prepared.get("head")
        if head is not None:
            # fused-cell path: the pad is materialized ONCE outside the scan —
            # XLA otherwise re-pads these loop-invariant operands every step
            # (measured 29 ms/iter at batch 1024, VALIDATION.md round-3 beam
            # ladder). With beam_major, V/pv additionally stay UNTILED: the
            # kernel maps each image's slots to its W beam rows, so the
            # 200 MB-class V stream rides HBM once per step instead of W
            # times (the ladder's trace showed the tiled cell streaming W
            # copies; beam-major numbers in VALIDATION.md round-4 table).
            from adaptive_tpu.ops.pallas.fused_step import pad_decode_slots

            if beam_major:
                V_t, pv_t = pad_decode_slots(V, pv, beam_w=W)
                beam_w = W
            else:  # tiled fused layout (escape hatch / unsupported width)
                V_t, pv_t = pad_decode_slots(tile(V), tile(pv))
                beam_w = 1
        else:
            V_t, pv_t = tile(V), tile(pv)
            beam_w = 1
        dstate = model.init_decode_state(tile(h0), tile(c0))

        tokens = jnp.full((B, W), start, jnp.int32)
        # only beam 0 is alive at step 0 so identical expansions don't duplicate
        scores = jnp.broadcast_to(
            jnp.where(jnp.arange(W) == 0, 0.0, NEG_INF)[None, :], (B, W)
        ).astype(jnp.float32)
        finished = jnp.zeros((B, W), bool)

        def step(carry, _):
            # Histories (tokens, attention, beta) are NOT carried/reordered in
            # the loop: the scan emits per-step (token, parent pointer, raw
            # alpha/beta) and the paths are reconstructed by one backward
            # pass afterwards — the classic backpointer formulation. This
            # drops ~6 sequential gather/update ops per step from the
            # latency-bound loop body (the old carries reordered a
            # [B,W,L,K] buffer every step).
            tokens, scores, finished, dstate = carry
            # per-row top-W (+ log-softmax normalizer) instead of full logits:
            # exact — the global top-W over beam x vocab candidates includes
            # at most W continuations of any single source beam (models/
            # decoders.py::beam_decode_step; fused in Pallas on TPU)
            logp_top, tok_top, alpha, beta_t, dstate_new = model.beam_decode_step(
                params, tokens.reshape(B * W), vg_t, dstate, V_t, W,
                sentinel_prev, pv=pv_t, head=head, beam_w=beam_w,
                tp_axis=tp_axis, head_tp=head_tp,
            )
            logp_top = logp_top.reshape(B, W, W)
            tok_top = tok_top.reshape(B, W, W)

            # finished beams: only the <end> continuation, at no cost
            eos_row = jnp.where(jnp.arange(W) == 0, 0.0, NEG_INF).astype(
                logp_top.dtype
            )
            logp_top = jnp.where(finished[..., None], eos_row, logp_top)
            tok_top = jnp.where(finished[..., None], eos, tok_top)

            cand = scores[..., None] + logp_top  # [B, W, W]
            flat = cand.reshape(B, W * W)
            top_scores, top_idx = jax.lax.top_k(flat, W)  # [B, W]
            src_beam = top_idx // W
            new_tok = jnp.take_along_axis(tok_top.reshape(B, W * W), top_idx, axis=1)

            # reorder the recurrent state by source beam (the one reorder the
            # recurrence genuinely needs)
            def gather_beams(x):  # [B*W, ...] -> gathered [B*W, ...]
                xw = x.reshape(B, W, *x.shape[1:])
                return jnp.take_along_axis(
                    xw, src_beam.reshape(B, W, *([1] * (x.ndim - 1))), axis=1
                ).reshape(B * W, *x.shape[1:])

            dstate_new = jax.tree.map(gather_beams, dstate_new)
            finished = jnp.take_along_axis(finished, src_beam, axis=1) | (new_tok == eos)
            ys = (
                new_tok, src_beam,
                # step-t maps belong to the SOURCE row that produced the
                # token — stored raw, resolved during reconstruction
                alpha.astype(jnp.float32).reshape(B, W, K),
                beta_t.astype(jnp.float32).reshape(B, W),
            )
            return (new_tok, top_scores, finished, dstate_new), ys

        carry = (tokens, scores, finished, dstate)
        if early_exit:
            # decode_early_exit: stop once every beam of every image is
            # finished. Buffer prefill reproduces the fixed loop's
            # all-finished steps exactly: scores are sorted descending after
            # any top_k step, so the eos-forced candidates keep slot order —
            # parent pointers are identity and tokens <end> (ties in top_k
            # resolve to the lower flat index, preserving order). alpha/beta
            # tails become zeros instead of post-<end> values; the
            # reconstruction only reads them for steps before each path's
            # <end>, so BeamOutput paths/scores are bit-identical
            # (tests/test_decoding.py::test_beam_early_exit_*).
            # Two-phase (decode_scan_prefix=P>0): the first P steps run as a
            # fixed scan XLA can pipeline; only the tail runs under the
            # while_loop (greedy.py has the rationale + measurements).
            prefix_ys = None
            if scan_prefix > 0:
                carry, prefix_ys = jax.lax.scan(
                    step, carry, None, length=scan_prefix
                )
            tail = max_len - scan_prefix
            if tail > 0:
                _, ys_sd = jax.eval_shape(step, carry, None)
                tok0_b = jnp.full((tail,) + ys_sd[0].shape, eos, ys_sd[0].dtype)
                par0_b = jnp.broadcast_to(
                    jnp.arange(W, dtype=ys_sd[1].dtype)[None, None, :],
                    (tail,) + ys_sd[1].shape,
                )
                al0_b = jnp.zeros((tail,) + ys_sd[2].shape, ys_sd[2].dtype)
                be0_b = jnp.zeros((tail,) + ys_sd[3].shape, ys_sd[3].dtype)

                def cond(s):
                    t, c = s[0], s[1]
                    return (t < tail) & ~jnp.all(c[2])

                def body(s):
                    t, c, tok_b, par_b, al_b, be_b = s
                    c, (tok_t, par_t, al_t, be_t) = step(c, None)
                    upd = jax.lax.dynamic_update_index_in_dim
                    return (t + 1, c, upd(tok_b, tok_t, t, 0), upd(par_b, par_t, t, 0),
                            upd(al_b, al_t, t, 0), upd(be_b, be_t, t, 0))

                (_, (tokens, scores, finished, dstate),
                 tok_hist, parent_hist, alpha_hist, beta_hist) = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), carry, tok0_b, par0_b, al0_b, be0_b)
                )
            else:  # prefix covers max_len: degenerates to the fixed loop
                (tokens, scores, finished, dstate) = carry
                tok_hist = parent_hist = alpha_hist = beta_hist = None
            if prefix_ys is not None:
                if tok_hist is None:
                    tok_hist, parent_hist, alpha_hist, beta_hist = prefix_ys
                else:
                    tok_hist = jnp.concatenate([prefix_ys[0], tok_hist], axis=0)
                    parent_hist = jnp.concatenate([prefix_ys[1], parent_hist], axis=0)
                    alpha_hist = jnp.concatenate([prefix_ys[2], alpha_hist], axis=0)
                    beta_hist = jnp.concatenate([prefix_ys[3], beta_hist], axis=0)
        else:
            (tokens, scores, finished, dstate), (tok_hist, parent_hist, alpha_hist, beta_hist) = jax.lax.scan(
                step, carry, None, length=max_len
            )

        # Backward path reconstruction: walk the parent pointers from the
        # final beam slots to t=0, resolving each step's token and its source
        # row's attention/beta (sampler contract parity:
        # adaptive_attention.py:168-216 returns ids + attention + beta).
        def back(ptr, ys_t):
            tok_t, parent_t, alpha_t, beta_t = ys_t
            tok = jnp.take_along_axis(tok_t, ptr, axis=1)          # [B,W]
            src = jnp.take_along_axis(parent_t, ptr, axis=1)       # [B,W]
            att = jnp.take_along_axis(alpha_t, src[..., None], axis=1)  # [B,W,K]
            beta = jnp.take_along_axis(beta_t, src, axis=1)        # [B,W]
            return src, (tok, att, beta)

        ptr0 = jnp.broadcast_to(jnp.arange(W)[None, :], (B, W))
        _, (ids_rev, att_rev, beta_rev) = jax.lax.scan(
            back, ptr0, (tok_hist, parent_hist, alpha_hist, beta_hist),
            reverse=True,
        )
        # reverse-scan ys keep input order (index 0 == t=0): [L,B,W,...] -> [B,W,L,...]
        ids_buf = jnp.moveaxis(ids_rev, 0, 2)
        att_buf = jnp.moveaxis(att_rev, 0, 2)
        beta_buf = jnp.moveaxis(beta_rev, 0, 2)

        if length_alpha > 0:
            lengths = jnp.sum(jnp.cumsum(ids_buf == eos, axis=-1) == 0, axis=-1) + 1
            norm_scores = scores / (lengths.astype(jnp.float32) ** length_alpha)
        else:
            norm_scores = scores
        best = jnp.argmax(norm_scores, axis=1)
        best_ids = jnp.take_along_axis(ids_buf, best[:, None, None], axis=1)[:, 0]
        best_score = jnp.take_along_axis(norm_scores, best[:, None], axis=1)[:, 0]
        best_att = jnp.take_along_axis(att_buf, best[:, None, None, None], axis=1)[:, 0]
        best_beta = jnp.take_along_axis(beta_buf, best[:, None, None], axis=1)[:, 0]
        return BeamOutput(best_ids, best_score, ids_buf, norm_scores, best_att, best_beta)

    # Multi-device mesh: the Pallas fused cell/head must run under shard_map
    # (decoding/spmd.py); single-device and the XLA fallback are a plain jit.
    from adaptive_tpu.decoding import spmd

    decode_prepared = spmd.wrap_decode_body(
        decode_body, spmd.decode_mesh(model, cf), cf.mesh_axes,
        lambda p: BeamOutput(p, p, p, p, p, p),
    )

    def decode(params, state, images_u8) -> BeamOutput:
        return decode_prepared(prepare(params, state), images_u8)

    decode.prepare = prepare  # exposed for cache-behavior tests/inspection
    return decode
