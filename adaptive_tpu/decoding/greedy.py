"""Batched greedy decode as a single jitted lax.scan.

Reference parity: Encoder2Decoder.sampler (adaptive_attention.py:168-216,
baseline_attention.py:233-280) — greedy argmax for max_len=30 steps starting
from <start>=1, returning sampled ids + attention maps (+ beta for the
adaptive variant). The reference's Python loop dispatches the whole decoder
graph per token; here the per-step cell is scanned by XLA into one compiled
loop, and the encoder + eval preprocessing (resize+normalize) fuse into the
same jit.

EOS behavior: like the reference, all max_len steps run (no early exit — XLA
loops are fixed-length anyway); `finished` rows keep emitting <end> so the
emitted tail is deterministic. Captions are cut at the first <end> downstream
(tools/utils.py:185-190), so outputs match the reference's token-for-token on
the kept prefix.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from adaptive_tpu.ops.preprocess import eval_preprocess


class GreedyOutput(NamedTuple):
    ids: jnp.ndarray        # [B, L] int32 sampled token ids
    attention: jnp.ndarray  # [B, L, K] spatial attention maps
    beta: jnp.ndarray       # [B, L] sentinel gate (zeros for non-adaptive)


def make_greedy_decoder(model, cf):
    """Returns jitted decode(params, state, images_u8) -> GreedyOutput.

    images_u8: uint8 NHWC at any square size; resized to train_crop_size and
    normalized on device (utils.py:135-139 parity).
    """
    max_len = cf.decode_max_len
    start = cf.decode_start_token
    eos = cf.decode_eos_token
    size = cf.train_crop_size
    sentinel_prev = cf.sampler_sentinel_uses_prev_hidden

    @jax.jit
    def decode(params, state, images_u8) -> GreedyOutput:
        images = eval_preprocess(images_u8, size, model.compute_dtype)
        # inference fast path: BN-folded encoder + compute-dtype decoder weights
        V, v_g, h0, c0 = model.encode_inference(params, state, images)
        params = model.decoder_inference_params(params)
        B = V.shape[0]
        pv = model.precompute_slots(params, V)  # hoisted out of the scan
        head = model.prepare_greedy_head(params)  # padded vocab head, hoisted
        dstate = model.init_decode_state(h0, c0)
        tok0 = jnp.full((B,), start, jnp.int32)

        def step(carry, _):
            tok, dstate, finished = carry
            nxt, alpha, beta, dstate = model.greedy_decode_step(
                params, tok, v_g, dstate, V, sentinel_prev, pv=pv, head=head
            )
            nxt = jnp.where(finished, eos, nxt)
            finished = finished | (nxt == eos)
            return (nxt, dstate, finished), (nxt, alpha, beta[:, 0])

        (_, _, _), (ids, alphas, betas) = jax.lax.scan(
            step, (tok0, dstate, jnp.zeros((B,), bool)), None, length=max_len
        )
        return GreedyOutput(
            ids=jnp.swapaxes(ids, 0, 1),
            attention=jnp.swapaxes(alphas, 0, 1),
            beta=jnp.swapaxes(betas, 0, 1),
        )

    return decode
