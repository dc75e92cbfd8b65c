#!/usr/bin/env python
"""Caption a single image (driver config #1: single image, greedy, any backend).

    python examples/caption_image.py --image photo.jpg --checkpoint <ckpt_dir> \
        --vocab data/vocab.json [--beam 3]

Loads the adaptive-attention model, decodes one image, prints the caption and
the per-token sentinel gate beta (how much the model "looked away" from the
image, adaptive_attention.py:50-56).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--model", default="adaptive_attention")
    ap.add_argument("--backbone", default="resnet152")
    ap.add_argument("--beam", type=int, default=1)
    ap.add_argument("--max-len", type=int, default=30)
    args = ap.parse_args()

    import jax
    from PIL import Image

    from adaptive_tpu.config import Config
    from adaptive_tpu.data.vocab import Vocabulary
    from adaptive_tpu.decoding import make_beam_decoder, make_greedy_decoder
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.training import checkpoint as ckpt

    vocab = Vocabulary.load(args.vocab)
    cf = Config(
        atten_model_name=args.model,
        encoder_backbone=args.backbone,
        vocab_length=len(vocab),
        eval_batch_size=1,
        decode_max_len=args.max_len,
        beam_size=args.beam,
    )
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.checkpoint:
        params, state = ckpt.restore_model(args.checkpoint, params, state)

    with Image.open(args.image) as im:
        img = np.asarray(
            im.convert("RGB").resize((cf.resized_image_size, cf.resized_image_size)),
            dtype=np.uint8,
        )[None]

    if args.beam > 1:
        out = make_beam_decoder(model, cf)(params, state, img)
        ids = np.asarray(out.ids)[0]
        print("caption (beam %d):" % args.beam, vocab.decode_ids(ids))
        print("log-prob:", float(out.score[0]))
    else:
        out = make_greedy_decoder(model, cf)(params, state, img)
        ids = np.asarray(out.ids)[0]
        caption = vocab.decode_ids(ids)
        print("caption:", caption)
        betas = np.asarray(out.beta)[0]
        words = caption.split()
        if model.variant == "adaptive_attention" and words:
            print("sentinel beta per token:")
            for w, b in zip(words, betas):
                print("  %-15s %.3f" % (w, float(b)))


if __name__ == "__main__":
    main()
