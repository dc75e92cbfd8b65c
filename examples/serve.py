#!/usr/bin/env python
"""Minimal captioning HTTP server over CaptionService (stdlib only).

    python examples/serve.py --vocab data/vocab.json --checkpoint <ckpt> --port 8000
    curl -X POST --data-binary @photo.jpg http://localhost:8000/caption

POST /caption with raw JPEG/PNG bytes -> {"caption": "...", "beta": [...]}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", required=True)
    ap.add_argument("-c", "--config", default="", help="optional config.py/json with model dims")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--model", default="adaptive_attention")
    ap.add_argument("--backbone", default="resnet152")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=1)
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    from PIL import Image

    from adaptive_tpu.config import Config, load_config
    from adaptive_tpu.data.vocab import Vocabulary
    from adaptive_tpu.serving import CaptionService

    vocab = Vocabulary.load(args.vocab)
    if args.config:
        cf = load_config(args.config).replace(eval_batch_size=args.batch, beam_size=args.beam)
    else:
        cf = Config(
            atten_model_name=args.model,
            encoder_backbone=args.backbone,
            eval_batch_size=args.batch,
            beam_size=args.beam,
        )
    service = CaptionService(cf, vocab, checkpoint=args.checkpoint, batch_size=args.batch)
    print("compiling...")
    service.warmup()
    size = cf.resized_image_size

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/caption":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                with Image.open(io.BytesIO(body)) as im:
                    img = np.asarray(im.convert("RGB").resize((size, size)), np.uint8)
                result = service.caption(img, timeout=30)
                payload = json.dumps(result).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:
                self.send_error(400, f"{type(e).__name__}: {e}")

        def log_message(self, *a):
            pass

    print(f"serving on :{args.port}")
    ThreadingHTTPServer(("", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
