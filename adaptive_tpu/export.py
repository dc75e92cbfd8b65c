"""Serialized decoder export (StableHLO via jax.export).

Production capability with no reference counterpart: the whole inference
pipeline — eval preprocessing + BN-folded (optionally int8) encoder + the
scanned greedy/beam decode — exports as ONE self-contained StableHLO
artifact with the weights baked in as constants. A serving process (or a
non-Python runtime that consumes StableHLO) can deserialize and call it
without this package's model code; jax.export guarantees forward
compatibility for serialized artifacts.

    from adaptive_tpu.export import export_decoder, load_decoder
    path = export_decoder(model, cf, params, state, "decoder.bin", batch_size=8)
    decode = load_decoder(path)         # images_u8 [B,S,S,3] -> dict of arrays
    out = decode(images)                # {'ids', 'attention', 'beta'}
"""

from __future__ import annotations

from typing import Optional, Sequence


def export_decoder(
    model,
    cf,
    params,
    state,
    path: str,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize the jitted decode pipeline (weights baked in) to `path`.

    batch_size fixes the compiled batch (static shapes — the serving
    contract, same as CaptionService's fixed micro-batch). platforms
    defaults to the current backend; pass ("tpu", "cpu") for a
    multi-platform artifact.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jxp

    from adaptive_tpu.decoding import make_beam_decoder, make_greedy_decoder

    decode = (
        make_beam_decoder(model, cf) if cf.beam_size > 1 else make_greedy_decoder(model, cf)
    )
    B = batch_size or cf.eval_batch_size
    S = cf.resized_image_size

    @jax.jit
    def fn(images_u8):
        out = decode(params, state, images_u8)
        # plain dict output: NamedTuples would need serialization registration
        d = {"ids": out.ids}
        for k in ("attention", "beta"):
            if hasattr(out, k):
                d[k] = getattr(out, k)
        return d

    spec = jax.ShapeDtypeStruct((B, S, S, 3), jnp.uint8)
    exp = jxp.export(fn, platforms=tuple(platforms) if platforms else None)(spec)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_decoder(path: str):
    """Deserialize an exported decoder; returns images_u8 -> dict of arrays."""
    from jax import export as jxp

    with open(path, "rb") as f:
        exp = jxp.deserialize(f.read())
    return exp.call
