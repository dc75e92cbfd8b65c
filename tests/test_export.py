"""StableHLO decoder export: serialize -> deserialize -> identical decode."""

import jax
import numpy as np
import pytest

from adaptive_tpu.export import export_decoder, load_decoder
from adaptive_tpu.models.factory import build_model


def test_export_roundtrip_greedy(tmp_path, tiny_cf):
    cf = tiny_cf.replace(vocab_length=32, eval_batch_size=4, decode_max_len=5)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))

    path = export_decoder(model, cf, params, state, str(tmp_path / "dec.bin"))
    decode = load_decoder(path)

    imgs = np.random.default_rng(1).integers(0, 255, (4, 72, 72, 3), dtype=np.uint8)
    out = decode(imgs)
    assert set(out) >= {"ids", "attention", "beta"}
    assert np.asarray(out["ids"]).shape == (4, 5)

    # identical to the in-process decoder
    from adaptive_tpu.decoding import make_greedy_decoder

    direct = make_greedy_decoder(model, cf)(params, state, imgs)
    np.testing.assert_array_equal(np.asarray(out["ids"]), np.asarray(direct.ids))
    np.testing.assert_allclose(
        np.asarray(out["beta"], np.float32), np.asarray(direct.beta, np.float32),
        rtol=1e-6,
    )


def test_export_rejects_wrong_shape(tmp_path, tiny_cf):
    cf = tiny_cf.replace(vocab_length=32, eval_batch_size=2, decode_max_len=4)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    path = export_decoder(model, cf, params, state, str(tmp_path / "dec.bin"))
    decode = load_decoder(path)
    bad = np.zeros((3, 72, 72, 3), np.uint8)  # batch 3 != exported 2
    with pytest.raises(Exception):
        decode(bad)
