"""Mesh/sharding tests on the 8-virtual-device CPU grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from adaptive_tpu.parallel import make_mesh, param_sharding_rules, shard_batch, shard_params


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_wildcard():
    mesh = make_mesh(shape=(-1, 2), axes=("data", "model"))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh2 = make_mesh(shape=(-1, 1), axes=("data", "model"))
    assert dict(mesh2.shape) == {"data": 8, "model": 1}


def test_batch_sharding_splits_leading_dim():
    mesh = make_mesh(shape=(8, 1), axes=("data", "model"))
    batch = {"images": np.zeros((16, 8, 8, 3), np.uint8), "lengths": np.arange(16)}
    sharded = shard_batch(mesh, batch)
    shard_shapes = [s.data.shape for s in sharded["images"].addressable_shards]
    assert all(s == (2, 8, 8, 3) for s in shard_shapes)


def test_param_sharding_rules_tp():
    mesh = make_mesh(shape=(4, 2), axes=("data", "model"))
    params = {
        "decoder": {
            "embed": jnp.zeros((64, 16)),
            "adaptive": {"mlp": {"kernel": jnp.zeros((32, 64)), "bias": jnp.zeros((64,))}},
            "lstm": {"w_ih": jnp.zeros((8, 32))},
        }
    }
    rules = param_sharding_rules(params, mesh)
    assert rules["decoder"]["embed"].spec == P("model", None)
    assert rules["decoder"]["adaptive"]["mlp"]["kernel"].spec == P(None, "model")
    assert rules["decoder"]["adaptive"]["mlp"]["bias"].spec == P("model")
    assert rules["decoder"]["lstm"]["w_ih"].spec == P()


def test_param_sharding_skips_indivisible():
    mesh = make_mesh(shape=(4, 2), axes=("data", "model"))
    params = {"decoder": {"embed": jnp.zeros((63, 16))}}  # 63 % 2 != 0
    rules = param_sharding_rules(params, mesh)
    assert rules["decoder"]["embed"].spec == P()


@pytest.mark.slow
def test_sharded_train_step_runs_and_matches_single_device(tiny_cf):
    """One SPMD train step on a (4,2) mesh == the same step on one device."""
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.training.optim import make_dual_optimizer
    from adaptive_tpu.training.step import make_train_step

    cf = tiny_cf.replace(vocab_length=64, mesh_shape=(4, 2))
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    dual, opt_state = make_dual_optimizer(params, cf)
    step = make_train_step(model, dual, cf)

    rng = np.random.default_rng(0)
    B, T = 8, 6
    batch = {
        "images": rng.integers(0, 255, (B, 72, 72, 3), dtype=np.uint8),
        "captions": rng.integers(1, 64, (B, T)).astype(np.int32),
        "lengths": np.full((B,), T, np.int32),
    }
    key = jax.random.PRNGKey(1)

    out_single = step(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state),
        jax.tree.map(jnp.copy, opt_state), dict(batch), key, True,
    )

    mesh = make_mesh(cf)
    p2 = shard_params(jax.tree.map(jnp.copy, params), mesh)
    b2 = shard_batch(mesh, batch)
    out_sharded = step(p2, jax.tree.map(jnp.copy, state), jax.tree.map(jnp.copy, opt_state), b2, key, True)

    np.testing.assert_allclose(float(out_single.loss), float(out_sharded.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_single.params["decoder"]["embed"]),
        np.asarray(out_sharded.params["decoder"]["embed"]),
        atol=1e-5,
    )


def test_process_local_batch_assembly_matches_device_put():
    """The multi-host shard_batch path (make_array_from_process_local_data)
    equals device_put in the single-process degenerate case — keeps the
    multi-host code path compiling and semantically pinned."""
    from adaptive_tpu.parallel.mesh import data_sharding

    mesh = make_mesh(shape=(8, 1), axes=("data", "model"))
    ds = data_sharding(mesh)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    a = jax.device_put(x, ds)
    b = jax.make_array_from_process_local_data(ds, x)
    assert b.sharding == a.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zero1_opt_state_sharding_rules():
    from adaptive_tpu.parallel import opt_state_sharding_rules

    mesh = make_mesh(shape=(4, 2), axes=("data", "model"))
    state = {
        "mu": jnp.zeros((64, 256)),        # big + divisible -> sharded
        "nu": jnp.zeros((63, 256)),        # indivisible dim0 -> replicated
        "small": jnp.zeros((8, 4)),        # tiny -> replicated
        "count": jnp.zeros((), jnp.int32),  # scalar -> replicated
    }
    rules = opt_state_sharding_rules(state, mesh, min_size=1024)
    assert rules["mu"].spec == P("data", None)
    assert rules["nu"].spec == P()
    assert rules["small"].spec == P()
    assert rules["count"].spec == P()


@pytest.mark.slow
def test_zero1_train_step_matches_replicated(tiny_cf):
    """ZeRO-1 moments sharded over 'data': identical updates, sharded state."""
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.parallel import shard_opt_state
    from adaptive_tpu.training.optim import make_dual_optimizer
    from adaptive_tpu.training.step import make_train_step

    cf = tiny_cf.replace(vocab_length=64, mesh_shape=(4, 2), opt_state_sharding="data")
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    dual, opt_state = make_dual_optimizer(params, cf)
    step = make_train_step(model, dual, cf)

    rng = np.random.default_rng(1)
    B, T = 8, 6
    batch = {
        "images": rng.integers(0, 255, (B, 72, 72, 3), dtype=np.uint8),
        "captions": rng.integers(1, 64, (B, T)).astype(np.int32),
        "lengths": np.full((B,), T, np.int32),
    }
    key = jax.random.PRNGKey(2)

    out_rep = step(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state),
        jax.tree.map(jnp.copy, opt_state), dict(batch), key, True,
    )

    mesh = make_mesh(cf)
    p2 = shard_params(jax.tree.map(jnp.copy, params), mesh)
    o2 = shard_opt_state(jax.tree.map(jnp.copy, opt_state), mesh)
    # at least one moment leaf must actually be sharded over 'data'
    specs = [
        getattr(l, "sharding", None).spec
        for l in jax.tree.leaves(o2)
        if hasattr(l, "sharding")
    ]
    assert any(s is not None and "data" in str(s) for s in specs), specs
    out_z1 = step(p2, jax.tree.map(jnp.copy, state), o2, shard_batch(mesh, batch), key, True)

    np.testing.assert_allclose(float(out_rep.loss), float(out_z1.loss), rtol=1e-5)
    for k in ("embed",):
        np.testing.assert_allclose(
            np.asarray(out_rep.params["decoder"][k]),
            np.asarray(out_z1.params["decoder"][k]),
            atol=1e-5,
        )
    # two steps: sharded state stays sharded and stays numerically aligned
    out_rep2 = step(out_rep.params, out_rep.model_state, out_rep.opt_state, dict(batch), key, True)
    out_z12 = step(out_z1.params, out_z1.model_state, out_z1.opt_state, shard_batch(mesh, batch), key, True)
    np.testing.assert_allclose(float(out_rep2.loss), float(out_z12.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_rep2.params["decoder"]["embed"]),
        np.asarray(out_z12.params["decoder"]["embed"]),
        atol=5e-5,  # two Adam steps of layout-dependent reassociation noise
    )


def test_sharded_eval_decode_matches_single_device(tiny_cf):
    """Greedy decode with the eval batch sharded over 'data' == unsharded."""
    from adaptive_tpu.decoding import make_greedy_decoder
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.parallel.mesh import data_sharding

    cf = tiny_cf.replace(vocab_length=32, mesh_shape=(8, 1), eval_batch_size=8)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    decode = make_greedy_decoder(model, cf)
    imgs = np.random.default_rng(4).integers(0, 255, (8, 72, 72, 3), dtype=np.uint8)

    out_single = decode(params, state, jnp.asarray(imgs))
    mesh = make_mesh(cf)
    sharded = jax.device_put(jnp.asarray(imgs), data_sharding(mesh))
    out_sharded = decode(params, state, sharded)
    np.testing.assert_array_equal(np.asarray(out_single.ids), np.asarray(out_sharded.ids))


def test_tp_greedy_decode_matches_single_device(tiny_cf):
    """Greedy decode with the MODEL axis engaged: params TP-sharded on a
    (4,2) mesh (embed rows + vocab head cols over 'model') and the batch
    over 'data' — ids bit-equal to the unsharded single-device decode.

    Closes the round-4 hole: every prior sharded-decode test ran at mesh
    (8,1); the reference parallelizes its sampler too
    (baseline_attention.py:243-246)."""
    from adaptive_tpu.decoding import make_greedy_decoder
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.parallel.mesh import data_sharding

    cf = tiny_cf.replace(vocab_length=32, mesh_shape=(4, 2), eval_batch_size=8)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    decode = make_greedy_decoder(model, cf)
    imgs = np.random.default_rng(7).integers(0, 255, (8, 72, 72, 3), dtype=np.uint8)

    out_single = decode(params, state, jnp.asarray(imgs))

    mesh = make_mesh(cf)
    p2 = shard_params(params, mesh)
    # the embed table must actually be sharded over 'model' for this test
    # to mean anything
    assert "model" in str(p2["decoder"]["embed"].sharding.spec)
    sharded_imgs = jax.device_put(jnp.asarray(imgs), data_sharding(mesh))
    decode2 = make_greedy_decoder(model, cf)  # fresh prepare cache
    out_tp = decode2(p2, state, sharded_imgs)
    np.testing.assert_array_equal(np.asarray(out_single.ids), np.asarray(out_tp.ids))
    np.testing.assert_allclose(
        np.asarray(out_single.attention), np.asarray(out_tp.attention), atol=1e-6
    )


def test_tp_beam_decode_matches_single_device(tiny_cf):
    """Beam-3 decode with TP engaged at mesh (4,2): paths + scores match the
    unsharded decode (the padded-vocab top-k under a col-sharded head is a
    plausible failure site nothing else exercises)."""
    from adaptive_tpu.decoding import make_beam_decoder
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.parallel.mesh import data_sharding

    cf = tiny_cf.replace(vocab_length=32, mesh_shape=(4, 2), eval_batch_size=8)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(1))
    decode = make_beam_decoder(model, cf, beam_size=3)
    imgs = np.random.default_rng(8).integers(0, 255, (8, 72, 72, 3), dtype=np.uint8)

    out_single = decode(params, state, jnp.asarray(imgs))

    mesh = make_mesh(cf)
    p2 = shard_params(params, mesh)
    assert "model" in str(p2["decoder"]["embed"].sharding.spec)
    sharded_imgs = jax.device_put(jnp.asarray(imgs), data_sharding(mesh))
    decode2 = make_beam_decoder(model, cf, beam_size=3)
    out_tp = decode2(p2, state, sharded_imgs)
    np.testing.assert_array_equal(np.asarray(out_single.all_ids), np.asarray(out_tp.all_ids))
    np.testing.assert_allclose(
        np.asarray(out_single.all_scores), np.asarray(out_tp.all_scores), atol=1e-5
    )


def _fused_interpret_model(cf):
    from adaptive_tpu.models.factory import build_model

    return build_model(cf.replace(use_pallas="always"))._replace(pallas_interpret=True)


def test_tp_pallas_greedy_decode_matches_unsharded(tiny_cf, monkeypatch):
    """The FUSED (Pallas) greedy decode under shard_map on a (4,2) mesh —
    data-parallel cell, model-sharded embed rows + head columns — produces
    bit-identical ids to the same fused program on one device (interpret
    mode stands in for the Mosaic kernels; the shard_map layout, collectives
    and TP merges are real)."""
    from adaptive_tpu.decoding import make_greedy_decoder, spmd
    from adaptive_tpu.parallel.mesh import data_sharding

    cf = tiny_cf.replace(vocab_length=32, mesh_shape=(4, 2), eval_batch_size=8)
    model = _fused_interpret_model(cf)
    params, state = model.init(jax.random.PRNGKey(3))
    imgs = np.random.default_rng(11).integers(0, 255, (8, 72, 72, 3), dtype=np.uint8)

    with monkeypatch.context() as m:
        m.setattr(spmd, "decode_mesh", lambda *_: None)  # plain-jit fused ref
        ref = make_greedy_decoder(model, cf)(params, state, jnp.asarray(imgs))

    mesh = make_mesh(cf)
    # the wrap must actually engage TP on this config
    prepared = jax.jit(model.prepare_inference)(params, state)
    _, tp_axis, head_tp = spmd.prepared_specs(prepared, mesh, cf.mesh_axes)
    assert tp_axis == "model" and head_tp

    p2 = shard_params(params, mesh)
    assert "model" in str(p2["decoder"]["embed"].sharding.spec)
    out = make_greedy_decoder(model, cf)(
        p2, state, jax.device_put(jnp.asarray(imgs), data_sharding(mesh))
    )
    np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(out.ids))
    np.testing.assert_allclose(
        np.asarray(ref.attention), np.asarray(out.attention), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(out.beta), atol=1e-6)


def test_tp_pallas_beam_decode_matches_unsharded(tiny_cf, monkeypatch):
    """Fused beam-3 decode under shard_map at (4,2): per-shard top-k over the
    column-sharded head + cross-shard merge must reproduce the single-device
    fused program's paths exactly."""
    from adaptive_tpu.decoding import make_beam_decoder, spmd
    from adaptive_tpu.parallel.mesh import data_sharding

    cf = tiny_cf.replace(vocab_length=32, mesh_shape=(4, 2), eval_batch_size=8)
    model = _fused_interpret_model(cf)
    params, state = model.init(jax.random.PRNGKey(4))
    imgs = np.random.default_rng(12).integers(0, 255, (8, 72, 72, 3), dtype=np.uint8)

    with monkeypatch.context() as m:
        m.setattr(spmd, "decode_mesh", lambda *_: None)
        ref = make_beam_decoder(model, cf, beam_size=3)(params, state, jnp.asarray(imgs))

    mesh = make_mesh(cf)
    p2 = shard_params(params, mesh)
    out = make_beam_decoder(model, cf, beam_size=3)(
        p2, state, jax.device_put(jnp.asarray(imgs), data_sharding(mesh))
    )
    np.testing.assert_array_equal(np.asarray(ref.all_ids), np.asarray(out.all_ids))
    np.testing.assert_allclose(
        np.asarray(ref.all_scores), np.asarray(out.all_scores), atol=1e-5
    )


def test_dp_pallas_greedy_decode_matches_unsharded(tiny_cf, monkeypatch):
    """Pure data parallelism for the fused decode: mesh (8,1) (no TP) — the
    shard_map wrap with tp_axis=None must equal the single-device program."""
    from adaptive_tpu.decoding import make_greedy_decoder, spmd

    cf = tiny_cf.replace(vocab_length=32, mesh_shape=(8, 1), eval_batch_size=8)
    model = _fused_interpret_model(cf)
    params, state = model.init(jax.random.PRNGKey(5))
    imgs = np.random.default_rng(13).integers(0, 255, (8, 72, 72, 3), dtype=np.uint8)

    with monkeypatch.context() as m:
        m.setattr(spmd, "decode_mesh", lambda *_: None)
        ref = make_greedy_decoder(model, cf)(params, state, jnp.asarray(imgs))

    mesh = make_mesh(cf)
    prepared = jax.jit(model.prepare_inference)(params, state)
    _, tp_axis, head_tp = spmd.prepared_specs(prepared, mesh, cf.mesh_axes)
    assert tp_axis is None and not head_tp
    out = make_greedy_decoder(model, cf)(params, state, jnp.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(out.ids))


def test_coco_eval_tp_mesh(tmp_path, tiny_cf):
    """Full coco_eval (decode_split + scorers) with TP-sharded params on a
    (4,2) mesh — the eval driver's batch placement and the sharded decode
    compose end-to-end with model > 1."""
    from adaptive_tpu.data.synthetic import make_synthetic_dataset
    from adaptive_tpu.data.vocab import build_vocab
    from adaptive_tpu.data.coco_api import COCO
    from adaptive_tpu.evalcap.coco_eval import coco_eval
    from adaptive_tpu.models.factory import build_model

    ann, resized = make_synthetic_dataset(str(tmp_path), num_images=8, image_size=72, seed=9)
    coco = COCO(ann)
    vocab = build_vocab((a["caption"] for a in coco.anns.values()), threshold=1)
    # pad the vocab so the embed/head dims divide the 2-wide model axis
    # regardless of the synthetic vocab's size (factory pads; rules shard)
    cf = tiny_cf.replace(
        vocab_length=len(vocab), resized_image_dir=resized, val_anno_path=ann,
        eval_batch_size=8, decode_max_len=5, exp_dir=str(tmp_path),
        dataloader_num_workers=2, mesh_shape=(4, 2), vocab_pad_multiple=8,
    )
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(cf)
    p2 = shard_params(params, mesh)
    assert "model" in str(p2["decoder"]["embed"].sharding.spec)
    cider = coco_eval(cf, model, p2, state, epoch=1, vocab=vocab)
    assert np.isfinite(cider)


def test_coco_eval_engages_mesh_sharding(tmp_path, tiny_cf):
    """decode_split shards eval batches when the batch divides the data axis."""
    from adaptive_tpu.data.synthetic import make_synthetic_dataset
    from adaptive_tpu.data.vocab import build_vocab
    from adaptive_tpu.data.coco_api import COCO
    from adaptive_tpu.evalcap.coco_eval import coco_eval
    from adaptive_tpu.models.factory import build_model

    ann, resized = make_synthetic_dataset(str(tmp_path), num_images=8, image_size=72, seed=6)
    coco = COCO(ann)
    vocab = build_vocab((a["caption"] for a in coco.anns.values()), threshold=1)
    cf = tiny_cf.replace(
        vocab_length=len(vocab), resized_image_dir=resized, val_anno_path=ann,
        eval_batch_size=8, decode_max_len=5, exp_dir=str(tmp_path),
        dataloader_num_workers=2, mesh_shape=(8, 1),
    )
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    cider = coco_eval(cf, model, params, state, epoch=1, vocab=vocab)
    assert np.isfinite(cider)


@pytest.mark.slow
def test_flagship_shapes_on_tp_mesh():
    """Flagship dims on the virtual (4,2) mesh: ResNet-152 @ 224, vocab
    10,123 padded to 10,240, H=512, 49 attention slots. Every other sharding
    test runs resnet18 @ 64px with vocab 64 — this is the one place the
    REAL divisibility/padding interactions (10240/2 head shards, 49->64 slot
    pad, 117 masked vocab columns) execute before real hardware does.
    One train step + one greedy decode (GSPMD XLA path) + one fused-Pallas
    decode (interpret kernels under shard_map). Reference dims:
    baseline_attention.py:16-18,137-140."""
    from adaptive_tpu.config import Config
    from adaptive_tpu.decoding import make_greedy_decoder
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.parallel.mesh import data_sharding
    from adaptive_tpu.training.optim import make_dual_optimizer
    from adaptive_tpu.training.step import make_train_step

    cf = Config(
        atten_model_name="adaptive_attention", encoder_backbone="resnet152",
        train_crop_size=224, resized_image_size=256, vocab_length=10123,
        vocab_pad_multiple=128, train_batch_size=4, eval_batch_size=4,
        decode_max_len=4, mesh_shape=(4, 2), compute_dtype="float32",
    )
    model = build_model(cf)
    assert model.spec.padded_vocab == 10240 and model.spec.num_slots == 49
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    mesh = make_mesh(cf)
    p2 = shard_params(params, mesh)
    assert "model" in str(p2["decoder"]["embed"].sharding.spec)
    assert "model" in str(p2["decoder"]["adaptive"]["mlp"]["kernel"].sharding.spec)

    # one SPMD train step at the real dims
    dual, opt_state = make_dual_optimizer(params, cf)
    step = make_train_step(model, dual, cf)
    rng = np.random.default_rng(0)
    B, T = 4, 6
    batch = shard_batch(mesh, {
        "images": rng.integers(0, 255, (B, 256, 256, 3), dtype=np.uint8),
        "captions": rng.integers(1, 10123, (B, T)).astype(np.int32),
        "lengths": np.full((B,), T, np.int32),
    })
    out = step(p2, state, opt_state, batch, jax.random.PRNGKey(1), True)
    assert np.isfinite(float(out.loss)), float(out.loss)
    assert "model" in str(out.params["decoder"]["embed"].sharding.spec)

    # greedy decode, GSPMD XLA path (use_pallas off on CPU)
    imgs = rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8)
    p_dec = jax.tree.map(jnp.copy, out.params)
    ids_xla = np.asarray(
        make_greedy_decoder(model, cf)(
            p_dec, out.model_state, jax.device_put(jnp.asarray(imgs), data_sharding(mesh))
        ).ids
    )
    # the padded-vocab argmax must never emit one of the 117 masked columns
    assert ids_xla.max() < 10123

    # fused Pallas decode (interpret kernels) under shard_map at (4,2):
    # 10240/2-column head shards + cross-shard merge at the real dims
    fused = build_model(cf.replace(use_pallas="always"))._replace(pallas_interpret=True)
    ids_fused = np.asarray(
        make_greedy_decoder(fused, cf)(
            p_dec, out.model_state, jax.device_put(jnp.asarray(imgs), data_sharding(mesh))
        ).ids
    )
    np.testing.assert_array_equal(ids_xla, ids_fused)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
