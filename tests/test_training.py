"""Training-layer tests: loss/clip parity vs torch, scheduler parity,
optimizer grouping, checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from adaptive_tpu.training.checkpoint import (checkpoint_name, epoch_from_filename,
                                              restore_model, restore_opt_state,
                                              save_checkpoint)
from adaptive_tpu.training.optim import (get_lr, make_dual_optimizer,
                                         param_group_masks, set_lr)
from adaptive_tpu.training.schedule import ReduceLROnPlateau, early_stop_Ornot
from adaptive_tpu.training.step import clip_lstm_grads, masked_ce_loss


def _t(x):
    return torch.tensor(np.asarray(x))


# ----------------------------------------------------------------- loss
def test_masked_ce_matches_torch_pack_padded():
    rng = np.random.default_rng(0)
    B, T, V = 4, 7, 11
    scores = rng.normal(size=(B, T, V)).astype(np.float32)
    captions = rng.integers(1, V, size=(B, T)).astype(np.int64)
    lengths = np.array([7, 5, 3, 2])

    # torch oracle: pack scores[:, :len-1] and captions[:,1:] then mean CE
    from torch.nn.utils.rnn import pack_padded_sequence

    packed_scores = pack_padded_sequence(_t(scores), (lengths - 1).tolist(),
                                         batch_first=True, enforce_sorted=True)
    targets = pack_padded_sequence(_t(captions)[:, 1:], (lengths - 1).tolist(),
                                   batch_first=True, enforce_sorted=True)
    want = torch.nn.CrossEntropyLoss()(packed_scores[0], targets[0]).item()

    got = float(masked_ce_loss(jnp.asarray(scores), jnp.asarray(captions.astype(np.int32)),
                               jnp.asarray(lengths.astype(np.int32))))
    assert abs(got - want) < 1e-5


def test_masked_ce_ignores_padding():
    B, T, V = 2, 5, 7
    rng = np.random.default_rng(1)
    scores = rng.normal(size=(B, T, V)).astype(np.float32)
    captions = rng.integers(1, V, size=(B, T)).astype(np.int32)
    lengths = np.array([3, 4], np.int32)
    base = float(masked_ce_loss(jnp.asarray(scores), jnp.asarray(captions), jnp.asarray(lengths)))
    # perturb scores/targets beyond the valid region — loss must not change
    scores2 = scores.copy()
    scores2[0, 3:] += 100
    captions2 = captions.copy()
    captions2[0, 4:] = 1
    got = float(masked_ce_loss(jnp.asarray(scores2), jnp.asarray(captions2), jnp.asarray(lengths)))
    assert abs(got - base) < 1e-6


# ----------------------------------------------------------------- clipping
def test_clip_lstm_grads_matches_torch():
    rng = np.random.default_rng(2)
    shapes = {"w_ih": (6, 16), "w_hh": (4, 16), "b_ih": (16,), "b_hh": (16,)}
    lstm_grads = {k: rng.normal(size=s).astype(np.float32) * 3 for k, s in shapes.items()}
    other = rng.normal(size=(3, 3)).astype(np.float32)
    grads = {"decoder": {"lstm": {k: jnp.asarray(v) for k, v in lstm_grads.items()},
                         "x": jnp.asarray(other)},
             "encoder": {"y": jnp.asarray(other)}}

    tensors = [torch.nn.Parameter(_t(v)) for v in lstm_grads.values()]
    for p, g in zip(tensors, lstm_grads.values()):
        p.grad = _t(g)
    want_norm = torch.nn.utils.clip_grad_norm_(tensors, 5.0).item()

    clipped, norm = clip_lstm_grads(grads, 5.0)
    assert abs(float(norm) - want_norm) < 1e-4
    for k, p in zip(lstm_grads.keys(), tensors):
        np.testing.assert_allclose(
            np.asarray(clipped["decoder"]["lstm"][k]), p.grad.numpy(), rtol=1e-5
        )
    # non-LSTM grads untouched
    np.testing.assert_array_equal(np.asarray(clipped["decoder"]["x"]), other)


# ----------------------------------------------------------------- scheduler
def test_plateau_scheduler_matches_torch():
    lr0 = 1e-3
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.5, patience=3, threshold=0.02, threshold_mode="abs", min_lr=1e-6
    )
    ours = ReduceLROnPlateau(lr0, 0.5, 3, 0.02, 1e-6)
    losses = [100, 5.0, 4.99, 4.999, 4.998, 4.997, 4.996, 4.995, 2.0, 1.999, 1.998, 1.997, 1.996, 1.995]
    for loss in losses:
        tsched.step(loss)
        got = ours.step(loss)
        want = opt.param_groups[0]["lr"]
        assert abs(got - want) < 1e-12, (loss, got, want)


def test_early_stop(tiny_cf):
    cf = tiny_cf.replace(train_early_stop=True, train_early_stop_patience=2)
    assert not early_stop_Ornot(cf, [0.1, 0.2], 0.2)
    assert not early_stop_Ornot(cf, [0.1, 0.2, 0.15, 0.18], 0.2)  # best within last 3
    assert early_stop_Ornot(cf, [0.2, 0.1, 0.15, 0.18], 0.2)  # best fell out of window


# ----------------------------------------------------------------- optimizer
@pytest.fixture(scope="module")
def tiny_model(tiny_cf):
    from adaptive_tpu.models.factory import build_model

    model = build_model(tiny_cf)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def test_param_groups(tiny_cf, tiny_model):
    _, params, _ = tiny_model
    dmask, emask = param_group_masks(params, tiny_cf)
    assert dmask["encoder"]["affine_a"]["kernel"] is True
    assert dmask["encoder"]["affine_h0"]["kernel"] is False  # never optimized (ref parity)
    assert emask["encoder"]["affine_h0"]["kernel"] is False
    assert dmask["decoder"]["embed"] is True
    assert not any(jax.tree.leaves(dmask["encoder"]["resnet"]))
    # encoder group: children [5:] = layer2..4 trainable, conv1/bn1/layer1 not
    er = emask["encoder"]["resnet"]
    assert not er["conv1"]["kernel"] and not any(jax.tree.leaves(er["layer1"]))
    assert all(jax.tree.leaves(er["layer2"])) and all(jax.tree.leaves(er["layer4"]))


def test_dual_optimizer_updates_only_its_group(tiny_cf, tiny_model):
    import optax

    _, params, _ = tiny_model
    dual, opt_state = make_dual_optimizer(params, tiny_cf)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = dual.decoder_tx.update(grads, opt_state["decoder"], params)
    # decoder group moves, resnet + affine_h0 do not
    assert float(jnp.abs(upd["decoder"]["embed"]).max()) > 0
    assert float(jnp.abs(upd["encoder"]["affine_a"]["kernel"]).max()) > 0
    assert float(jnp.abs(upd["encoder"]["affine_h0"]["kernel"]).max()) == 0
    assert float(jnp.abs(upd["encoder"]["resnet"]["conv1"]["kernel"]).max()) == 0

    upd_e, _ = dual.encoder_tx.update(grads, opt_state["encoder"], params)
    assert float(jnp.abs(upd_e["encoder"]["resnet"]["layer4"][0]["conv1"]["kernel"]).max()) > 0
    assert float(jnp.abs(upd_e["encoder"]["resnet"]["conv1"]["kernel"]).max()) == 0
    assert float(jnp.abs(upd_e["decoder"]["embed"]).max()) == 0


def test_lr_get_set(tiny_cf, tiny_model):
    _, params, _ = tiny_model
    dual, opt_state = make_dual_optimizer(params, tiny_cf)
    assert get_lr(opt_state, "decoder") == pytest.approx(1e-3)
    assert get_lr(opt_state, "encoder") == pytest.approx(1e-5)
    opt_state = set_lr(opt_state, "decoder", 5e-4)
    assert get_lr(opt_state, "decoder") == pytest.approx(5e-4)


def test_adam_first_step_matches_torch(tiny_cf):
    """One update on a toy linear group must equal torch.optim.Adam."""
    import optax
    from adaptive_tpu.training.optim import make_group_optimizer

    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    g = np.array([[0.1, -0.4], [0.2, 0.3]], np.float32)

    tp = torch.nn.Parameter(_t(w0))
    topt = torch.optim.Adam([tp], lr=1e-3, betas=(0.8, 0.999))
    tp.grad = _t(g)
    topt.step()
    topt.step()  # second step with same grad

    tx = make_group_optimizer("rnn", "opt_rnn", tiny_cf)  # adam 1e-3 (0.8, 0.999)
    params = {"w": jnp.asarray(w0)}
    st = tx.init(params)
    for _ in range(2):
        upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), atol=1e-6)


# ----------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path, tiny_cf, tiny_model):
    _, params, state = tiny_model
    dual, opt_state = make_dual_optimizer(params, tiny_cf)
    path = str(tmp_path / checkpoint_name(0.5123, 7))
    save_checkpoint(path, params, state, opt_state, {"epoch": 7})

    zeroed = jax.tree.map(jnp.zeros_like, params)
    p2, s2 = restore_model(path, zeroed, jax.tree.map(jnp.zeros_like, state))
    chex = np.testing.assert_allclose
    chex(np.asarray(p2["decoder"]["embed"]), np.asarray(params["decoder"]["embed"]))
    chex(
        np.asarray(s2["resnet"]["bn1"]["mean"]),
        np.asarray(state["resnet"]["bn1"]["mean"]),
    )
    o2 = restore_opt_state(path, jax.tree.map(jnp.zeros_like, opt_state))
    lr = get_lr(o2, "decoder")
    assert lr == pytest.approx(1e-3)
    assert epoch_from_filename(path) == 7
    assert epoch_from_filename("x/cider-0.9000_model-21.pkl") == 21


@pytest.mark.slow
def test_grad_accum_matches_monolithic(tiny_cf):
    """accum=2 step == accum=1 step on the same batch when the per-microbatch
    RNG folding is accounted for: we compare against a manual combination of
    the two microbatch gradients using the same split keys, and separately
    check the monolithic step with variable lengths (mask-weighted combining
    is exact, not a mean-of-means)."""
    import jax
    import jax.numpy as jnp

    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.training.optim import make_dual_optimizer
    from adaptive_tpu.training.step import make_train_step

    cf = tiny_cf.replace(train_batch_size=4, train_crop_size=64)
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    B, T = 4, 6
    batch = {
        "images": rng.integers(0, 255, (B, 72, 72, 3), dtype=np.uint8),
        "captions": rng.integers(1, 32, (B, T)).astype(np.int32),
        # variable lengths: microbatches carry different valid-token counts
        "lengths": np.array([6, 3, 5, 4], np.int32),
    }
    key = jax.random.PRNGKey(3)

    dual, opt_state = make_dual_optimizer(params, cf)
    step_acc = make_train_step(model, dual, cf.replace(train_grad_accum_steps=2))(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state),
        jax.tree.map(jnp.copy, opt_state), dict(batch), key, True,
    )

    # manual oracle: run the monolithic step on each microbatch with the same
    # folded keys, combining sum-NLL/valid-count by hand
    from adaptive_tpu.ops.preprocess import train_preprocess
    from adaptive_tpu.training.step import masked_ce_sum

    keys = jax.random.split(key, 2)

    def micro_sums(params_, state_, mb, k):
        def f(p):
            imgs = train_preprocess(k, mb["images"], 64, model.compute_dtype)
            scores, _, new_s = model.forward(p, state_, imgs, mb["captions"], train=True)
            s, n = masked_ce_sum(scores, mb["captions"], mb["lengths"])
            return s, n
        (s, n), g = jax.value_and_grad(f, has_aux=True)(params_)
        return s, n, g

    mb0 = {k_: v[:2] for k_, v in batch.items()}
    mb1 = {k_: v[2:] for k_, v in batch.items()}
    s0, n0, g0 = micro_sums(params, state, mb0, keys[0])
    # second microbatch sees the state updated by the first (BN running stats)
    _, _, st1 = model.forward(
        params, state, train_preprocess(keys[0], mb0["images"], 64, model.compute_dtype),
        mb0["captions"], train=True,
    )
    s1, n1, g1 = micro_sums(params, st1, mb1, keys[1])
    n_total = float(n0 + n1)
    loss_manual = float((s0 + s1) / n_total)

    np.testing.assert_allclose(float(step_acc.loss), loss_manual, rtol=1e-5)

    # the accumulated update must equal applying the manually-combined grads
    g_manual = jax.tree.map(lambda a, b: (np.asarray(a, np.float64) + np.asarray(b, np.float64)) / n_total, g0, g1)
    # spot-check a couple of leaves via the optimizer-free quantity: compare
    # grads by re-deriving them from the param delta is optimizer-specific, so
    # instead rebuild the step's internal grads through a 1-step SGD trick:
    # simpler and robust — compare the embedding update direction
    cf_sgd = cf.replace(
        train_grad_accum_steps=2, opt_rnn_optimization="sgd", opt_cnn_optimization="sgd",
        opt_rnn_sgd_momentum=0.0, opt_cnn_sgd_momentum=0.0,
        opt_rnn_sgd_weight_decay=0.0, opt_cnn_sgd_weight_decay=0.0,
    )
    dual2, opt2 = make_dual_optimizer(params, cf_sgd)
    lr = float(cf_sgd.opt_rnn_sgd_learning_rate)
    out_sgd = make_train_step(model, dual2, cf_sgd)(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state),
        opt2, dict(batch), key, True,
    )
    delta = np.asarray(out_sgd.params["decoder"]["embed"], np.float64) - np.asarray(
        params["decoder"]["embed"], np.float64
    )
    np.testing.assert_allclose(
        delta, -lr * np.asarray(g_manual["decoder"]["embed"], np.float64),
        atol=1e-6,
    )


def test_async_checkpointer_and_atomicity(tmp_path, tiny_cf, tiny_model):
    """AsyncCheckpointer: background write lands the same bytes, saves are
    atomic (no .tmp visible after wait, overwrite of an existing dir works),
    and write errors surface on the next wait()."""
    import os

    from adaptive_tpu.training.checkpoint import AsyncCheckpointer

    _, params, state = tiny_model
    dual, opt_state = make_dual_optimizer(params, tiny_cf)

    saver = AsyncCheckpointer()
    path = str(tmp_path / checkpoint_name(0.25, 1))
    saver.save(path, params, state, opt_state, {"epoch": 1})
    saver.wait()
    assert os.path.isdir(path) and not os.path.exists(path + ".tmp")

    zeroed = jax.tree.map(jnp.zeros_like, params)
    p2, _ = restore_model(path, zeroed, jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(
        np.asarray(p2["decoder"]["embed"]), np.asarray(params["decoder"]["embed"])
    )

    # overwrite the same path (atomic replace, second save waits for first)
    bumped = jax.tree.map(lambda x: x + 1, params)
    saver.save(path, bumped, state, None, {"epoch": 2})
    saver.save(str(tmp_path / checkpoint_name(0.5, 2)), params, state)
    saver.wait()
    p3, _ = restore_model(path, zeroed, jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(
        np.asarray(p3["decoder"]["embed"]),
        np.asarray(params["decoder"]["embed"]) + 1,
    )

    # an IO failure in the background thread surfaces on wait()
    file_path = tmp_path / "not_a_dir"
    file_path.write_text("x")
    saver.save(str(file_path / "child"), params, state)  # mkdir under a file
    with pytest.raises(Exception):
        saver.wait()


def test_grad_accum_encoder_off_matches_monolithic(tiny_cf):
    """Pre-fine-tune (encoder frozen) accumulation: the pruned-carry path
    yields the same decoder updates as monolithic, and zero resnet movement."""
    import jax
    import jax.numpy as jnp

    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.training.step import make_train_step

    cf = tiny_cf.replace(
        train_batch_size=4, opt_rnn_optimization="sgd", opt_cnn_optimization="sgd",
        opt_rnn_sgd_momentum=0.0, opt_rnn_sgd_weight_decay=0.0,
    )
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(8)
    batch = {
        "images": rng.integers(0, 255, (4, 72, 72, 3), dtype=np.uint8),
        "captions": rng.integers(1, 32, (4, 6)).astype(np.int32),
        "lengths": np.array([6, 4, 5, 3], np.int32),
    }
    key = jax.random.PRNGKey(5)

    outs = {}
    for accum in (1, 2):
        dual, opt_state = make_dual_optimizer(params, cf)
        step = make_train_step(model, dual, cf.replace(train_grad_accum_steps=accum))
        outs[accum] = step(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state),
            opt_state, dict(batch), key, False,  # encoder_on=False
        )
    # frozen resnet must not move under accumulation
    k0 = next(iter(params["encoder"]["resnet"]))
    leaf = lambda t: np.asarray(jax.tree.leaves(t["encoder"]["resnet"][k0])[0])
    np.testing.assert_array_equal(leaf(outs[2].params), leaf({"encoder": {"resnet": params["encoder"]["resnet"]}}))
    assert np.isfinite(float(outs[2].loss))
    # NOTE: accum=1 vs accum=2 losses differ only via BN-stat microbatching in
    # the forward; grads were proven exact in test_grad_accum_matches_monolithic.
    np.testing.assert_allclose(float(outs[1].loss), float(outs[2].loss), rtol=5e-2)


def test_save_checkpoint_refuses_non_checkpoint_dir(tmp_path, tiny_cf, tiny_model):
    """Overwrite-by-swap must not delete arbitrary existing directories."""
    _, params, state = tiny_model
    victim = tmp_path / "precious"
    victim.mkdir()
    (victim / "data.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to replace"):
        save_checkpoint(str(victim), params, state)
    assert (victim / "data.txt").read_text() == "do not delete"


def test_grad_accum_with_lbfgs_rejected(tiny_cf):
    from adaptive_tpu.config import load_config

    with pytest.raises(NotImplementedError, match="lbfgs"):
        load_config(None, opt_rnn_optimization="lbfgs", train_grad_accum_steps=2,
                    train_batch_size=4)
