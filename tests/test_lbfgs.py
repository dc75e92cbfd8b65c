"""L-BFGS closure-step tests: quadratic convergence + masked-group isolation
+ parity direction with torch.optim.LBFGS on the first step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from adaptive_tpu.training.lbfgs import (LBFGSGroup, combine, init_lbfgs_entry,
                                         partition)


def test_partition_combine_roundtrip():
    params = {"a": jnp.ones(2), "b": {"c": jnp.zeros(3), "d": jnp.ones(1)}}
    mask = {"a": True, "b": {"c": False, "d": True}}
    tr, fr = partition(params, mask)
    assert tr["b"]["c"] is None and fr["a"] is None
    back = combine(tr, fr)
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.zeros(3))
    np.testing.assert_array_equal(np.asarray(back["a"]), np.ones(2))


def test_quadratic_convergence():
    # min ||x - t||^2 with a frozen leaf
    t = jnp.asarray([1.0, -2.0, 3.0])
    params = {"x": jnp.zeros(3), "frozen": jnp.ones(2)}
    mask = {"x": True, "frozen": False}
    opt = LBFGSGroup(mask, max_iter=20, history=10)
    entry = init_lbfgs_entry(params, mask, 1.0, 10)

    def loss(p):
        return jnp.sum((p["x"] - t) ** 2) + 0.0 * jnp.sum(p["frozen"])

    new, entry, first_loss, _, _ = opt.step(params, loss, entry, 1.0)
    assert first_loss == pytest.approx(14.0)
    np.testing.assert_allclose(np.asarray(new["x"]), np.asarray(t), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(new["frozen"]), np.ones(2))


def test_matches_torch_lbfgs_on_rosenbrock_start():
    def rosen_np(x):
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

    x0 = np.array([-1.2, 1.0], np.float32)

    tp = torch.nn.Parameter(torch.tensor(x0))
    topt = torch.optim.LBFGS([tp], lr=0.5, max_iter=20, history_size=50)

    def closure():
        topt.zero_grad()
        loss = (1 - tp[0]) ** 2 + 100 * (tp[1] - tp[0] ** 2) ** 2
        loss.backward()
        return loss

    topt.step(closure)
    want = rosen_np(tp.detach().numpy())

    params = {"x": jnp.asarray(x0)}
    opt = LBFGSGroup({"x": True}, max_iter=20, history=50)
    entry = init_lbfgs_entry(params, {"x": True}, 0.5, 50)

    def loss(p):
        x = p["x"]
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

    new, entry, _, _, _ = opt.step(params, loss, entry, 0.5)
    got = rosen_np(np.asarray(new["x"]))
    # same algorithm now (no linesearch, torch semantics): the whole 20-iter
    # trajectory must land on torch's point, not just "make progress"
    np.testing.assert_allclose(np.asarray(new["x"]), tp.detach().numpy(),
                               rtol=2e-4, atol=2e-4)
    assert got < 4.0 and want < 4.0


def test_matches_torch_lbfgs_across_steps_and_history_wrap():
    """Multi-step parity incl. ring-buffer wraparound: history=3 over 4
    step(closure) calls of max_iter=2 on a rotated quadratic — parameters
    track torch.optim.LBFGS (same lr/max_iter/history, no linesearch)
    through curvature-memory eviction and cross-step (s, y) pairs."""
    rng = np.random.default_rng(7)
    A = rng.normal(size=(6, 6)).astype(np.float32)
    Q = (A @ A.T + 6 * np.eye(6)).astype(np.float32)  # SPD, well-conditioned
    b = rng.normal(size=(6,)).astype(np.float32)
    x0 = rng.normal(size=(6,)).astype(np.float32)

    tp = torch.nn.Parameter(torch.tensor(x0))
    topt = torch.optim.LBFGS([tp], lr=0.3, max_iter=2, history_size=3)
    tQ, tb = torch.tensor(Q), torch.tensor(b)

    def closure():
        topt.zero_grad()
        loss = 0.5 * tp @ tQ @ tp - tb @ tp
        loss.backward()
        return loss

    params = {"x": jnp.asarray(x0)}
    opt = LBFGSGroup({"x": True}, max_iter=2, history=3)
    entry = init_lbfgs_entry(params, {"x": True}, 0.3, 3)

    def loss(p):
        x = p["x"]
        return 0.5 * x @ jnp.asarray(Q) @ x - jnp.asarray(b) @ x

    for _ in range(4):
        topt.step(closure)
        params, entry, _, _, _ = opt.step(params, loss, entry, 0.3)
        np.testing.assert_allclose(np.asarray(params["x"]), tp.detach().numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_grad_transform_zeroing_freezes_params():
    """grad_transform applies to EVERY closure evaluation (the reference
    clips inside the closure, train.py:213-214). A transform that zeroes
    gradients must freeze the step entirely — this also exercises torch's
    initial-convergence early return (max|g0| <= tolerance_grad)."""
    params = {"x": jnp.ones(3)}
    opt = LBFGSGroup({"x": True}, max_iter=3, history=4,
                     grad_transform=lambda g: (jax.tree.map(jnp.zeros_like, g), jnp.zeros(())))
    entry = init_lbfgs_entry(params, {"x": True}, 1.0, 4)
    new, entry2, loss0, _, _ = opt.step(params, lambda p: jnp.sum(p["x"] ** 2), entry, 1.0)
    np.testing.assert_array_equal(np.asarray(new["x"]), np.ones(3))
    assert int(entry2.n_iter) == 0 and int(entry2.count) == 0
    assert loss0 == pytest.approx(3.0)


def test_matches_torch_closure_grad_clipping():
    """The reference's closure clips grads before torch.optim.LBFGS consumes
    them (model_optimize, train.py:203-216): with the same clip as a
    grad_transform the trajectory must match torch's. Small lr keeps the
    clipped-curvature trajectory bounded (a bare quadratic with clipping
    explodes identically on both sides, which amplifies fp32 noise past any
    useful tolerance)."""
    rng = np.random.default_rng(3)
    A = rng.normal(size=(4, 4)).astype(np.float32)
    Q = (A @ A.T + 4 * np.eye(4)).astype(np.float32)
    x0 = rng.normal(size=(4,)).astype(np.float32)
    # |g0| ~ 2-3x M: the clip binds on the early evaluations (so the first
    # curvature pairs are formed from CLIPPED gradients — the behavior under
    # test) and releases as the iterates approach the minimum, keeping the
    # trajectory convergent. A persistently-binding clip makes L-BFGS on a
    # quadratic chaotic, which amplifies fp32 noise past any tolerance.
    M, LR = float(np.linalg.norm(Q @ x0) / 2.5), 0.05

    tp = torch.nn.Parameter(torch.tensor(x0))
    topt = torch.optim.LBFGS([tp], lr=LR, max_iter=4, history_size=3)
    tQ = torch.tensor(Q)

    def closure():
        topt.zero_grad()
        loss = 0.5 * tp @ tQ @ tp
        loss.backward()
        torch.nn.utils.clip_grad_norm_([tp], M)
        return loss

    def clip(g):
        total = jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(g)))
        coef = jnp.minimum(M / (total + 1e-6), 1.0)
        return jax.tree.map(lambda x: x * coef, g), total

    params = {"x": jnp.asarray(x0)}
    opt = LBFGSGroup({"x": True}, max_iter=4, history=3, grad_transform=clip)
    entry = init_lbfgs_entry(params, {"x": True}, LR, 3)
    loss = lambda p: 0.5 * p["x"] @ jnp.asarray(Q) @ p["x"]  # noqa: E731

    for _ in range(3):
        topt.step(closure)
        params, entry, _, _, _ = opt.step(params, loss, entry, LR)
        # 12 clipped fp32 iterations accumulate ~4e-4 relative rounding;
        # semantic mismatches (clip at the wrong point, unclipped curvature
        # pairs) measured 10-30% here, so 2e-3 still pins the algorithm
        np.testing.assert_allclose(np.asarray(params["x"]), tp.detach().numpy(),
                                   rtol=2e-3)


def test_eval_params_matches_torch_grad_point():
    """step() reports the LAST closure evaluation point: the gradient there
    must equal the .grad torch leaves behind after step(closure) — that is
    what the reference's encoder_optimizer.step() consumes (train.py:111-114).
    max_iter=4 (max_eval=5 never binds) makes torch skip the final
    re-evaluation, so eval_params is one update STALE relative to the
    returned params — the case that distinguishes eval_params from params."""
    rng = np.random.default_rng(11)
    A = rng.normal(size=(5, 5)).astype(np.float32)
    Q = (A @ A.T + 5 * np.eye(5)).astype(np.float32)
    x0 = rng.normal(size=(5,)).astype(np.float32)

    tp = torch.nn.Parameter(torch.tensor(x0))
    topt = torch.optim.LBFGS([tp], lr=0.2, max_iter=4, history_size=4)
    tQ = torch.tensor(Q)

    def closure():
        topt.zero_grad()
        loss = 0.5 * tp @ tQ @ tp
        loss.backward()
        return loss

    topt.step(closure)
    torch_grad = tp.grad.detach().numpy().copy()

    params = {"x": jnp.asarray(x0)}
    opt = LBFGSGroup({"x": True}, max_iter=4, history=4)
    entry = init_lbfgs_entry(params, {"x": True}, 0.2, 4)
    loss = lambda p: 0.5 * p["x"] @ jnp.asarray(Q) @ p["x"]  # noqa: E731

    new, entry, _, eval_params, _ = opt.step(params, loss, entry, 0.2)
    np.testing.assert_allclose(np.asarray(new["x"]), tp.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    ours_grad = np.asarray(jax.grad(loss)(eval_params)["x"])
    np.testing.assert_allclose(ours_grad, torch_grad, rtol=1e-4, atol=1e-4)
    # and it is NOT the gradient at the final params (the skipped re-eval)
    assert not np.allclose(
        np.asarray(jax.grad(loss)(new)["x"]), torch_grad, rtol=1e-4, atol=1e-4
    )


def test_last_aux_is_reported():
    """grad_transform's aux from the LAST evaluation comes back from step()
    (the reference logs total_norm[-1], train.py:219): with aux = max|g|,
    the reported value must match the gradient magnitude at eval_params, not
    at the start point."""
    params = {"x": jnp.asarray([4.0, -3.0])}
    tr = lambda g: (g, jnp.max(jnp.abs(g["x"])))  # noqa: E731
    opt = LBFGSGroup({"x": True}, max_iter=5, history=4, grad_transform=tr)
    entry = init_lbfgs_entry(params, {"x": True}, 0.3, 4)
    loss = lambda p: jnp.sum(p["x"] ** 2)  # noqa: E731
    new, entry, _, eval_params, aux = opt.step(params, loss, entry, 0.3)
    want = float(jnp.max(jnp.abs(jax.grad(loss)(eval_params)["x"])))
    assert aux == pytest.approx(want, rel=1e-6)
    assert aux != pytest.approx(8.0)  # not the initial |g| = |2*4|
