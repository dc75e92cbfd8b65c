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

    new, entry, first_loss = opt.step(params, loss, entry, 1.0)
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

    new, entry, _ = opt.step(params, loss, entry, 0.5)
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
        params, entry, _ = opt.step(params, loss, entry, 0.3)
        np.testing.assert_allclose(np.asarray(params["x"]), tp.detach().numpy(),
                                   rtol=1e-4, atol=1e-4)
