"""Reference-flavor L-BFGS: trajectory-exact parity with torch.optim.LBFGS
under the reference's configuration (max_iter=1, history_size=10, lr=1.0, no
line search — /root/reference/style_transfer/style_transfer.py:464-467).
VERDICT r1 missing #3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.step import lbfgs_init, lbfgs_step

torch = pytest.importorskip("torch")


def _problem(n=40, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, n).astype(np.float32)
    a = (q @ q.T / n + np.eye(n, dtype=np.float32)).astype(np.float32)
    b = rng.randn(n).astype(np.float32)
    x0 = rng.randn(n).astype(np.float32)
    return a, b, x0


def _f_np(a, b, x):
    return 0.5 * x @ a @ x - b @ x + 0.01 * np.sum(x**4)


def _torch_trajectory(a, b, x0, iters, lr=1.0, history_size=10):
    at = torch.tensor(a)
    bt = torch.tensor(b)
    x = torch.tensor(x0.copy(), requires_grad=True)
    opt = torch.optim.LBFGS([x], lr=lr, max_iter=1, history_size=history_size)
    losses = []

    def closure():
        opt.zero_grad()
        loss = 0.5 * x @ at @ x - bt @ x + 0.01 * torch.sum(x**4)
        loss.backward()
        return loss

    for _ in range(iters):
        losses.append(float(opt.step(closure)))
    return np.asarray(losses), x.detach().numpy()


def _jax_trajectory(a, b, x0, iters, lr=1.0):
    aj = jnp.asarray(a)
    bj = jnp.asarray(b)

    def f(x):
        return 0.5 * x @ aj @ x - bj @ x + 0.01 * jnp.sum(x**4)

    vg = jax.jit(jax.value_and_grad(f))
    x = jnp.asarray(x0)
    state = lbfgs_init(x)
    losses = []
    step = jax.jit(lambda s, x, g: lbfgs_step(s, x, g, lr=lr))
    for _ in range(iters):
        loss, g = vg(x)
        losses.append(float(loss))
        x, state = step(state, x, g)
    return np.asarray(losses), np.asarray(x)


def test_matches_torch_lbfgs_trajectory():
    a, b, x0 = _problem()
    iters = 30
    t_losses, t_x = _torch_trajectory(a, b, x0, iters)
    j_losses, j_x = _jax_trajectory(a, b, x0, iters)
    # identical algorithm in f32: tight relative agreement, loss-by-loss
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(j_x, t_x, rtol=2e-3, atol=2e-4)
    # and it actually optimizes
    assert j_losses[-1] < j_losses[0] - 1.0


def test_matches_torch_past_history_wraparound():
    """> history_size iterations: the circular buffer must match torch's
    pop-front exactly."""
    a, b, x0 = _problem(n=24, seed=3)
    iters = 25  # > 10 + first step
    t_losses, t_x = _torch_trajectory(a, b, x0, iters, history_size=5)

    import style_transfer_tpu.step as step_mod

    x = jnp.asarray(x0)
    state = lbfgs_init(x, memory_size=5)
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    def f(x):
        return 0.5 * x @ aj @ x - bj @ x + 0.01 * jnp.sum(x**4)

    vg = jax.jit(jax.value_and_grad(f))
    losses = []
    for _ in range(iters):
        loss, g = vg(x)
        losses.append(float(loss))
        x, state = lbfgs_step(state, x, g, lr=1.0)
    np.testing.assert_allclose(np.asarray(losses), t_losses, rtol=5e-4, atol=1e-4)


def test_first_step_length_rule():
    """First step is min(1, 1/|g|_1) * lr in the -g direction."""
    x0 = np.asarray([3.0, -4.0], np.float32)

    def f(x):
        return 0.5 * jnp.sum(x**2)

    g = jax.grad(f)(jnp.asarray(x0))
    state = lbfgs_init(jnp.asarray(x0))
    x1, state = lbfgs_step(state, jnp.asarray(x0), g, lr=1.0)
    t_expected = min(1.0, 1.0 / (abs(3.0) + abs(4.0)))
    np.testing.assert_allclose(
        np.asarray(x1), x0 - t_expected * x0, rtol=1e-6
    )
    assert int(state.n_iter) == 1


@pytest.mark.slow
def test_engine_runs_lbfgs_zoom(content_pil, style_pil):
    """The optax zoom-linesearch variant stays available as an opt-in."""
    from style_transfer_tpu.engine import StyleTransfer
    from style_transfer_tpu.models.weights import random_params

    st = StyleTransfer(devices=1, weights=random_params(0), callback_chunk=5)
    its = []
    st.stylize(content_pil, [style_pil], min_scale=64, end_scale=64,
               optimizer="lbfgs-zoom", iterations=10, initial_iterations=10,
               callback=its.append)
    losses = [i.loss for i in its]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_engine_runs_reference_lbfgs(content_pil, style_pil):
    """Engine smoke on the real workload: losses finite and decreasing."""
    from style_transfer_tpu.engine import StyleTransfer
    from style_transfer_tpu.models.weights import random_params

    st = StyleTransfer(devices=1, weights=random_params(0), callback_chunk=5)
    its = []
    st.stylize(content_pil, [style_pil], min_scale=64, end_scale=64,
               optimizer="lbfgs", iterations=15, initial_iterations=15,
               callback=its.append)
    losses = [i.loss for i in its]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
