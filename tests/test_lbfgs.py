"""torch-semantics L-BFGS (attacks/auxiliaries/optimizers.py).

The reference uses torch.optim.LBFGS directly (breaching/attacks/auxiliaries/
common.py:18); ours is a jittable re-implementation, so its convergence and
failure-recovery behavior need their own coverage.
"""

import jax
import jax.numpy as jnp
import pytest

from breaching_tpu.attacks.auxiliaries.optimizers import optimizer_lookup


def _run(value_fn, x0, steps=5, lr=1.0):
    opt, needs_value_fn = optimizer_lookup("l-bfgs", lr, max_iterations=steps)
    assert needs_value_fn
    params = jnp.asarray(x0, jnp.float32)
    state = opt.init(params)
    vg = jax.value_and_grad(value_fn)

    @jax.jit
    def step(params, state):
        value, grad = vg(params)
        updates, state = opt.update(grad, state, params, value=value,
                                    grad=grad, value_fn=value_fn)
        return params + updates, state

    for _ in range(steps):
        params, state = step(params, state)
    return params


def test_lbfgs_converges_on_quadratic():
    a = jnp.asarray([3.0, -1.0, 0.5])
    x = _run(lambda p: jnp.sum((p - a) ** 2), jnp.zeros(3), steps=3)
    assert jnp.allclose(x, a, atol=1e-4)


def test_lbfgs_rosenbrock():
    def rosen(p):
        return (1 - p[0]) ** 2 + 100.0 * (p[1] - p[0] ** 2) ** 2

    x = _run(rosen, jnp.asarray([-1.2, 1.0]), steps=40, lr=0.5)
    assert rosen(x) < 1e-3


def test_lbfgs_backtracks_out_of_nonfinite_overshoot():
    """Regression: an overshoot into a non-finite region must backtrack (shrink
    the step scale and retry), not break. The direction is deterministic in
    (grad, history), so breaking retried the identical overshoot on every
    future outer call — a permanent stall, observed on transformer DLG."""

    def barrier(p):
        # minimum at x = 1; NaN for x <= 0. lr=10 makes the first trial step
        # from x=3 land at x < 0.
        return jnp.sum(-jnp.log(p) + p)

    x0 = jnp.asarray([3.0])
    x = _run(barrier, x0, steps=8, lr=10.0)
    # stall-free is the contract: the old code rejected the overshoot and then
    # retried the identical step forever, leaving params exactly at x0. A
    # fixed-step method at lr=10 cannot settle to high precision — assert
    # progress into the basin, finite everywhere.
    assert jnp.all(jnp.isfinite(x)) and jnp.isfinite(barrier(x))
    assert float(barrier(x)) < float(barrier(x0)) - 0.3, (x, barrier(x))
    assert jnp.all(jnp.abs(x - 1.0) < 1.0), x
