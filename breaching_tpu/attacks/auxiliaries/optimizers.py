"""Optimizer + schedule assembly on optax.

Counterpart of reference breaching/attacks/auxiliaries/common.py:5-40 (and the
vendored GradualWarmupScheduler). Optimizers become optax gradient transforms and
schedules become optax schedules, so the whole update lives inside the jitted
attack scan. L-BFGS is a direct jittable implementation of torch.optim.LBFGS
semantics (see _torch_like_lbfgs — optax's variant was unusable here).
"""

from __future__ import annotations

import optax


def make_schedule(step_size: float, decay: str | None, warmup: int, max_iterations: int):
    decay = (decay or "none").lower() if decay is not None else "none"
    if decay == "step-lr":
        # MultiStepLR at ~3/8, ~5/8, ~7/8 of the run with gamma 0.1
        boundaries = {
            int(max_iterations / 2.667): 0.1,
            int(max_iterations / 1.6): 0.1,
            int(max_iterations / 1.142): 0.1,
        }
        main = optax.piecewise_constant_schedule(step_size, boundaries)
    elif decay == "cosine-decay":
        main = optax.cosine_decay_schedule(step_size, max(max_iterations, 1), alpha=0.0)
    elif decay == "linear":
        main = lambda step: step_size * (max_iterations - step) / max(max_iterations, 1)
    else:
        main = lambda step: step_size

    if warmup and warmup > 0:
        ramp = optax.linear_schedule(0.0, step_size, warmup)
        shifted_main = lambda step: main(step)  # reference warmup wraps the main schedule
        return optax.join_schedules([ramp, shifted_main], [warmup])
    return main


def optimizer_lookup(optim_name: str, step_size: float, scheduler=None, warmup=0,
                     max_iterations: int = 10_000):
    """Return an optax GradientTransformation implementing the named optimizer
    with its learning-rate schedule baked in."""
    schedule = make_schedule(step_size, scheduler, warmup, max_iterations)
    name = optim_name.lower()
    if name == "adam":
        return optax.adam(schedule), False
    if name == "adam-safe":
        return optax.adam(schedule, b1=0.5, b2=0.99, eps=1e-4), False
    if name == "bert-adam":
        return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.01), False
    if name == "momgd":
        return optax.sgd(schedule, momentum=0.9, nesterov=True), False
    if name == "gd":
        return optax.sgd(schedule), False
    if name == "l-bfgs":
        # torch.optim.LBFGS semantics (reference common.py:18): FIXED step size
        # (no line search — a failed zoom linesearch returns a zero step, which
        # poisons the (s, y) memory and freezes the attack permanently; measured
        # on DLG) and up to `max_iter=20` internal iterations per outer .step()
        # call, each re-evaluating the closure. The attack loop passes the loss
        # closure through optax's extra-args mechanism (needs_value_fn=True).
        return _torch_like_lbfgs(schedule, max_inner=20), True
    raise ValueError(f"Invalid optimizer {optim_name} given.")


def _torch_like_lbfgs(schedule, max_inner: int = 20, history: int = 100,
                      tolerance_grad: float = 1e-7,
                      tolerance_change: float = 1e-9):
    """A jittable L-BFGS matching `torch.optim.LBFGS(lr=...)` semantics.

    One `update` call = one `.step(closure)`: up to `max_inner` fixed-step
    iterations re-evaluating the closure between them, two-loop recursion over
    a rolling (s, y) history with the `ys > 1e-10` curvature guard, the global
    first step scaled by `min(1, 1/||g||_1)`, and torch's four break conditions
    (grad sup-norm, non-descent directional derivative, step sup-norm, loss
    change) — those breaks are what keeps the fixed-step method from diverging
    (torch lbfgs.py:345-470). optax.lbfgs was unusable here: its zoom
    linesearch returns a zero step on failure, which poisons the memory and
    froze DLG permanently, and its fixed-step variant diverges without torch's
    guards. Everything is masked `lax` control flow, so the whole inner loop
    lives inside the attack scan and vmaps over restart trials.
    """
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    m = history

    def init(params):
        flat, _ = ravel_pytree(params)
        n = flat.shape[0]
        dt = flat.dtype
        return dict(
            s=jnp.zeros((m, n), dt), y=jnp.zeros((m, n), dt),
            rho=jnp.zeros((m,), dt), num_old=jnp.zeros((), jnp.int32),
            h_diag=jnp.ones((), dt), prev_grad=jnp.zeros((n,), dt),
            d=jnp.zeros((n,), dt), t=jnp.zeros((), dt),
            n_iter=jnp.zeros((), jnp.int32), outer=jnp.zeros((), jnp.int32),
            # backtracking scale for the non-finite-overshoot regime (torch
            # takes the NaN step and the attack aborts on non-finite loss; we
            # reject it instead, which without a shrinking scale would retry
            # the identical overshoot forever — observed as a permanent stall
            # on transformer DLG)
            t_scale=jnp.ones((), dt),
        )

    def _two_loop(g, s, y, rho, num_old, h_diag):
        idxs = jnp.arange(m)
        valid = idxs >= (m - num_old)  # history is ordered oldest -> newest

        def bwd(i, carry):
            q, al = carry
            j = m - 1 - i
            a = jnp.where(valid[j], rho[j] * jnp.dot(s[j], q), 0.0)
            return q - a * y[j], al.at[j].set(a)

        q, al = jax.lax.fori_loop(0, m, bwd, (-g, jnp.zeros((m,), g.dtype)))
        r = q * h_diag

        def fwd(j, r):
            b = rho[j] * jnp.dot(y[j], r)
            return r + jnp.where(valid[j], al[j] - b, 0.0) * s[j]

        return jax.lax.fori_loop(0, m, fwd, r)

    def update(updates, state, params=None, *, value=None, grad=None,
               value_fn=None, **extra):
        grad = updates if grad is None else grad
        flat_params, unravel = ravel_pytree(params)
        flat_grad, _ = ravel_pytree(grad)
        lr = jnp.asarray(schedule(state["outer"]), flat_params.dtype)
        value_and_grad = jax.value_and_grad(lambda f: value_fn(unravel(f)))

        def inner(carry, _):
            p, g, loss, st, done = carry
            first_global = st["n_iter"] == 0
            # ---- memory update from the PREVIOUS step (torch lbfgs.py:389-416)
            y_new = g - st["prev_grad"]
            s_new = st["d"] * st["t"]
            ys = jnp.dot(y_new, s_new)
            admit = jnp.logical_and(~first_global, ys > 1e-10)
            s_hist = jnp.where(admit, jnp.roll(st["s"], -1, 0).at[-1].set(s_new), st["s"])
            y_hist = jnp.where(admit, jnp.roll(st["y"], -1, 0).at[-1].set(y_new), st["y"])
            rho = jnp.where(admit, jnp.roll(st["rho"], -1).at[-1].set(1.0 / ys), st["rho"])
            num_old = jnp.where(admit, jnp.minimum(st["num_old"] + 1, m), st["num_old"])
            h_diag = jnp.where(admit, ys / jnp.dot(y_new, y_new), st["h_diag"])

            d = _two_loop(g, s_hist, y_hist, rho, num_old, h_diag)
            t = jnp.where(first_global,
                          jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g))) * lr,
                          lr) * st["t_scale"]
            gtd = jnp.dot(g, d)
            # pre-step breaks: optimality / non-descent direction
            stop = jnp.logical_or(jnp.max(jnp.abs(g)) <= tolerance_grad,
                                  gtd > -tolerance_change)
            step_now = jnp.logical_and(~done, ~stop)

            p_try = p + t * d
            # torch skips the closure re-evaluation on the final inner
            # iteration and accepts the step blindly ('if n_iter != max_iter',
            # lbfgs.py) — but a blind accept can land in the non-finite region
            # and poison every future outer call (NaN loss -> NaN grad -> NaN
            # direction, all rejected: a permanent stall at finite params,
            # observed on transformer DLG). We evaluate every trial step so the
            # finiteness guard below applies uniformly; the one extra closure
            # eval per outer step (21 vs torch's 20) is the price.
            loss_try, g_try = value_and_grad(p_try)
            accept = jnp.logical_and(step_now, jnp.isfinite(loss_try))
            p_next = jnp.where(accept, p_try, p)
            g_next = jnp.where(accept, g_try, g)
            loss_next = jnp.where(accept, loss_try, loss)
            # a rejected overshoot (non-finite loss) backtracks: quarter the
            # step scale and retry the same direction next inner iteration
            # instead of breaking (the direction is deterministic in (g,
            # history), so breaking would retry the identical overshoot on
            # every future outer call — a permanent stall)
            blowup = jnp.logical_and(step_now, ~jnp.isfinite(loss_try))
            t_scale_next = jnp.where(
                blowup, st["t_scale"] * 0.25,
                jnp.where(accept, jnp.minimum(st["t_scale"] * 2.0, 1.0),
                          st["t_scale"]))
            # post-step breaks: tiny step / tiny loss change
            done_next = (done | stop
                         | (jnp.max(jnp.abs(t * d)) <= tolerance_change)
                         | (jnp.abs(loss_try - loss) < tolerance_change))

            st_next = dict(
                s=jnp.where(step_now, s_hist, st["s"]),
                y=jnp.where(step_now, y_hist, st["y"]),
                rho=jnp.where(step_now, rho, st["rho"]),
                num_old=jnp.where(step_now, num_old, st["num_old"]),
                h_diag=jnp.where(step_now, h_diag, st["h_diag"]),
                prev_grad=jnp.where(step_now, g, st["prev_grad"]),
                d=jnp.where(step_now, d, st["d"]),
                t=jnp.where(step_now, t, st["t"]),
                n_iter=st["n_iter"] + step_now.astype(jnp.int32),
                outer=st["outer"],
                t_scale=t_scale_next,
            )
            return (p_next, g_next, loss_next, st_next, done_next), None

        carry0 = (flat_params, flat_grad, jnp.asarray(value), state,
                  jnp.zeros((), bool))
        (flat_final, _, _, final_state, _), _ = jax.lax.scan(
            inner, carry0, None, length=max_inner)
        final_state = dict(final_state, outer=state["outer"] + 1)
        total = unravel(flat_final - flat_params)
        return total, final_state

    return optax.GradientTransformationExtraArgs(init, update)
