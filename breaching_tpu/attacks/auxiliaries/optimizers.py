"""Optimizer + schedule assembly on optax.

Counterpart of reference breaching/attacks/auxiliaries/common.py:5-40 (and the
vendored GradualWarmupScheduler). Optimizers become optax gradient transforms and
schedules become optax schedules, so the whole update lives inside the jitted
attack scan. L-BFGS uses optax's implementation with a zoom linesearch.
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
        # L-BFGS needs the loss value/function at update time (closure semantics);
        # the attack loop passes them through optax's extra-args mechanism.
        return optax.lbfgs(
            learning_rate=None,
            linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=20),
        ), True
    raise ValueError(f"Invalid optimizer {optim_name} given.")
