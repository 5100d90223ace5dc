"""Coarse-to-fine multiscale gradient inversion.

TPU-native counterpart of reference
breaching/attacks/multiscale_optimization_attack.py (MultiScaleOptimizationAttacker).
Each pyramid stage runs the base attack's jitted scan at that resolution (one
compile per stage shape); between stages the best candidate is bilinearly resized
with `jax.image.resize`. The 'focus' resize embeds the previous solution at half
size inside a fresh init (reference:288-296).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from .optimization_based_attack import OptimizationBasedAttacker

log = logging.getLogger(__name__)


class MultiScaleOptimizationAttacker(OptimizationBasedAttacker):

    supports_fleet = False  # loss/reconstruct stages ignore the fleet `extra` channel
    def _scale_pyramid(self):
        size = self.data_shape[1]
        num_stages = int(self.cfg.num_stages)
        scheme = self.cfg.scale_pyramid
        if scheme == "linear":
            increment = size // num_stages
            return list(range(increment, size + 1, increment))
        if scheme == "log":
            return [int(round(size / (2 ** i))) for i in range(num_stages - 1, -1, -1)]
        if scheme == "trivial":
            return [size] * num_stages
        raise ValueError(f"Invalid scale pyramid {scheme}.")

    def _run_all_trials(self, rec_models, shared_data, labels, stats, initial_data, dryrun):
        from ..utils import split_key

        assert self.data_shape[1] == self.data_shape[2], "multiscale assumes square images"
        pyramid = self._scale_pyramid()
        full_shape = self.data_shape
        c = full_shape[0]
        num_trials = int(self.cfg.restarts.num_trials)
        num_points = int(shared_data[0]["metadata"]["num_data_points"] or
                         (len(labels) if labels is not None else 1))

        stage_best = None
        for stage, scale in enumerate(pyramid):
            log.info(f"| Now solving stage {stage + 1}/{len(pyramid)} with scale {scale}:")
            self.data_shape = (c, int(scale), int(scale))
            if stage_best is None:
                stage_init = initial_data
            else:
                prev = jnp.asarray(stage_best)
                if self.cfg.get("resize") == "focus":
                    p = scale // 2
                    small = jax.image.resize(prev, (num_points, p, p, c), "bilinear")
                    background = self._initialize_data(
                        (num_points, scale, scale, c), split_key(self.setup))
                    cx = (scale - p) // 2
                    stage_init = background.at[:, cx:cx + p, cx:cx + p, :].set(small)
                else:
                    stage_init = jax.image.resize(prev, (num_points, scale, scale, c), "bilinear")

            best_trees, best_vals, stats = super()._run_all_trials(
                rec_models, shared_data, labels, stats, stage_init, dryrun)
            # keep per-trial bests; carry trial 0's shape for the next stage init
            scores = best_vals
            stage_best = np.asarray(best_trees["data"][int(np.argmin(scores))])
            if dryrun:
                break

        self.data_shape = full_shape
        final = jax.image.resize(
            jnp.asarray(best_trees["data"]),
            (best_trees["data"].shape[0], num_points, full_shape[1], full_shape[2], c),
            "bilinear")
        return dict(data=jax.device_get(final)), best_vals, stats
