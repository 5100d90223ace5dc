"""R-GAP: recursive layer-by-layer gradient inversion (Zhu & Blaschko).

TPU-native counterpart of reference breaching/attacks/recursive_attack.py and its
auxiliaries (recursive_attack.py, conv2circulant.py). The reference hand-builds
circulant matrices for each convolution on the CPU; here the conv and
weight-gradient operators are *materialized by `jax.jacfwd` of the actual conv
primitives* — the jacobian of a linear map is exactly the circulant matrix, built
on-device, with padding handled by the conv itself (so the reference's explicit
padding constraints and "peeling" masks disappear).

Per layer (walking backwards):
    da  = activation derivative at the recovered layer input x_
    out = inverse-activation(x_)                       (pre-activation output)
    k   = (W_above^T k) * da                           (propagated dl/dy)
    solve [K; W] x = [vec(g_W); out] by least squares  (gradient + consistency)
where K = d vec(g_W)/d x for fixed k and W is the conv operator.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from .analytic_attack import invert_fc_layer
from .base_attack import _BaseAttacker

log = logging.getLogger(__name__)


def inverse_udldu(udldu, step_size=0.01, steps=30_000):
    """Invert u * dl/du = -u / (1 + e^u) by scalar gradient descent
    (reference: auxiliaries/recursive_attack.py:11-24), as one jitted scan."""
    import optax

    opt = optax.adam(step_size)

    def loss(u):
        return jnp.square(-u / (1 + jnp.exp(u)) - udldu)

    def step(carry, _):
        u, state = carry
        grad = jax.grad(loss)(u)
        updates, state = opt.update(grad, state, u)
        return (optax.apply_updates(u, updates), state), None

    (u, _), _ = jax.lax.scan(step, (jnp.zeros(()), opt.init(jnp.zeros(()))), length=steps)
    err = -u / (1 + jnp.exp(u)) - udldu
    log.info(f"The error term of inversing udldu: {float(err):.1e}")
    return u


def derive_leakyrelu(x, slope=0.2):
    return jnp.where(x < 0, slope, 1.0)


def inverse_leakyrelu(x, slope=0.2):
    return jnp.where(x < 0, x / slope, x)


class RecursiveAttacker(_BaseAttacker):
    """R-GAP for alternating conv/activation stacks (cnn6)."""

    def __repr__(self):
        return (f"Attacker (of type {self.__class__.__name__}) with settings:\n"
                f"    inversion: step size {self.cfg.inversion.step_size}, "
                f"steps {self.cfg.inversion.steps}")

    def reconstruct(self, server_payload, shared_data, server_secrets=None, dryrun=False):
        rec_models, labels, stats = self.prepare_attack(server_payload, shared_data)
        shared_data = self._shared_data_cache

        inputs_from_queries = []
        for model, user_data in zip(rec_models, shared_data):
            inputs = self._rgap(user_data["gradients"], labels, model)
            inputs_from_queries.append(inputs)
        final = jnp.mean(jnp.stack(inputs_from_queries), axis=0)
        return dict(data=final, labels=labels), stats

    def _rgap(self, gradients, labels, model):
        layers = model.rgap_layers
        if layers is None:
            raise ValueError(
                f"Model {model.name} does not expose an rgap_layers recursion plan; "
                f"R-GAP supports the cnn6 architecture (reference model_preparation.py:364-385).")

        c, h, w = self.data_shape
        shapes = self._layer_input_shapes(layers, (1, h, w, c))

        # ---- head initialization (bias trick; reference recursive_attack.py:88-99) ----
        # The recursion itself runs in float64 on the host (like the reference's
        # double-precision CPU solves): per-layer errors compound multiplicatively,
        # and float32 costs ~35dB of final PSNR here. The linear operators are
        # still materialized by JAX jacfwd (their entries are exact f32 weights).
        w_grad, b_grad = model.head_grads(gradients)
        x_ = np.asarray(invert_fc_layer(w_grad, b_grad, [0]), np.float64)
        head_kernel = self._head_kernel(model.params, model)
        k = np.asarray(b_grad, np.float64).reshape(-1)     # dl/dlogits
        last_w = np.asarray(head_kernel, np.float64).T      # (classes, feat)

        # ---- recurse through conv/activation pairs, back to front ----
        for idx in range(len(layers) - 1, -1, -1):
            spec = layers[idx]
            slope = spec.get("slope", 0.2)
            da = np.where(x_ < 0, slope, 1.0)
            out = np.where(x_ < 0, x_ / slope, x_)
            k = (last_w.T @ k) * da.reshape(-1)

            kernel = self._fetch(model.params, spec["path"])["kernel"]
            g_w = np.asarray(self._fetch(gradients, spec["path"])["kernel"], np.float64).reshape(-1)
            in_shape = shapes[idx]

            x_, last_w = self._solve_layer(
                k, g_w, out.reshape(-1), kernel, in_shape,
                stride=spec["stride"], padding=spec["padding"])
        return jnp.asarray(x_.reshape(1, h, w, c), jnp.float32)

    def _solve_layer(self, k, g_w, out, kernel, in_shape, stride, padding):
        """Least-squares solve of [K; W] x = [g_w; out] with jacfwd-materialized
        operators (reference: cnn_reconstruction, auxiliaries/recursive_attack.py:54-75)."""
        x_len = int(np.prod(in_shape))

        def conv_apply(x_flat):
            x = x_flat.reshape(in_shape)
            y = jax.lax.conv_general_dilated(
                x, kernel, (stride, stride), [(padding, padding), (padding, padding)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.reshape(-1)

        y_len = conv_apply(jnp.zeros(x_len)).shape[0]
        k_y = jnp.asarray(k.reshape(-1)[:y_len], jnp.float32)

        def weight_grad_of_x(x_flat):
            x = x_flat.reshape(in_shape)

            def contraction(kern):
                y = jax.lax.conv_general_dilated(
                    x, kern, (stride, stride), [(padding, padding), (padding, padding)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.vdot(y.reshape(-1), k_y)

            return jax.grad(contraction)(kernel).reshape(-1)

        # exact-f32 operator entries: TPU DEFAULT precision would materialize
        # the circulants through bf16 passes and poison the f64 recursion
        with jax.default_matmul_precision("highest"):
            W = np.asarray(jax.jacfwd(conv_apply)(jnp.zeros(x_len)), np.float64)        # (y_len, x_len)
            K = np.asarray(jax.jacfwd(weight_grad_of_x)(jnp.zeros(x_len)), np.float64)  # (w_len, x_len)

        A = np.concatenate([K, W], axis=0)
        b = np.concatenate([g_w, out[:y_len]], axis=0)
        x, residuals, rank, sv = np.linalg.lstsq(A, b, rcond=None)
        log.info(f"lstsq rank: {int(rank)} -> {W.shape[-1]}, "
                 f"max/min singular value: {sv.max():.2e}/{sv.min():.2e}")
        return x, W

    def _layer_input_shapes(self, layers, input_shape):
        shapes = [input_shape]
        shape = input_shape
        for spec in layers:
            _, h, w, _ = shape
            k, s, p = spec.get("kernel", 3), spec["stride"], spec["padding"]
            out_h = (h + 2 * p - k) // s + 1
            out_w = (w + 2 * p - k) // s + 1
            shape = (1, out_h, out_w, spec["features"])
            shapes.append(shape)
        return shapes

    @staticmethod
    def _fetch(tree, path):
        node = tree
        for key in path:
            node = node[key]
        return node

    def _head_kernel(self, params, model):
        node = params
        for key in model.head_path:
            node = node[key]
        if "kernel" not in node:
            node = node["dense"]
        return node["kernel"]
