"""Malicious imprint blocks ("Robbing the Fed", Fowl et al.; "Curious Abandon
Honesty", Boenisch et al.).

TPU-native counterpart of reference
breaching/cases/malicious_modifications/imprint.py. Each block is a flax module
whose parameters are *deterministic functions of the attack hyperparameters*
(bin boundaries from inverse CDFs, linear query rows) — initialization happens in
numpy at construction and is baked into the init functions, so the resulting
(params, buffers) pytrees are ordinary model state that flows through the payload
like any honest parameter.

Model surgery is functional: the malicious server wraps the victim module in
`ImprintedModel` (imprint block in front, victim behind) instead of mutating a
module list; see breaching_tpu/cases/malicious/servers.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from scipy.stats import laplace, norm


def _linear_query(linfunc: str, mode: int, num_bins: int, data_size: int, rng) -> np.ndarray:
    """One shared measurement row, repeated per bin (reference: imprint.py:42-61)."""
    K, N = num_bins, data_size
    if linfunc == "avg":
        weights = np.ones((K, N)) / N
    elif linfunc == "fourier":
        row = np.cos(math.pi / N * (np.arange(N) + 0.5) * mode) / N * max(mode, 0.33) * 4
        weights = np.tile(row, (K, 1))
    elif linfunc in ("randn", "rand"):
        row = rng.standard_normal(N) if linfunc == "randn" else rng.uniform(size=N)
        row = (row - row.mean()) / row.std() / math.sqrt(N)
        weights = np.tile(row, (K, 1))
    else:
        raise ValueError(f"Invalid linear function choice {linfunc}.")
    return weights.astype(np.float32)


class ImprintBlock(nn.Module):
    """Cumulative-bin imprint block (reference: imprint.py:9-93).

    linear0 projects inputs onto one measurement direction with biases at the
    inverse-CDF bin edges; ReLU makes bin hits cumulative; the connection maps
    activations back to the input shape so the victim model still runs.
    """

    data_shape: tuple  # (H, W, C) of the original input
    num_bins: int
    connection: str = "linear"
    gain: float = 1e-3
    linfunc: str = "fourier"
    mode: int = 0
    seed: int = 0

    structure = "cumulative"

    def _bins(self):
        bins = [-10.0]
        mass_per_bin = 1 / self.num_bins
        for i in range(1, self.num_bins):
            if "fourier" in self.linfunc:
                bins.append(float(laplace(loc=0.0, scale=1 / math.sqrt(2)).ppf(i * mass_per_bin)))
            else:
                bins.append(float(norm().ppf(i * mass_per_bin)))
        return bins

    def _weights_and_biases(self):
        data_size = int(np.prod(self.data_shape))
        rng = np.random.default_rng(self.seed)
        weights = _linear_query(self.linfunc, self.mode, self.num_bins, data_size, rng) * self.gain
        biases = -np.asarray(self._bins(), np.float32) * self.gain
        return weights, biases

    @nn.compact
    def __call__(self, x, train: bool = False):
        data_size = int(np.prod(self.data_shape))
        weights, biases = self._weights_and_biases()
        x_in = x
        flat = x.reshape(x.shape[0], -1)
        w0 = self.param("linear0_kernel", lambda *_: jnp.asarray(weights.T))  # (N, K)
        b0 = self.param("linear0_bias", lambda *_: jnp.asarray(biases))
        acts = self._nonlin(flat @ w0 + b0)
        if self.connection == "linear":
            w2 = self.param("linear2_kernel",
                            lambda *_: jnp.ones((self.num_bins, data_size), jnp.float32) / self.gain)
            b2 = self.param("linear2_bias",
                            lambda *_: jnp.full((data_size,), -float(np.mean(self._bins())), jnp.float32))
            out = acts @ w2 + b2
        elif self.connection == "cat":
            out = jnp.concatenate([acts, flat[:, self.num_bins:]], axis=1)
        elif self.connection == "softmax":
            s = jax.nn.softmax(acts, axis=1)[:, :, None]
            out = (flat[:, None, :] * s).sum(axis=1)
        else:  # addition
            out = flat + acts.mean(axis=1, keepdims=True)
        return out.reshape(x.shape[0], *self.data_shape)

    def _nonlin(self, x):
        return nn.relu(x)


class SparseImprintBlock(ImprintBlock):
    """Sparse bins via a hard-tanh window (reference: imprint.py:96-130)."""

    gain: float = 1.0
    structure = "sparse"

    def _bins(self):
        bins, mass = [], 0.0
        for _ in range(self.num_bins + 1):
            mass += 1 / (self.num_bins + 2)
            if "fourier" in self.linfunc:
                bins.append(float(laplace(loc=0, scale=1 / math.sqrt(2)).ppf(mass)))
            else:
                bins.append(float(norm().ppf(mass)))
        self._bin_sizes = [bins[i + 1] - bins[i] for i in range(len(bins) - 1)]
        return bins[1:]

    def _weights_and_biases(self):
        data_size = int(np.prod(self.data_shape))
        rng = np.random.default_rng(self.seed)
        bins = self._bins()
        weights = _linear_query(self.linfunc, self.mode, self.num_bins, data_size, rng)
        weights = weights / np.asarray(self._bin_sizes, np.float32)[:, None]
        biases = -np.asarray(bins, np.float32) / np.asarray(self._bin_sizes, np.float32)
        return (weights * self.gain).astype(np.float32), (biases * self.gain).astype(np.float32)

    def _nonlin(self, x):
        return jnp.clip(x, 0.0, self.gain)


class OneShotBlock(ImprintBlock):
    """Two-bin variant targeting a known value (reference: imprint.py:133-155)."""

    target_val: float = 0.0
    virtual_bins: int = 0  # set to num_bins at build; num_bins forced to 2
    structure = "cumulative"

    def _bins(self):
        v_bins = self.virtual_bins or self.num_bins
        bins = [-10.0]
        mass_per_bin = 1 / v_bins
        for i in range(1, v_bins):
            if "fourier" in self.linfunc:
                bins.append(float(laplace(loc=0.0, scale=1 / math.sqrt(2)).ppf(i * mass_per_bin)))
            else:
                bins.append(float(norm().ppf(i * mass_per_bin)))
            if self.target_val < bins[-1]:
                break
        return bins[-2:]


class OneShotBlockSparse(SparseImprintBlock):
    """Single sparse bin of uniform mass (reference: imprint.py:158-178)."""

    structure = "sparse"

    def _bins(self):
        mass_per_bin = 1 / self.num_bins
        bins = [-float(norm().ppf(0.5)), -float(norm().ppf(0.5 + mass_per_bin))]
        self._bin_sizes = [bins[1] - bins[0]]
        return bins[:-1]

    def _weights_and_biases(self):
        data_size = int(np.prod(self.data_shape))
        rng = np.random.default_rng(self.seed)
        bins = self._bins()
        weights = _linear_query(self.linfunc, self.mode, 1, data_size, rng)
        weights = weights / np.asarray(self._bin_sizes, np.float32)[:, None]
        biases = -np.asarray(bins, np.float32) / np.asarray(self._bin_sizes, np.float32)
        return weights.astype(np.float32), biases.astype(np.float32)


class CuriousAbandonHonesty(nn.Module):
    """Trap-weight sparse ReLU block (Boenisch et al.; reference: imprint.py:181-238).

    Each row has half negative, half positive-scaled random entries so that a
    single example activates each trap neuron with known probability.
    """

    data_shape: tuple
    num_bins: int
    mu: float = 0.0
    sigma: float = 0.5
    scale_factor: float = 0.95
    connection: str = "linear"
    seed: int = 0

    structure = "sparse"

    def _trap_weights(self):
        N = int(np.prod(self.data_shape))
        K = self.num_bins
        rng = np.random.default_rng(self.seed)
        final = np.empty((K, N), np.float32)
        for row in range(K):
            perm = rng.permutation(N)
            sampled = -np.abs(rng.standard_normal(N // 2) * self.sigma)
            final[row, perm[: N // 2]] = sampled
            final[row, perm[N // 2:]] = np.resize(-self.scale_factor * sampled, N - N // 2)
        return final

    @nn.compact
    def __call__(self, x, train: bool = False):
        N = int(np.prod(self.data_shape))
        x_in = x
        flat = x.reshape(x.shape[0], -1)
        w0 = self.param("linear0_kernel", lambda *_: jnp.asarray(self._trap_weights().T))
        b0 = self.param("linear0_bias", lambda *_: jnp.full((self.num_bins,), self.mu, jnp.float32))
        acts = nn.relu(flat @ w0 + b0)
        if self.connection == "linear":
            w2 = self.param("linear2_kernel", lambda *_: jnp.ones((self.num_bins, N), jnp.float32))
            b2 = self.param("linear2_bias", lambda *_: jnp.zeros((N,), jnp.float32))
            out = acts @ w2 + b2
        else:
            out = flat + acts.mean(axis=1, keepdims=True)
        return out.reshape(x.shape[0], *self.data_shape)
