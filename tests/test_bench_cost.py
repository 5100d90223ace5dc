"""Pin the XLA cost-model convention the bench's MFU accounting relies on.

XLA's ``compiled.cost_analysis()`` counts a ``lax.scan`` body ONCE regardless
of trip count. bench.py therefore treats ``chunk_cost_analysis()['flops']`` as
per-SCAN-STEP flops (it must NOT be divided by chunk_length). Round 4 shipped
that division and misreported MFU/HBM utilization by ~700x; this test fails
loudly if either the convention or the accounting regresses.

Reference: none (north-star instrumentation, BASELINE.json); the convention
was verified empirically on CPU and TPU backends.
"""

import jax
import jax.numpy as jnp
import pytest
from jax import lax

K = 64
MATMUL_FLOPS = 2 * K * K * K  # one K x K x K matmul


def _scan_matmul_cost(n_steps):
    def step(c, _):
        return c @ c, None

    def f(x):
        y, _ = lax.scan(step, x, None, length=n_steps)
        return y

    x = jnp.ones((K, K), jnp.float32)
    ca = jax.jit(f).lower(x).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0))


def test_cost_analysis_counts_scan_body_once():
    """flops(n=1) == flops(n=100) == one matmul's flops (+small overhead)."""
    f1 = _scan_matmul_cost(1)
    f100 = _scan_matmul_cost(100)
    if f1 == 0.0:
        pytest.skip("backend has no cost analysis")
    # The body is counted once: the two programs report (nearly) identical
    # flops, both within 2% of a single matmul's hand-counted count.
    assert f100 == pytest.approx(f1, rel=0.02)
    assert f1 == pytest.approx(MATMUL_FLOPS, rel=0.02)


def test_mfu_detail_uses_per_step_flops():
    """bench._mfu_detail must not divide flops by chunk_length."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    cost = dict(flops=1e9, bytes_accessed=1e8, chunk_length=700, trials=1)
    out = bench._mfu_detail(cost, steps_per_sec=100.0, device_kind="TPU v5 lite")
    # 1 GFLOP/step * 100 steps/s = 0.1 TFLOP/s; dividing by chunk_length=700
    # (the round-4 bug) would report 0.00014.
    assert out["tflops_per_sec"] == pytest.approx(0.1, rel=1e-6)
    assert out["hbm_gbytes_per_sec"] == pytest.approx(10.0, rel=1e-6)
    assert out["gflops_per_iter"] == pytest.approx(1.0, rel=1e-6)
    assert out["mfu_pct"] == pytest.approx(100 * 0.1 / 197, abs=0.01)
