"""Headline benchmark: attack iterations/sec, ResNet-18 ImageNet gradient inversion.

The reference's flagship benchmark is a FLEET: ~100 independent experiments x
24k iterations, run sequentially on one GTX 2080 in "about a day"
(reference README.md:82) -> ~27.8 attack iters/sec of sustained throughput.

The TPU-native counterpart batches independent experiments on-chip
(OptimizationBasedAttacker.reconstruct_fleet): at batch 1 the MXU is starved,
so 8 concurrent single-image inversions cost ~5.5x one inversion, not 8x.
The headline is sustained aggregate attack iters/sec over an 8-experiment
wave — the same work the reference benchmark performs, measured the same way
(total iterations / wall time, first chunk excluded as compile). Per-experiment
math is identical to a solo run (tests/test_fleet.py); solo throughput is
reported in detail.single_stream_iters_per_sec.

Prints exactly one JSON line.
"""

import json
import os
import time

import breaching_tpu as breaching

BASELINE_ITERS_PER_SEC = 27.8
MEASURE_ITERS = 2800
# each chunk boundary costs ~57ms of host round-trip over the remote tunnel
# (measured: 3.80 ms/iter at callback=100 vs 3.22 ms/iter at 700); 700 keeps a
# solo chunk at ~2.3s and a fleet-of-8 chunk at ~15s, far below the worker's
# ~3-minute single-execution deadline
CHUNK = 700
# 8 saturates the chip: measured 382-387 it/s at 8 vs 371 at 16 (the extra
# batch only adds HBM pressure once the MXU pipeline is full)
FLEET = int(os.environ.get("BENCH_FLEET", 8))


def _steady_rate(stats, streams=1):
    iters = stats["chunk_iters"][1:]
    times = stats["chunk_time"][1:]
    return streams * sum(iters) / max(sum(times), 1e-9), sum(iters)


# (dense-peak TFLOP/s at the attack loop's matmul precision tier, HBM GB/s)
# per chip, keyed by jax device_kind. Sources: published TPU system specs.
TPU_PEAKS = {
    "TPU v2": (45, 700), "TPU v3": (123, 900), "TPU v4": (275, 1228),
    "TPU v5 lite": (197, 819), "TPU v5e": (197, 819),
    "TPU v5p": (459, 2765), "TPU v5": (459, 2765),
    "TPU v6 lite": (918, 1640), "TPU v6e": (918, 1640),
    "TPU v7": (2307, 7370),
}


def _mfu_detail(cost, steps_per_sec, device_kind):
    """FLOP/s + %-of-peak from the compiled chunk's XLA cost model.

    XLA's cost_analysis() counts a `lax.scan` body ONCE regardless of trip
    count (pinned by tests/test_bench_cost.py), so `cost` is already per scan
    step (all vmapped trials of it); `steps_per_sec` is scan steps/s of the
    same program, so achieved = cost["flops"] * steps_per_sec regardless of
    fleet size.
    """
    if not cost or not cost.get("flops"):
        return {}
    per_step_flops = cost["flops"]
    per_step_bytes = cost["bytes_accessed"]
    tflops = per_step_flops * steps_per_sec / 1e12
    hbm_gbps = per_step_bytes * steps_per_sec / 1e9
    out = {"tflops_per_sec": round(tflops, 2),
           "hbm_gbytes_per_sec": round(hbm_gbps, 1),
           "gflops_per_iter": round(per_step_flops / cost["trials"] / 1e9, 2)}
    peak = next((v for k, v in TPU_PEAKS.items() if device_kind.startswith(k)), None)
    if peak:
        out["mfu_pct"] = round(100 * tflops / peak[0], 2)
        out["hbm_util_pct"] = round(100 * hbm_gbps / peak[1], 1)
    return out


def main():
    import logging

    logging.disable(logging.INFO)
    overrides = [
        "case=2_single_imagenet",
        "attack=invertinggradients",
        f"attack.optim.max_iterations={MEASURE_ITERS}",
        f"attack.optim.callback={CHUNK}",
        "attack.restarts.num_trials=1",
        "case.user.provide_labels=True",
        "seed=7",
        "name=bench",
    ]
    cfg = breaching.get_config(overrides)
    setup = breaching.utils.system_startup(cfg=cfg)

    # --- the 8-experiment wave (users 0..7 of the benchmark case) ---
    # ONE case (one server, one model) like the reference benchmark loop
    # (reference benchmark_breaches.py:62-77): every user's gradient is taken
    # against the SAME weights, which is what fleet batching requires.
    # The fleet runs f32: measured (r5), bf16 does NOT help the fleet
    # (383.8 bf16 vs 389.5 f32 it/s at fleet_cost hbm_util 64% / mfu 9% — the
    # batched wave is occupancy-bound, not HBM-bound) and its conv
    # double-backward costs ~20 min of remote compile. The SOLO loop is
    # HBM-bound (solo_cost: ~88% HBM util) and bf16 wins there (+5.5%, equal
    # PSNR) — reported below as bf16_iters_per_sec / bf16_psnr.
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    payload_lists, shared_lists, truths = [], [], []
    for user_idx in range(FLEET):
        cfg.case.user.user_idx = user_idx
        user = breaching.cases.construct_user(model, server.loss, cfg.case, setup)
        shared, payloads, true_data = server.run_protocol(user)
        payload_lists.append(payloads)
        shared_lists.append(shared)
        truths.append(true_data)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    t0 = time.time()
    results, stats = attacker.reconstruct_fleet(payload_lists, shared_lists,
                                                server.secrets)
    fleet_wall = time.time() - t0
    fleet_rate, measured = _steady_rate(stats, streams=FLEET)

    psnrs = []
    for rec, true_data, payloads in zip(results, truths, payload_lists):
        metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                            cfg_case=cfg.case, setup=setup)
        psnrs.append(round(float(metrics["psnr"]), 2))

    # --- solo stream, f32 (the reference's exact per-experiment setting) ---
    cfg2 = breaching.get_config(overrides)
    setup2 = breaching.utils.system_startup(cfg=cfg2)
    user2, server2, _, _ = breaching.cases.construct_case(cfg2.case, setup2)
    attacker2 = breaching.attacks.prepare_attack(server2.model, server2.loss,
                                                 cfg2.attack, setup2)
    shared2, payloads2, true2 = server2.run_protocol(user2)
    rec2, stats2 = attacker2.reconstruct(payloads2, shared2, server2.secrets)
    solo_rate, _ = _steady_rate(stats2)
    metrics2 = breaching.analysis.report(rec2, true2, payloads2, server2.model,
                                         cfg_case=cfg2.case, setup=setup2)

    # --- solo stream, bf16 (the headline's dtype, PSNR parity check) ---
    cfg5 = breaching.get_config(overrides + ["attack.impl.dtype=bfloat16"])
    setup5 = breaching.utils.system_startup(cfg=cfg5)
    user5, server5, _, _ = breaching.cases.construct_case(cfg5.case, setup5)
    attacker5 = breaching.attacks.prepare_attack(server5.model, server5.loss,
                                                 cfg5.attack, setup5)
    shared5, payloads5, true5 = server5.run_protocol(user5)
    rec5, stats5 = attacker5.reconstruct(payloads5, shared5, server5.secrets)
    bf16_rate, _ = _steady_rate(stats5)
    metrics5 = breaching.analysis.report(rec5, true5, payloads5, server5.model,
                                         cfg_case=cfg5.case, setup=setup5)

    # --- MFU accounting (XLA cost model of the compiled chunks) ---
    import jax

    device_kind = jax.devices()[0].device_kind
    solo_mfu = _mfu_detail(attacker2.chunk_cost_analysis(), solo_rate, device_kind)
    fleet_mfu = _mfu_detail(attacker.chunk_cost_analysis(), fleet_rate / FLEET,
                            device_kind)

    # --- fused (Pallas) objective on the same flagship workload ---
    # same seed/protocol as the solo run; reports throughput delta + PSNR
    # parity so the kernel's end-to-end value is measured, not assumed
    cfg4 = breaching.get_config(
        overrides + ["attack.objective.type=fused-cosine-similarity"])
    setup4 = breaching.utils.system_startup(cfg=cfg4)
    user4, server4, _, _ = breaching.cases.construct_case(cfg4.case, setup4)
    attacker4 = breaching.attacks.prepare_attack(server4.model, server4.loss,
                                                 cfg4.attack, setup4)
    shared4, payloads4, true4 = server4.run_protocol(user4)
    rec4, stats4 = attacker4.reconstruct(payloads4, shared4, server4.secrets)
    fused_rate, _ = _steady_rate(stats4)
    metrics4 = breaching.analysis.report(rec4, true4, payloads4, server4.model,
                                         cfg_case=cfg4.case, setup=setup4)

    # --- small-model throughput (ConvNet CIFAR shapes) ---
    cfg3 = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "attack.optim.max_iterations=2000", "attack.optim.callback=500",
        "case.user.provide_labels=True", "seed=7", "name=bench_small",
    ])
    setup3 = breaching.utils.system_startup(cfg=cfg3)
    user3, server3, _, _ = breaching.cases.construct_case(cfg3.case, setup3)
    attacker3 = breaching.attacks.prepare_attack(server3.model, server3.loss,
                                                 cfg3.attack, setup3)
    shared3, payloads3, _ = server3.run_protocol(user3)
    _, stats3 = attacker3.reconstruct(payloads3, shared3, server3.secrets)
    small_rate, _ = _steady_rate(stats3)

    print(json.dumps({
        "metric": "attack_iters_per_sec_resnet18_imagenet",
        "value": round(fleet_rate, 2),
        "unit": "iters/s",
        "vs_baseline": round(fleet_rate / BASELINE_ITERS_PER_SEC, 2),
        "detail": {
            "fleet_size": FLEET,
            "fleet_dtype": "float32",
            "fleet_wall_s": round(fleet_wall, 2),
            "measured_iters_per_stream": measured,
            "psnr_at_bench_iters": round(float(metrics2["psnr"]), 2),
            "bench_iters": MEASURE_ITERS,
            "fleet_psnrs": psnrs,
            "fleet_psnr_mean": round(sum(psnrs) / len(psnrs), 2),
            "single_stream_iters_per_sec": round(solo_rate, 2),
            "single_stream_vs_baseline": round(solo_rate / BASELINE_ITERS_PER_SEC, 2),
            "bf16_iters_per_sec": round(bf16_rate, 2),
            "bf16_vs_baseline": round(bf16_rate / BASELINE_ITERS_PER_SEC, 2),
            "bf16_psnr": round(float(metrics5["psnr"]), 2),
            "convnet_cifar_iters_per_sec": round(small_rate, 1),
            "device_kind": device_kind,
            "solo_cost": solo_mfu,
            "fleet_cost": fleet_mfu,
            "fused_objective_iters_per_sec": round(fused_rate, 2),
            "fused_vs_plain_cosine": round(fused_rate / max(solo_rate, 1e-9), 3),
            "fused_psnr": round(float(metrics4["psnr"]), 2),
        },
    }))


if __name__ == "__main__":
    main()
