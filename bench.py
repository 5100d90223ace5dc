"""Headline benchmark: attack iterations/sec, ResNet-18 ImageNet gradient inversion.

Replicates the reference's flagship setting (Inverting Gradients: cosine matching
+ TV + signed Adam on a ResNet-18 ImageNet gradient of one image; see
BASELINE.md) and measures steady-state attack throughput on the attached chip.

Baseline: the reference's benchmark runs ~100 trials x 24k iterations in "about a
day" on a GTX 2080 (reference README.md:82) -> ~27.8 attack iters/sec.

Prints exactly one JSON line.
"""

import json
import time

import breaching_tpu as breaching

BASELINE_ITERS_PER_SEC = 27.8
# first chunk absorbs compilation; the rest is the measured steady state.
# 2000 iterations keep tunnel/thermal noise under a few percent.
MEASURE_ITERS = 2100
CHUNK = 100


def main():
    import logging

    logging.disable(logging.INFO)
    cfg = breaching.get_config([
        "case=2_single_imagenet",
        "attack=invertinggradients",
        f"attack.optim.max_iterations={MEASURE_ITERS}",
        f"attack.optim.callback={CHUNK}",
        "attack.restarts.num_trials=1",
        "case.user.provide_labels=True",
        "seed=7",
        "name=bench",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)

    t0 = time.time()
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets, dryrun=False)
    total = time.time() - t0

    # steady state: skip the first chunk (compilation + warmup)
    iters = stats["chunk_iters"][1:]
    times = stats["chunk_time"][1:]
    value = sum(iters) / max(sum(times), 1e-9)

    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)

    # secondary: small-model throughput (ConvNet CIFAR shapes)
    cfg2 = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "attack.optim.max_iterations=2000", "attack.optim.callback=500",
        "case.user.provide_labels=True", "seed=7", "name=bench_small",
    ])
    setup2 = breaching.utils.system_startup(cfg=cfg2)
    user2, server2, model2, loss2 = breaching.cases.construct_case(cfg2.case, setup2)
    attacker2 = breaching.attacks.prepare_attack(server2.model, server2.loss, cfg2.attack, setup2)
    shared2, payloads2, _ = server2.run_protocol(user2)
    _, stats2 = attacker2.reconstruct(payloads2, shared2, server2.secrets, dryrun=False)
    small_value = sum(stats2["chunk_iters"][1:]) / max(sum(stats2["chunk_time"][1:]), 1e-9)

    print(json.dumps({
        "metric": "attack_iters_per_sec_resnet18_imagenet",
        "value": round(value, 2),
        "unit": "iters/s",
        "vs_baseline": round(value / BASELINE_ITERS_PER_SEC, 2),
        "detail": {
            "total_wall_s": round(total, 2),
            "measured_iters": sum(iters),
            "psnr_at_2100_iters": round(float(metrics["psnr"]), 2),
            "convnet_cifar_iters_per_sec": round(small_value, 1),
        },
    }))


if __name__ == "__main__":
    main()
