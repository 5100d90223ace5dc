"""Probe: solo-stream it/s for objective variants (VERDICT r2 #4).

Measures the steady-state single-stream rate of the flagship ResNet-18
ImageNet inversion for: the default cosine-similarity objective, and the
Pallas fused-cosine objective. One JSON line per variant.

Run on the real TPU:  python examples/bench_objective_probe.py [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import breaching_tpu as breaching


def run_variant(name, extra_overrides, iters=600, chunk=100):
    overrides = [
        "case=2_single_imagenet",
        "attack=invertinggradients",
        f"attack.optim.max_iterations={iters}",
        f"attack.optim.callback={chunk}",
        "attack.restarts.num_trials=1",
        "case.user.provide_labels=True",
        "seed=7",
        "name=objprobe",
        *extra_overrides,
    ]
    cfg = breaching.get_config(overrides)
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    t0 = time.time()
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    wall = time.time() - t0
    iters_done = stats["chunk_iters"][1:]
    times = stats["chunk_time"][1:]
    rate = sum(iters_done) / max(sum(times), 1e-9)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    print(json.dumps({"variant": name, "iters_per_sec": round(rate, 2),
                      "psnr": round(float(metrics["psnr"]), 2),
                      "wall_s": round(wall, 1)}), flush=True)
    return rate


def main():
    import logging

    logging.disable(logging.INFO)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    run_variant("cosine-similarity", [], iters=iters)
    run_variant("fused-cosine-similarity",
                ["attack.objective.type=fused-cosine-similarity"], iters=iters)


if __name__ == "__main__":
    main()
