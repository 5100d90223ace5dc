"""Probe fleet throughput at a given width/dtype without the full bench.

Usage: python tools/fleet_probe.py [FLEET] [dtype]
Prints one JSON line: aggregate it/s + per-stream PSNRs for the bench's
flagship workload (ResNet-18 ImageNet inversion, 2800 iters, seed 7).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import breaching_tpu as breaching

FLEET = int(sys.argv[1]) if len(sys.argv) > 1 else 16
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
MEASURE_ITERS = 2800
CHUNK = 700


def main():
    import logging

    logging.disable(logging.INFO)
    overrides = [
        "case=2_single_imagenet", "attack=invertinggradients",
        f"attack.optim.max_iterations={MEASURE_ITERS}",
        f"attack.optim.callback={CHUNK}",
        "attack.restarts.num_trials=1", "case.user.provide_labels=True",
        "seed=7", "name=fleetprobe",
    ]
    cfg = breaching.get_config(overrides)
    cfg.attack.impl.dtype = DTYPE
    setup = breaching.utils.system_startup(cfg=cfg)
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
    wall = time.time() - t0
    iters = stats["chunk_iters"][1:]
    times = stats["chunk_time"][1:]
    rate = FLEET * sum(iters) / max(sum(times), 1e-9)
    psnrs = []
    for rec, true_data, payloads in zip(results, truths, payload_lists):
        m = breaching.analysis.report(rec, true_data, payloads, server.model,
                                      cfg_case=cfg.case, setup=setup)
        psnrs.append(round(float(m["psnr"]), 2))
    print(json.dumps(dict(fleet=FLEET, dtype=DTYPE,
                          agg_iters_per_sec=round(rate, 2),
                          vs_baseline=round(rate / 27.8, 2),
                          wall_s=round(wall, 1),
                          psnr_mean=round(sum(psnrs) / len(psnrs), 2),
                          psnrs=psnrs)))


if __name__ == "__main__":
    main()
