"""Benchmark an attack over many users and average metrics
(reference: benchmark_breaches.py:22-119).

Usage:
    python benchmark_breaches.py case=1_single_image_small attack=invertinggradients num_trials=10

`fleet=N` batches N users per wave through `reconstruct_fleet` — one jitted
scan advances all N reconstructions in lockstep on-chip (the reference loops
users sequentially, reference benchmark_breaches.py:62-77; at batch 1 the MXU
is starved, so the wave is ~2.5x cheaper than N sequential attacks):
    python benchmark_breaches.py case=2_single_imagenet num_trials=16 fleet=8
"""

import datetime
import logging
import sys
import time

import breaching_tpu as breaching

log = logging.getLogger(__name__)


def main_process(process_idx, local_group_size, cfg):
    local_time = time.time()
    setup = breaching.utils.system_startup(process_idx, local_group_size, cfg)
    model, loss_fn = breaching.cases.construct_model(
        cfg.case.model, cfg.case.data, pretrained=cfg.case.server.pretrained,
        key=breaching.utils.split_key(setup))
    server = breaching.cases.construct_server(model, loss_fn, cfg.case, setup)
    model = server.vet_model(model)
    attacker = breaching.attacks.prepare_attack(model, loss_fn, cfg.attack, setup)

    if cfg.case.user.user_idx is not None:
        print("The argument user_idx is disregarded during the benchmark. Starting at user 0.")
    cfg.case.user.user_idx = -1

    fleet = max(int(cfg.get("fleet", 1) or 1), 1)
    if fleet > 1 and not getattr(attacker, "supports_fleet", False):
        # hasattr is not enough: subclasses inherit reconstruct_fleet but may
        # ignore the per-trial `extra` channel (permutation, joint, multiscale)
        # and would silently match the wrong users' gradients
        log.info(f"Attack {cfg.attack.attack_type} has no fleet mode; running sequentially.")
        fleet = 1

    overall_metrics = []
    run = 0
    while run < cfg.num_trials:
        # -- collect the next wave of valid users (wave size 1 = sequential) --
        wave, exhausted = [], False
        while len(wave) < min(fleet, cfg.num_trials - run):
            cfg.case.user.user_idx += 1
            try:
                user = breaching.cases.construct_user(model, loss_fn, cfg.case, setup)
            except ValueError:
                log.info("Cannot find other valid users. Finishing benchmark.")
                exhausted = True
                break
            if cfg.case.data.modality == "text":
                dshape = user.dataloader.dataset[0]["input_ids"].shape
                data_shape_mismatch = any(
                    d != d_ref for d, d_ref in zip(dshape, cfg.case.data.shape))
            else:
                data_shape_mismatch = False
            if len(user.dataloader.dataset) < user.num_data_points or data_shape_mismatch:
                log.info(f"Skipping user {user.user_idx} (too little data or shape mismatch).")
                continue
            wave.append(user)
        if not wave:
            break
        run += len(wave)
        local_run_time = time.time()
        log.info(f"Now evaluating users {[u.user_idx for u in wave]} "
                 f"(trials {run - len(wave) + 1}..{run}).")
        try:
            exchanges = [server.run_protocol(user) for user in wave]
            if len(wave) > 1:
                # batch the whole wave on-chip: one jitted scan advances every
                # user's reconstruction in lockstep (see bench.py for the
                # throughput rationale; per-user math identical to solo runs)
                reconstructions, stats = attacker.reconstruct_fleet(
                    [e[1] for e in exchanges], [e[0] for e in exchanges],
                    server.secrets, dryrun=cfg.dryrun)
            else:
                shared_user_data, payloads, _ = exchanges[0]
                reconstruction, stats = attacker.reconstruct(
                    payloads, shared_user_data, server.secrets, dryrun=cfg.dryrun)
                reconstructions = [reconstruction]
            wave_time = (time.time() - local_run_time) / len(wave)
            trials_per = max(len([k for k in stats if k.startswith("Trial_")])
                             // max(len(wave), 1), 1)
            for w, (user, (shared_user_data, payloads, true_user_data), reconstruction) \
                    in enumerate(zip(wave, exchanges, reconstructions)):
                try:
                    metrics = breaching.analysis.report(
                        reconstruction, true_user_data, payloads, server.model,
                        order_batch=True, compute_full_iip=True, cfg_case=cfg.case, setup=setup)
                    if len(wave) > 1:
                        # slice THIS user's trial traces out of the batched stats
                        user_stats = {k: v for k, v in stats.items()
                                      if not k.startswith("Trial_")}
                        for t in range(trials_per):
                            key = f"Trial_{w * trials_per + t}_Val"
                            if key in stats:
                                user_stats[f"Trial_{t}_Val"] = stats[key]
                    else:
                        user_stats = stats
                    row = dict(spent_time=wave_time, user_idx=user.user_idx, **{
                        k: v for k, v in metrics.items() if not isinstance(v, (list, dict, type(None)))})
                    overall_metrics.append(row)
                    breaching.utils.save_summary(cfg, metrics, user_stats, wave_time,
                                                 table_name="benchmark")
                    if cfg.save_reconstruction:
                        breaching.utils.save_reconstruction(
                            reconstruction, payloads, true_user_data, cfg)
                except Exception as e:  # noqa: BLE001 — keep the rest of the wave
                    log.info(f"Report for user {user.user_idx} failed with "
                             f"{type(e).__name__}: {e}. Continuing.")
            if cfg.dryrun:
                break
        except KeyboardInterrupt:
            # partial benchmark results on manual interrupt (the reference's
            # benchmark loop breaks and averages completed trials the same way)
            log.info(f"Benchmark interrupted manually during users "
                     f"{[u.user_idx for u in wave]}; averaging "
                     f"{len(overall_metrics)} completed trials.")
            break
        except Exception as e:  # noqa: BLE001 — continue the fleet on per-user failure
            # the failed trial(s) still consume their slots (the reference also
            # just logs and moves on) — retrying a persistently failing user
            # would loop until user exhaustion
            log.info(f"Trial on users {[u.user_idx for u in wave]} failed with "
                     f"{type(e).__name__}: {e}. Continuing.")
        if exhausted:
            break

    average_metrics = breaching.utils.avg_n_dicts(overall_metrics)
    log.info(f"Average benchmark metrics over {len(overall_metrics)} users: {average_metrics}")
    breaching.utils.save_to_table(
        "outputs/tables", f"BENCHMARK_breach_{cfg.case.name}_{cfg.attack.type}", cfg.dryrun,
        **average_metrics)
    log.info(f"Total benchmark time: {str(datetime.timedelta(seconds=time.time() - local_time))}")
    return average_metrics


def main_launcher():
    cfg = breaching.get_config(sys.argv[1:])
    log.info(f"--------Launching breaching-tpu benchmark {cfg.name}!--------")
    return main_process(0, 1, cfg)


if __name__ == "__main__":
    main_launcher()
