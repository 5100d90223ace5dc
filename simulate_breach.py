"""Run a single FL exchange and attack it (reference: simulate_breach.py).

Usage mirrors the hydra CLI of the reference:
    python simulate_breach.py case=1_single_image_small attack=invertinggradients dryrun=True
"""

import datetime
import logging
import sys
import time

import breaching_tpu as breaching

log = logging.getLogger(__name__)


def main_process(process_idx, local_group_size, cfg):
    """This function controls the central routine (reference: simulate_breach.py:22-58)."""
    total_time = time.time()
    setup = breaching.utils.system_startup(process_idx, local_group_size, cfg)

    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    breaching.utils.overview(server, user, attacker)

    if cfg.case.user.get("user_idx") is None:
        cfg.case.user.user_idx = 0

    n_extra = int(cfg.case.server.get("feature_estimation_users", 0) or 0)
    if n_extra:
        # cross-user feature-estimation fishing (reference notebook "Feature
        # Fishing Cross Device": the server first estimates the target class's
        # feature distribution on other users, then cuts the target user):
        # additional users own the next user_idx slots of the partition
        base_idx = int(cfg.case.user.user_idx)
        additional_users = []
        for idx in range(base_idx + 1, base_idx + 1 + n_extra):
            cfg.case.user.user_idx = idx
            additional_users.append(
                breaching.cases.construct_user(model, server.loss, cfg.case, setup))
        cfg.case.user.user_idx = base_idx
        shared_user_data, payloads, true_user_data = server.run_protocol(
            user, additional_users=additional_users)
    else:
        shared_user_data, payloads, true_user_data = server.run_protocol(user)
    reconstructed_user_data, stats = attacker.reconstruct(
        payloads, shared_user_data, server.secrets, dryrun=cfg.dryrun)

    metrics = breaching.analysis.report(
        reconstructed_user_data, true_user_data, payloads, server.model,
        order_batch=True, compute_full_iip=False, cfg_case=cfg.case, setup=setup)

    local_time = time.time() - total_time
    breaching.utils.save_summary(cfg, metrics, stats, local_time)
    breaching.utils.dump_metrics(cfg, metrics)
    if cfg.save_reconstruction:
        breaching.utils.save_reconstruction(reconstructed_user_data, payloads, true_user_data, cfg)
    return metrics


def main_launcher():
    cfg = breaching.get_config(sys.argv[1:])
    log.info("-------------------------------------------------------------")
    log.info(f"-------------Launching breaching-tpu run {cfg.name}! ---------")
    launch_time = time.time()
    metrics = main_process(0, 1, cfg)
    log.info(f"Finished computations with total train time: "
             f"{str(datetime.timedelta(seconds=time.time() - launch_time))}")
    return metrics


if __name__ == "__main__":
    main_launcher()
