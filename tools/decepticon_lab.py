"""Offline Decepticon lab: simulate the FL exchange once, cache it, iterate.

The expensive half of a Decepticon experiment is the simulated exchange (full
GPT-2 forward/backward at 8x512 takes ~10 min on this 1-core host); the attack
itself is host-side and fast. This tool splits them:

  python tools/decepticon_lab.py simulate --name hf_gpt2_512 [overrides...]
  python tools/decepticon_lab.py attack   --name hf_gpt2_512 [overrides...]

`simulate` builds the case from the named example's overrides (see
examples/run_example.py) plus any extra CLI overrides, computes the user
update, and pickles (payload, shared_data, secrets, true_data) under
outputs/lab/. `attack` reloads the pickle, reruns only the attacker, and prints
stage-wise diagnostics against ground truth:

  - token multiset recall of the recovered token bag (strategy quality alone),
  - per-sentence multiset overlap after clustering (adds clustering errors),
  - positional accuracy (adds position-assignment errors).

This isolates which stage caps the headline accuracy (reference notebooks
report only the final number; analytic_attack.py has no such split).
"""

import argparse
import os
import pickle
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAB_DIR = os.path.join("outputs", "lab")


def _to_numpy(tree):
    import jax
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def _build_cfg(name, overrides):
    import breaching_tpu as breaching
    from examples.run_example import EXAMPLES

    base = list(EXAMPLES.get(name, []))
    return breaching.get_config(base + [f"name=lab_{name}", *overrides])


def simulate(args):
    import breaching_tpu as breaching

    cfg = _build_cfg(args.name, args.overrides)
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    breaching.utils.overview(server, user, None)
    payload = server.distribute_payload()
    t0 = time.time()
    shared, true_user_data = user.compute_local_updates(payload)
    print(f"user update computed in {time.time() - t0:.1f}s")
    os.makedirs(LAB_DIR, exist_ok=True)
    import numpy as np
    blob = dict(
        payload=_to_numpy(payload),
        shared=_to_numpy(shared),
        secrets=_to_numpy(server.secrets),
        true_data={k: np.asarray(v) if v is not None else None
                   for k, v in true_user_data.items()},
        overrides=list(args.overrides),
    )
    path = os.path.join(LAB_DIR, f"{args.name}.pkl")
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    print(f"cached exchange -> {path}")


def _multiset_recall(rec_bag, true_bag):
    overlap = sum(min(c, rec_bag[t]) for t, c in true_bag.items())
    return overlap / max(sum(true_bag.values()), 1)


def attack(args):
    import numpy as np

    import breaching_tpu as breaching

    cfg = _build_cfg(args.name, args.overrides)
    setup = breaching.utils.system_startup(cfg=cfg)
    with open(os.path.join(LAB_DIR, f"{args.name}.pkl"), "rb") as f:
        blob = pickle.load(f)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    payload, shared = blob["payload"], blob["shared"]
    true_data = blob["true_data"]

    t0 = time.time()
    rec, stats = attacker.reconstruct([payload], [shared], blob["secrets"],
                                      dryrun=cfg.dryrun)
    print(f"attack ran in {time.time() - t0:.1f}s")

    ref = np.asarray(true_data["data"])
    out = np.asarray(rec["data"])
    # stage 1: global token bag (order- and sentence-free)
    bag_recall = _multiset_recall(Counter(out.reshape(-1).tolist()),
                                  Counter(ref.reshape(-1).tolist()))
    from breaching_tpu.analysis.text_metrics import run_text_metrics

    metrics = run_text_metrics(dict(data=out.copy()), dict(data=ref),
                               [payload], model)
    print(f"STAGES: | token-bag recall: {bag_recall:.4f} "
          f"| per-sentence multiset: {metrics['token_acc']:.4f} "
          f"| positional acc: {metrics['accuracy']:.4f} "
          f"| BLEU: {100 * metrics['google_bleu']:.2f}")
    return bag_recall, metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["simulate", "attack"])
    ap.add_argument("--name", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    if args.mode == "simulate":
        simulate(args)
    else:
        attack(args)


if __name__ == "__main__":
    main()
