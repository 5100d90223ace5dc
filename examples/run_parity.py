"""Golden parity sweep: run every example setting at paper scale and harvest
metrics for PARITY.md (VERDICT round-1 item 10).

Runs each named setting from examples/run_example.py with --full (paper-scale
iteration counts), one at a time, dumping metrics to outputs/metrics_<name>.yaml
and a combined table to outputs/parity_table.tsv. Resumable: settings whose
metrics yaml already exists are skipped unless --force.

Usage: python examples/run_parity.py [name ...] [--force]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Ordered cheapest-first so a partial sweep still yields rows.
SWEEP = [
    # analytic / fast
    "sanity_check",
    "rgap",
    "robbing_the_fed",
    "curious_abandon_honesty",
    "april",
    # text / decepticon family
    "decepticons_transformer",
    "decepticons_gpt2",
    "decepticons_bert",
    "decepticons_hf_gpt2",
    "decepticons_hf_bert",
    "tag",
    "permutation",
    "robbing_the_fed_text",
    "curious_abandon_honesty_text",
    # optimization-based vision (paper-scale iteration counts)
    "deep_leakage",
    "beyond_inferring",
    "wei_framework",
    "legacy_hyperparams",
    "dlg_text",
    "inverting_gradients_resnet18",
    "modern_hyperparams",
    "inverting_gradients_fedavg",
    "inverting_gradients_fedavg_imagenet",
    "multiscale",
    "see_through_gradients",
    "fishing",
    "fishing_analytic_cross_silo",
    "fishing_feature_cross_device",
    "fishing_optimization_unique",
    "fishing_optimization_cross_silo",
    "inverting_large_batch_cifar",
]

TIMEOUT_S = {  # generous per-setting budgets (compile + run)
    "inverting_large_batch_cifar": 14400,
    "see_through_gradients": 10800,
    "inverting_gradients_resnet18": 5400,
    "modern_hyperparams": 5400,
    "inverting_gradients_fedavg": 7200,
    "inverting_gradients_fedavg_imagenet": 7200,
    "multiscale": 7200,
    "fishing": 5400,
    "fishing_optimization_unique": 7200,
    "fishing_optimization_cross_silo": 10800,
    "fishing_analytic_cross_silo": 5400,
    "fishing_feature_cross_device": 10800,
}
DEFAULT_TIMEOUT_S = 3600


def harvest(name):
    path = os.path.join("outputs", f"metrics_{name}.yaml")
    if not os.path.exists(path):
        return None
    import yaml

    with open(path) as fh:
        return yaml.safe_load(fh)


RESULTS_DIR = "results"  # git-tracked evidence (outputs/ is gitignored)


def publish(name):
    """Copy a setting's metrics yaml + log tail into the tracked results/ dir
    so every PARITY.md number is traceable to a committed artifact."""
    os.makedirs(os.path.join(RESULTS_DIR, "metrics"), exist_ok=True)
    os.makedirs(os.path.join(RESULTS_DIR, "logs"), exist_ok=True)
    src = os.path.join("outputs", f"metrics_{name}.yaml")
    if os.path.exists(src):
        import shutil

        shutil.copyfile(src, os.path.join(RESULTS_DIR, "metrics", f"{name}.yaml"))
    log_src = os.path.join("outputs", "parity", f"{name}.log")
    if os.path.exists(log_src):
        with open(log_src) as fh:
            tail = fh.readlines()[-80:]
        with open(os.path.join(RESULTS_DIR, "logs", f"{name}.log"), "w") as fh:
            fh.writelines(tail)


def write_committed_table():
    """Rebuild results/parity_table.tsv from the published per-setting yamls.

    The committed table must always agree with the committed artifacts in
    results/metrics/, including after a partial --force re-run of a single
    setting (a full in-process sweep is not required)."""
    import yaml

    mdir = os.path.join(RESULTS_DIR, "metrics")
    if not os.path.isdir(mdir):
        return
    names = [f[:-5] for f in sorted(os.listdir(mdir)) if f.endswith(".yaml")]
    order = {n: i for i, n in enumerate(SWEEP)}
    names.sort(key=lambda n: (order.get(n, len(SWEEP)), n))
    cols = ["psnr", "rpsnr", "lpips", "mse", "accuracy", "token_acc",
            "sacrebleu", "rougeL"]
    table = "name\t" + "\t".join(cols) + "\n"
    for name in names:
        with open(os.path.join(mdir, name + ".yaml")) as fh:
            m = yaml.safe_load(fh) or {}
        table += name + "\t" + "\t".join(
            f"{m.get(c):.4f}" if isinstance(m.get(c), float) else str(m.get(c, ""))
            for c in cols) + "\n"
    with open(os.path.join(RESULTS_DIR, "parity_table.tsv"), "w") as fh:
        fh.write(table)


def main():
    force = "--force" in sys.argv
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = wanted or SWEEP
    os.makedirs("outputs/parity", exist_ok=True)
    results = {}
    for name in names:
        existing = None if force else harvest(name)
        if existing is not None:
            print(f"[parity] {name}: cached", flush=True)
            results[name] = existing
            continue
        log_path = os.path.join("outputs", "parity", f"{name}.log")
        stale = os.path.join("outputs", f"metrics_{name}.yaml")
        if os.path.exists(stale):  # else a failed rerun would harvest old numbers
            os.remove(stale)
        budget = TIMEOUT_S.get(name, DEFAULT_TIMEOUT_S)
        print(f"[parity] {name}: running (budget {budget}s) -> {log_path}", flush=True)
        t0 = time.time()
        with open(log_path, "w") as fh:
            try:
                rc = subprocess.run(
                    [sys.executable, "examples/run_example.py", name, "--full"],
                    stdout=fh, stderr=subprocess.STDOUT, timeout=budget,
                ).returncode
            except subprocess.TimeoutExpired:
                rc = -1
        dt = time.time() - t0
        metrics = harvest(name)
        print(f"[parity] {name}: rc={rc} in {dt:.0f}s "
              f"psnr={None if not metrics else metrics.get('psnr')}", flush=True)
        if metrics is not None:
            metrics["_wall_s"] = round(dt, 1)
            results[name] = metrics
            publish(name)

    cols = ["psnr", "rpsnr", "lpips", "mse", "accuracy", "token_acc",
            "sacrebleu", "rougeL", "_wall_s"]
    table = "name\t" + "\t".join(cols) + "\n"
    for name, m in results.items():
        table += name + "\t" + "\t".join(
            f"{m.get(c):.4f}" if isinstance(m.get(c), float) else str(m.get(c, ""))
            for c in cols) + "\n"
    with open("outputs/parity_table.tsv", "w") as fh:
        fh.write(table)
    write_committed_table()
    print(json.dumps({k: {c: v.get(c) for c in ("psnr", "accuracy", "_wall_s")}
                      for k, v in results.items()}, default=str))


if __name__ == "__main__":
    main()
