"""benchmark_breaches fleet mode: waves of users batched through
reconstruct_fleet produce the same per-user metrics schema as sequential."""

import sys

import breaching_tpu as breaching
import benchmark_breaches


def _run(overrides):
    cfg = breaching.get_config(overrides)
    return benchmark_breaches.main_process(0, 1, cfg)


BASE = [
    "case=1_single_image_small", "attack=invertinggradients",
    "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
    "case.user.provide_labels=True", "case.user.num_data_points=1",
    "attack.optim.max_iterations=120", "attack.optim.callback=60",
    "num_trials=4", "save_reconstruction=False", "name=benchfleettest",
]


def test_benchmark_fleet_wave(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.syspath_prepend(str(tmp_path))
    avg = _run(BASE + ["fleet=2", "seed=3"])
    assert avg["psnr"] > 10  # ConvNetSmall16 single images invert easily
    assert avg["label_acc"] == 1.0


def test_benchmark_fleet_falls_back_for_analytic(tmp_path, monkeypatch, caplog):
    monkeypatch.chdir(tmp_path)
    avg = _run([
        "case=0_sanity_check", "attack=analytic", "num_trials=2", "fleet=4",
        "name=benchfleetana", "case.user.provide_labels=True",
    ])
    assert avg["psnr"] > 50  # analytic inversion is exact on the sanity case
