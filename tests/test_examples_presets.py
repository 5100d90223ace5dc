"""Every examples/run_example.py preset must compose against the config tree.

The loader's dotted overrides (config/loader.py:_set_dotted) create missing
keys silently — hydra's `+key=` semantics — so a typo in a preset would be a
dead override that never reaches the attack. This test composes each preset's
group swaps and then asserts every dotted override path already exists.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.run_example import EXAMPLES  # noqa: E402

import breaching_tpu as breaching  # noqa: E402
from breaching_tpu.config.loader import CONFIG_ROOT  # noqa: E402


def _split(overrides):
    """Mirror config.loader.compose's override classification."""
    group_swaps, dotted = [], []
    for ov in overrides:
        key = ov.partition("=")[0].strip()
        if "." not in key and (
            "/" in key or os.path.isdir(os.path.join(CONFIG_ROOT, key))
        ):
            group_swaps.append(ov)
        else:
            dotted.append(key)
    return group_swaps, dotted


# optional keys the data pipeline reads via cfg_data.get(...) — absent from
# the yamls by design, like the reference's `if "target_label" in cfg_data`
# (reference datasets_vision.py:120-133)
OPTIONAL_KEYS = {"case.data.target_label", "case.data.num_data_points"}


def test_all_presets_compose_and_dotted_keys_exist():
    problems = []
    for name, overrides in EXAMPLES.items():
        group_swaps, dotted = _split(overrides)
        cfg = breaching.get_config(group_swaps)
        for key in dotted:
            if key in OPTIONAL_KEYS:
                continue
            node = cfg
            for part in key.split("."):
                if part not in node:
                    problems.append(f"{name}: override key '{key}' missing at '{part}'")
                    break
                node = node[part]
    assert not problems, "\n".join(problems)


def test_presets_fully_compose_with_values():
    # the full composition (group swaps + dotted values) must not raise
    for name, overrides in EXAMPLES.items():
        cfg = breaching.get_config(list(overrides))
        assert cfg.attack is not None and cfg.case is not None, name
