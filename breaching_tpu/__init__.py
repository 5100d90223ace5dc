"""breaching-tpu: a TPU-native (JAX/XLA/Pallas) framework for gradient-inversion
privacy attacks against federated learning.

Public API matches the reference framework (reference: breaching/__init__.py:16-37):
    get_config / get_attack_config / get_case_config — config composition,
    cases.construct_case — FL simulation assembly,
    attacks.prepare_attack — attack assembly,
    analysis.report — reconstruction-quality metrics.
"""

from . import utils
from .config.loader import compose, ConfigNode

__version__ = "0.1.0"


def get_config(overrides=None):
    """Compose the full framework configuration (case + attack + globals)."""
    return compose("cfg", overrides)


def get_attack_config(attack="invertinggradients", overrides=None):
    """Compose only an attack configuration."""
    cfg = compose("cfg", [f"attack={attack}", *(overrides or [])])
    return cfg.attack


def get_case_config(case="1_single_image_small", overrides=None):
    """Compose only a case configuration."""
    cfg = compose("cfg", [f"case={case}", *(overrides or [])])
    return cfg.case


# Subpackages are imported lazily-ish here to keep `import breaching_tpu` fast for
# config-only use, but eagerly enough for the reference-style `breaching.cases.*` access.
from . import cases  # noqa: E402
from . import attacks  # noqa: E402
from . import analysis  # noqa: E402

__all__ = [
    "get_config",
    "get_attack_config",
    "get_case_config",
    "cases",
    "attacks",
    "analysis",
    "utils",
    "compose",
    "ConfigNode",
]
