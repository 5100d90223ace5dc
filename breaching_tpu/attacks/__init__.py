"""Attack factory (reference: breaching/attacks/__init__.py:12-34)."""

from .optimization_based_attack import OptimizationBasedAttacker


def prepare_attack(model, loss, cfg_attack, setup):
    attack_type = cfg_attack.attack_type
    if attack_type == "optimization":
        return OptimizationBasedAttacker(model, loss, cfg_attack, setup)
    if attack_type == "multiscale":
        from .multiscale_optimization_attack import MultiScaleOptimizationAttacker

        return MultiScaleOptimizationAttacker(model, loss, cfg_attack, setup)
    if attack_type == "analytic":
        from .analytic_attack import AnalyticAttacker

        return AnalyticAttacker(model, loss, cfg_attack, setup)
    if attack_type == "april-analytic":
        from .analytic_attack import AprilAttacker

        return AprilAttacker(model, loss, cfg_attack, setup)
    if attack_type == "imprint-readout":
        from .analytic_attack import ImprintAttacker

        return ImprintAttacker(model, loss, cfg_attack, setup)
    if attack_type == "decepticon-readout":
        from .decepticon_attack import DecepticonAttacker

        return DecepticonAttacker(model, loss, cfg_attack, setup)
    if attack_type == "recursive":
        from .recursive_attack import RecursiveAttacker

        return RecursiveAttacker(model, loss, cfg_attack, setup)
    if attack_type == "joint-optimization":
        from .optimization_with_label_attack import OptimizationJointAttacker

        return OptimizationJointAttacker(model, loss, cfg_attack, setup)
    if attack_type == "permutation-optimization":
        from .optimization_permutation_attack import OptimizationPermutationAttacker

        return OptimizationPermutationAttacker(model, loss, cfg_attack, setup)
    raise ValueError(f"Invalid attack type {attack_type} given.")


__all__ = ["prepare_attack", "OptimizationBasedAttacker"]
