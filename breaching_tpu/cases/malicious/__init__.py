from .imprint import (
    CuriousAbandonHonesty,
    ImprintBlock,
    OneShotBlock,
    OneShotBlockSparse,
    SparseImprintBlock,
)

__all__ = [
    "ImprintBlock",
    "SparseImprintBlock",
    "OneShotBlock",
    "OneShotBlockSparse",
    "CuriousAbandonHonesty",
]
