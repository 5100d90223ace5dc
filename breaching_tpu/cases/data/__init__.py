"""Data pipeline: dataset construction + federated splits + loading.

Counterpart of reference breaching/cases/data/data_preparation.py:17-73.
"""

from .data_preparation import construct_dataloader

__all__ = ["construct_dataloader"]
