from .matching import fused_cosine_similarity, fused_euclidean
from .image import fused_total_variation, box_project

__all__ = [
    "fused_cosine_similarity",
    "fused_euclidean",
    "fused_total_variation",
    "box_project",
]
