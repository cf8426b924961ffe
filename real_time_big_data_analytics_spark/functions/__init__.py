from .numeric import round2
from .arrays import cosine_similarity, dot, l2_norm

__all__ = ["round2", "cosine_similarity", "dot", "l2_norm"]
