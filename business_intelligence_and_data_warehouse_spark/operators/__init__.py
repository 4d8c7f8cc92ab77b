from . import dedup, multimodal, scd, similarity

__all__ = ["dedup", "multimodal", "scd", "similarity"]
