from . import dims, facts, quality

__all__ = ["dims", "facts", "quality"]
