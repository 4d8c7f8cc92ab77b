from . import scd

__all__ = ["scd"]
