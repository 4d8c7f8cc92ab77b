from . import stateful, windows

__all__ = ["stateful", "windows"]
