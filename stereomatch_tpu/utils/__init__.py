from . import numeric, validation

__all__ = ["numeric", "validation"]
