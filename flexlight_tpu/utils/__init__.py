from . import mathlib

__all__ = ["mathlib"]
