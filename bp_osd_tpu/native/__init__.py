"""Native host kernels (C++ via ctypes)."""

from .build import load

__all__ = ["load"]
