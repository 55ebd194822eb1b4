"""Pallas TPU kernels for the decode hot paths."""

from .pallas_bp import bp_decode_pallas, build_bp_operators
from .pallas_gf2 import eliminate_pallas

__all__ = ["eliminate_pallas", "bp_decode_pallas", "build_bp_operators"]
