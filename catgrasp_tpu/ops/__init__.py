"""Pallas TPU kernels for the framework's hot ops.

These are the speed-of-light paths for the operations the reference spends
its CPU/GPU time on (``my_cpp/common.cpp``, ``meshpy/sdf.py:345``); every
kernel has an XLA reference implementation elsewhere in the package that the
tests cross-check against.
"""
from . import collision  # noqa: F401
