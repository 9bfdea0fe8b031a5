"""Partial-order-alignment consensus engine (replaces `abpoa -M 5 -r 0
[-S]`, SDC.py:915-919).

Sequence-to-graph affine DP over topologically ordered node arrays with a
query band, incremental graph growth per read, and heaviest-bundle
consensus extraction. The DP inner loop is layout-compatible with the
batched Pallas kernel (poa/kernels.py); the numpy path is its oracle.
"""

from mandalorion_tpu.poa.consensus import determine_consensus  # noqa: F401
from mandalorion_tpu.poa.graph import PoaGraph, poa_consensus  # noqa: F401
