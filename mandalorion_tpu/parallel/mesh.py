"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("reads", "loci")) -> Mesh:
    """Build a mesh over the first n devices. With two axes the device
    count factors as (n // loci, loci) with loci the largest power of two
    <= sqrt(n); falls back to 1D when n is prime-ish or axes == 1."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = devices[:n]
    if len(axis_names) == 1 or n == 1:
        return Mesh(np.array(devices), axis_names[:1])
    loci = 1
    while loci * 2 <= int(np.sqrt(n)) and n % (loci * 2) == 0:
        loci *= 2
    if n % loci:
        loci = 1
    reads = n // loci
    if loci == 1:
        return Mesh(np.array(devices), axis_names[:1])
    grid = np.array(devices).reshape(reads, loci)
    return Mesh(grid, axis_names[:2])


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap for multi-host pods (no-op when args are
    absent and the environment provides them, e.g. on TPU VMs)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process run
