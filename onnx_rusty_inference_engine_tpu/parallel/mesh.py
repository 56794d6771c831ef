"""Device mesh construction and multi-host initialization."""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up via jax.distributed (the TPU-native replacement for
    a NCCL/MPI transport — XLA then runs collectives over ICI/DCN).

    No-ops when running single-process (the common dev path)."""
    if num_processes is None:
        num_processes = int(os.environ.get("ORIET_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    axes: Dict[str, int],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a Mesh with named axes, e.g. {"data": 4, "model": 2}.

    Axis order matters for ICI locality: put the most communication-heavy
    axis ("model", which carries tensor-parallel all-gathers) innermost so
    its collectives ride adjacent ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(list(axes.values())))
    if n > len(devices):
        raise ValueError(f"mesh wants {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def local_mesh(model_parallel: int = 1) -> Mesh:
    """All visible devices: data-parallel outer, model-parallel inner."""
    n = len(jax.devices())
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    return make_mesh({"data": n // model_parallel, "model": model_parallel})
