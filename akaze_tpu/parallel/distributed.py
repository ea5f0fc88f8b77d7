"""Multi-host bootstrap + mesh construction (SURVEY.md §5 comm-backend row).

Single-process multi-chip needs nothing; multi-HOST pods initialize the JAX
distributed runtime once per process, after which `jax.devices()` spans the
pod and the data/spatial meshes in parallel.mesh work unchanged (PJRT runs
the DCN coordination; collectives ride ICI within a slice).

Exercised for real in CI by tests/test_multiprocess.py: two
coordinator-connected CPU processes (4 virtual devices each, cross-process
collectives over Gloo) run the sharded BA on the 8-device global mesh, one
is SIGKILLed mid-run, and a respawned survivor re-initializes the runtime
and finishes from the checkpoint.  Single-host runs without coordinator
env vars take the no-op branch.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("akaze_tpu")

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed for multi-host runs; no-op single-host.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) / TPU metadata autodetection."""
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    explicit = coordinator_address is not None or os.environ.get("JAX_NUM_PROCESSES")
    if not explicit:
        logger.debug("single-host run: skipping jax.distributed.initialize")
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def global_mesh(data: int | None = None):
    """Mesh over ALL pod devices (call initialize() first on multi-host)."""
    from akaze_tpu.parallel.mesh import make_mesh

    return make_mesh(data, devices=jax.devices())
