"""Multi-host (multi-process) data parallelism over DCN.

The reference is single-device (SURVEY.md §2c); this is the scale-out entry:
each host runs the same training CLI with `--coordinator host:port
--num_processes N --process_id i`, `jax.distributed.initialize` wires the
processes together, the mesh spans all global devices (gradient all-reduce
rides ICI within a slice and DCN across slices, inserted by XLA from the
shardings), and each process feeds only its own shard of every global batch
via `jax.make_array_from_process_local_data`.

Single-host behavior is unchanged: with no --coordinator nothing here runs.

Manual recipe (2 hosts):
    host0$ retinex-tpu --mode train ... --coordinator host0:1234 \
               --num_processes 2 --process_id 0
    host1$ retinex-tpu --mode train ... --coordinator host0:1234 \
               --num_processes 2 --process_id 1

A 2-process CPU integration test lives in tests/test_multihost.py.
"""

from __future__ import annotations

import jax


def initialize_distributed(config) -> bool:
    """Call jax.distributed.initialize from Config fields; returns True when
    multi-process mode was requested (and initialized). Must run before any
    other jax API touches the backend."""
    if not getattr(config, "coordinator", None):
        return False
    if config.num_processes is None or config.process_id is None:
        raise ValueError("--coordinator requires --num_processes and --process_id")
    jax.distributed.initialize(
        coordinator_address=config.coordinator,
        num_processes=config.num_processes,
        process_id=config.process_id,
    )
    return True


def process_shard() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) single-host."""
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch_size: int) -> int:
    """Per-process share of the global batch (every process must contribute
    the same local size, so the global batch must divide evenly)."""
    count = jax.process_count()
    if global_batch_size % count:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"{count} processes"
        )
    return global_batch_size // count
