"""Multi-host data parallelism: a real 2-process jax.distributed run on CPU.

Two subprocesses each expose 2 virtual CPU devices, initialize through a
local coordinator (the exact code path `--coordinator/--num_processes/
--process_id` triggers in the CLI), build the global 4-device mesh, feed
process-local batch shards via shard_batch, and run a jitted sharded
computation whose gradient all-reduce XLA inserts from the shardings.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from retinex_tpu.data.dataset import TrainLoader

_WORKER = r"""
import sys
process_id = int(sys.argv[1]); coordinator = sys.argv[2]

import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from retinex_tpu.config import Config
from retinex_tpu.parallel.distributed import initialize_distributed, local_batch_size
from retinex_tpu.parallel.mesh import create_mesh, replicate, shard_batch, shard_batch_sharding

config = Config(coordinator=coordinator, num_processes=2, process_id=process_id)
assert initialize_distributed(config)
assert jax.process_count() == 2 and jax.process_index() == process_id
assert jax.device_count() == 4 and jax.local_device_count() == 2

mesh = create_mesh()
assert mesh.devices.size == 4

# Global batch 8 -> local shard 4; values encode global sample ids.
import numpy as np
import jax.numpy as jnp
local = local_batch_size(8)
assert local == 4
ids = np.arange(8, dtype=np.float32)
my_ids = ids[process_id * local : (process_id + 1) * local]
batch = np.tile(my_ids[:, None], (1, 16))

garr = shard_batch(jnp.asarray(batch), mesh)
assert garr.shape == (8, 16)

@jax.jit
def step(b):
    # global-mean "loss" over the sharded batch: the reduction crosses hosts
    return jnp.mean(b * b)

out = float(step(garr))
want = float(np.mean(np.tile(ids[:, None], (1, 16)) ** 2))
assert abs(out - want) < 1e-5, (out, want)
print(f"OK process {process_id}: global mean {out:.4f}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_training_step(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # The worker imports retinex_tpu by path (running a /tmp script puts /tmp,
    # not the cwd, on sys.path) — prepend the repo root explicitly.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coordinator],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process {pid}" in out


def test_loader_sharding_disjoint_and_aligned(tmp_path):
    """Every process sees a disjoint subset; step counts agree across shards."""
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(11):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            d / f"im{i:02d}.png"
        )

    def epoch_ids(shard):
        from retinex_tpu.data.dataset import get_train_loader

        lo = get_train_loader(str(d), batch_size=2, image_size=8, shuffle=True,
                              drop_last=True, seed=3, shard=shard)
        it = iter(lo)
        batches = list(it)
        return len(lo), batches

    n0, b0 = epoch_ids((0, 2))
    n1, b1 = epoch_ids((1, 2))
    assert n0 == n1 == len(b0) == len(b1) == 2  # 11 imgs -> 5/shard -> 2 batches
    nfull, _ = epoch_ids((0, 1))
    assert nfull == 5


_PREEMPT_WORKER = r"""
import sys
process_id = int(sys.argv[1]); coordinator = sys.argv[2]

import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from retinex_tpu.config import Config
from retinex_tpu.parallel.distributed import initialize_distributed

config = Config(coordinator=coordinator, num_processes=2, process_id=process_id)
assert initialize_distributed(config)

# The trainer's preemption agreement (train/trainer.py): each batch, every
# host allgathers its local flag and stops iff ANY host saw a signal. Here
# only process 0 "receives the signal" at batch 3; both must break at the
# SAME batch (a lone host breaking would deadlock the others' next
# all-reduce).
import numpy as np
from jax.experimental import multihost_utils

stopped_at = None
for batch_idx in range(10):
    local_flag = process_id == 0 and batch_idx == 3
    stop = bool(multihost_utils.process_allgather(np.asarray(local_flag)).any())
    if stop:
        stopped_at = batch_idx
        break
assert stopped_at == 3, stopped_at
print(f"OK process {process_id}: agreed stop at batch {stopped_at}")
"""


def test_two_process_preemption_agreement(tmp_path):
    """All hosts take the preemption break at the same step even when the
    signal reaches only one host (the trainer's per-batch flag allgather)."""
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    script = tmp_path / "preempt_worker.py"
    script.write_text(_PREEMPT_WORKER)
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coordinator],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process {pid}: agreed stop at batch 3" in out
