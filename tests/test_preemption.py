"""Preemption-aware training: SIGTERM mid-run checkpoints `latest` and exits
cleanly; --resume continues from it (SURVEY §5 — the reference has no
preemption handling)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def train_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)).save(
            d / f"im{i}.png"
        )
    return d


def _train_cmd(train_dir, save_dir, resume=None):
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys\n"
        f"sys.argv=['main.py','--mode','train','--train_dir',{str(train_dir)!r},"
        f"'--save_dir',{str(save_dir)!r},'--num_epochs','500','--batch_size','2',"
        "'--image_size','32','--no-use_perceptual_loss','--no-progress_bar'"
        + (f",'--resume',{resume!r}" if resume else "")
        + "]\n"
        "from retinex_tpu.cli import main; main()\n"
    )
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # PREPEND (never replace) PYTHONPATH — the axon plugin loads from it
    # (repo CLAUDE.md environment rule).
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # single device is fine here
    return [sys.executable, "-c", code], env


def _line_reader(proc):
    """ONE pump thread per process feeding one queue; returns a read_until
    callable. (Spawning a pump per read — the original shape — left the
    first, abandoned pump racing the second for proc.stdout lines, so the
    preemption banner could vanish into the dead queue. A plain
    `for line in proc.stdout` would instead hang the suite if the child
    goes silent without exiting.)"""
    import queue
    import threading

    q: queue.Queue = queue.Queue()

    def pump():
        for line in proc.stdout:
            q.put(line)
        q.put(None)

    threading.Thread(target=pump, daemon=True).start()

    def read_until(predicate, timeout_s):
        lines = []
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            try:
                line = q.get(timeout=5)
            except queue.Empty:
                continue
            if line is None:
                return lines, False
            lines.append(line)
            if predicate(line):
                return lines, True
        return lines, False

    return read_until


def test_sigterm_checkpoints_and_exits(train_dir, tmp_path):
    save_dir = tmp_path / "ckpt"
    cmd, env = _train_cmd(train_dir, save_dir)
    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )
    # Wait for the first epoch to complete (its checkpoint proves the loop is
    # past compilation), then preempt.
    read_until = _line_reader(proc)
    lines, saw_epoch = read_until(lambda l: l.startswith("Epoch 0:"), 600)
    if not saw_epoch:
        proc.kill()
        pytest.fail("training never reached epoch 0:\n" + "".join(lines))
    proc.send_signal(signal.SIGTERM)
    more, _ = read_until(lambda l: False, 300)
    out = "".join(more)
    ret = proc.wait(timeout=300)
    assert ret == 0, f"exit {ret}\n{''.join(lines)}{out}"
    assert "checkpointing and exiting" in out or "Preemption checkpoint" in out, out
    assert (save_dir / "latest").exists()

    # Resume from the preemption checkpoint: must start and save again.
    cmd2, env2 = _train_cmd(train_dir, save_dir, resume=str(save_dir / "latest"))
    proc2 = subprocess.Popen(
        cmd2, env=env2, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )
    read_until2 = _line_reader(proc2)
    lines2, saw_resume = read_until2(lambda l: l.startswith("Resumed from"), 600)
    if not saw_resume:
        proc2.kill()
        pytest.fail("resume run never printed 'Resumed from':\n" + "".join(lines2))
    proc2.send_signal(signal.SIGTERM)
    more2, _ = read_until2(lambda l: False, 300)
    out2 = "".join(more2)
    ret2 = proc2.wait(timeout=300)
    assert ret2 == 0, f"exit {ret2}\n{''.join(lines2)}{out2}"
    assert any(line.startswith("Resumed from") for line in lines2), "".join(lines2)
