"""Multi-host DP: 2 real processes, 8 global CPU devices, one train step.

The TPU-native equivalent of a 2-node DDP test: each process owns 4
virtual devices and its own slice of the data; `jax.distributed` +
`make_array_from_process_local_data` assemble the global batch and the
jitted step's gradient psum crosses the process boundary (gloo standing in
for DCN). Both processes must report the identical finite loss.
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_trainer_agrees():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests/multihost_worker.py"), str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    losses, maps = {}, {}
    for out in outs:
        m = re.search(r"MHLOSS (\d+) ([-\d.enaif]+) ([-\d.enaif]+)", out)
        assert m, out[-2000:]
        losses[int(m.group(1))] = float(m.group(2))
        maps[int(m.group(1))] = float(m.group(3))
    assert set(losses) == {0, 1}
    assert np.isfinite(losses[0])
    # replicated outputs: the allreduced loss and the allgathered-eval mAP
    # must be identical on every process
    assert losses[0] == losses[1], losses
    assert maps[0] == maps[1], maps


def test_process_slice_covers_dataset():
    from yolo_scratch_tpu.parallel.distributed import process_slice

    a = process_slice(10, process_id=0, num_processes=2)
    b = process_slice(10, process_id=1, num_processes=2)
    assert sorted(np.concatenate([a, b]).tolist()) == list(range(10))
    assert abs(len(a) - len(b)) <= 1
