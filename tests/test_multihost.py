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


def test_process_slice_covers_dataset():
    from yolo_scratch_tpu.parallel.distributed import process_slice

    a = process_slice(10, process_id=0, num_processes=2)
    b = process_slice(10, process_id=1, num_processes=2)
    assert sorted(np.concatenate([a, b]).tolist()) == list(range(10))
    assert abs(len(a) - len(b)) <= 1


def _launch(port, pid, extra):
    return subprocess.Popen(
        [sys.executable, str(REPO / "tests/multihost_worker.py"), str(port), str(pid), "2",
         *extra],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=str(REPO),
    )


def _collect(procs):
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    rows = {}
    for out in outs:
        m = re.search(
            r"MHLOSS (\d+) ([-\d.enaif]+) ([-\d.enaif]+) start=(\d+) ran=(\d+)", out)
        assert m, out[-2000:]
        rows[int(m.group(1))] = (
            float(m.group(2)), float(m.group(3)), int(m.group(4)), int(m.group(5)))
    return rows


def test_multihost_checkpoint_resume(tmp_path):
    """Kill-and-relaunch recovery under jax.distributed: phase 1 trains
    epoch 0 and checkpoints (process-0-only writes of the replicated
    state); phase 2 relaunches BOTH processes, resumes from the shared
    checkpoint, and runs exactly the remaining epoch. Loss must stay
    replicated across processes in both phases and improve across the
    resume boundary (state continuity, not a fresh init).

    Phase 1 is ALSO the two-process agreement test (formerly a standalone
    test that re-launched the same worker pair — folded in to halve the
    suite's costliest fixture, 2 gloo pairs instead of 3): the allreduced
    loss AND the allgathered-eval mAP must be identical and finite on
    every process."""
    save = str(tmp_path / "mh_ckpt")

    port = _free_port()
    rows1 = _collect([_launch(port, pid, ["1", save]) for pid in range(2)])
    assert rows1[0] == rows1[1], rows1  # loss, mAP, start, ran all replicated
    loss1, map1, start1, ran1 = rows1[0]
    assert np.isfinite(loss1) and np.isfinite(map1)
    assert start1 == 0 and ran1 == 1

    port = _free_port()
    rows2 = _collect([_launch(port, pid, ["2", save]) for pid in range(2)])
    assert rows2[0] == rows2[1], rows2
    loss2, _, start2, ran2 = rows2[0]
    assert start2 == 1 and ran2 == 1  # resumed: only epoch 1 ran
    assert np.isfinite(loss2) and loss2 < loss1  # continued descent, not re-init
