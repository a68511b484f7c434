"""True multi-process jax.distributed smoke test on CPU.

Spawns two worker processes that form a process group through
``parallel.launch.initialize_distributed`` (the multi-host entry point of
the framework) and run a global psum across both hosts' devices — the
communication pattern of the DP learner's gradient all-reduce, exercised
without TPU hardware (SURVEY.md §4: distributed testing designed fresh;
the reference has no multi-process code at all).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.getcwd())
from alphazeroforhnefatafl_tpu.parallel.launch import (
    initialize_distributed,
    local_batch_slice,
)

coord, pid = sys.argv[1], int(sys.argv[2])
topo = initialize_distributed(coord, num_processes=2, process_id=pid)
assert topo.num_processes == 2, topo
assert topo.global_devices == 4, topo

import jax.numpy as jnp
x = jnp.ones((jax.local_device_count(),))
out = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
assert float(out[0]) == topo.global_devices, out

sl = local_batch_slice(8)
assert sl == slice(pid * 4, pid * 4 + 4), sl
print(f"WORKER{pid}_OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.getcwd(),
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=150)
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    for pid in range(2):
        assert f"WORKER{pid}_OK" in outs[pid], outs[pid]
