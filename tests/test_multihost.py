"""Multi-host validation: a REAL 2-process jax.distributed run.

Everything else in the suite exercises sharding on a single-process
virtual mesh; this test spawns two actual processes (1 "host" each,
4 virtual CPU devices, gloo collectives) joined by
``jax.distributed.initialize``, and runs the production sharded Wan
train step over the resulting GLOBAL dp2/fsdp2/tp2 mesh with
per-process input shards — the exact recipe DEPLOYMENT.md prescribes
for v5e pods (dp on the cross-host axis). The reference never runs
multi-node at all (SURVEY §4 "Multi-node is never tested").
"""

import os
import re
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step():
    port = _free_port()
    env = dict(os.environ)
    # clean CPU-only interpreters (the axon sitecustomize would
    # otherwise register the TPU plugin; same scrub as __graft_entry__)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"

    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_LOSS=([0-9.]+)", out)
        assert m, out
        losses.append(float(m.group(1)))
    # both processes fetched the identical replicated loss
    assert losses[0] == losses[1], losses
    # and saw the global 8-device topology
    assert all("local=4 global=8" in out for out in outs), outs
    # pp-across-DCN leg: stages mapped one per process (the GPipe
    # ppermutes are the only cross-process traffic in the block sweep)
    pp_losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_PP_LOSS=([0-9.]+)", out)
        assert m, out
        pp_losses.append(float(m.group(1)))
    assert pp_losses[0] == pp_losses[1], pp_losses
