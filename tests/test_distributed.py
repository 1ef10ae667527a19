"""Multi-process jax.distributed bring-up (VERDICT r1 #4).

Two real OS processes, each owning half of the virtual CPU devices,
initialize a cluster through ``dmel_tpu.parallel.mesh
.initialize_distributed``, build ONE global mesh, and drive a
data-parallel DMEL train step whose gradient all-reduce crosses the
process boundary.  Both processes must agree bit-for-bit on loss,
grad-norm, and a psum check — proving the collective ran globally.

On TPU hardware the identical code path initializes over DCN; only the
coordinator address changes (BASELINE.md 2-host target).
"""

import os
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("num_procs", [2])
def test_two_process_dp_step(num_procs):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    port = 29531
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(num_procs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for i in range(num_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
        lines = [ln for ln in out.decode().splitlines()
                 if ln.startswith("RESULT ")]
        assert lines, out.decode()[-500:]
        outs.append(lines[-1])

    # identical loss / grad-norm / psum across processes => the
    # all-reduce really spanned both processes
    assert outs[0] == outs[1], outs
    # the reduction saw all 4 global devices (2 per process)
    assert outs[0].split()[-1] == "4.0", outs[0]
