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
def test_two_process_dp_step(num_procs, tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    port = 29531
    ckpt = tmp_path / "dist_ckpt"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(num_procs), str(port),
             str(ckpt / f"rank{i}")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for i in range(num_procs)
    ]
    outs, fits = [], []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
        text = out.decode()
        lines = [ln for ln in text.splitlines() if ln.startswith("RESULT ")]
        assert lines, text[-500:]
        outs.append(lines[-1])
        flines = [ln for ln in text.splitlines()
                  if ln.startswith("FITRESULT ")]
        assert flines, text[-500:]
        fits.append(flines[-1])

    # identical loss / grad-norm / psum across processes => the
    # all-reduce really spanned both processes
    assert outs[0] == outs[1], outs
    # the reduction saw all 4 global devices (2 per process)
    assert outs[0].split()[-1] == "4.0", outs[0]

    # the PUBLIC fit() entrypoint ran multi-process: per-epoch losses,
    # early-stopping state and final params bit-identical across ranks
    assert fits[0] == fits[1], fits
    # only rank 0 wrote the best-model checkpoint
    assert (ckpt / "rank0" / "best_model").exists()
    assert not (ckpt / "rank1" / "best_model").exists()
