"""Multi-host (DCN-analog) smoke test: two OS processes, jax.distributed.

Exercises parallel/mesh.py:init_distributed — the stand-in for the
reference's Lightning rank plumbing (src/PLTrainer.py:424-442,
num_nodes/devices) — by launching two coordinated CPU processes and running
a cross-process psum (gloo collectives)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_NUM_PROCESSES"] = "2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, repo)
    from hyperpri_tpu.parallel.mesh import init_distributed
    assert init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2, jax.process_count()
    import jax.numpy as jnp
    x = jnp.ones((jax.local_device_count(),))
    y = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    print(f"RESULT {proc_id} {jax.process_count()} {float(y[0])}")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(180)
def test_two_process_init_and_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    # strip harness platform forcing (conftest's XLA_FLAGS virtual-device
    # count would give each process 8 local devices and psum=16)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith("JAX_") and k != "XLA_FLAGS"
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"RESULT {i} 2 2.0" in out, out


def test_init_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    from hyperpri_tpu.parallel.mesh import init_distributed

    assert init_distributed() is False
