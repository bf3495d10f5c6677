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


# A real framework train step over a multi-process mesh: 2 processes x 2
# virtual CPU devices = a 4-device global (data=2, spatial=2) mesh, CubeNET-8
# with ZeRO-sharded Adam moments, one jitted step. This is the DCN-readiness
# path (SURVEY.md 5.8): GSPMD emits cross-process collectives (grad psum over
# 'data', conv halo exchange over 'spatial') through the gloo backend.
_TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    )
    os.environ["HYPERPRI_NO_COMPILE_CACHE"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, repo)
    import numpy as np
    from hyperpri_tpu.parallel.mesh import init_distributed, make_mesh
    assert init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2 and jax.device_count() == 4

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.train.trainer import Trainer, create_train_state

    mesh = make_mesh({"data": 2, "spatial": 2})
    cfg = ExpHyperspectralPRI(calling_path=".", split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.channels = 8
    cfg.cube_featmaps = 8
    cfg.zero_shard_opt = True
    cfg.precision = "bf16"
    cfg.mesh_shape = {"data": 2, "spatial": 2}

    image = np.random.default_rng(0).normal(size=(2, 64, 64, 8)).astype(np.float32)
    mask = (np.random.default_rng(1).uniform(size=(2, 64, 64, 1)) < 0.3).astype(
        np.float32
    )
    valid = np.ones((2,), np.float32)

    trainer = Trainer(cfg, mesh=mesh)
    state = create_train_state(cfg, trainer.model, image[:1], seed=0)
    state = trainer._place_state(state)
    trainer._compile_steps(state)
    sh = trainer._batch_shardings()
    batch = {"image": image, "mask": mask, "valid": valid}
    batch = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
    state, logs = trainer._train_step(state, batch)
    jax.block_until_ready(state.params)
    loss = float(logs["loss_sum"]) / float(logs["n"])
    assert np.isfinite(loss), loss
    print(f"TRAIN_RESULT {proc_id} {loss:.6f}")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# bounded internally by communicate(timeout=150); pytest-timeout is not installed
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


# bounded internally by communicate(timeout=400)
def test_two_process_mesh_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    port = _free_port()
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
    outs = [p.communicate(timeout=400)[0] for p in procs]
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        line = [l for l in out.splitlines() if l.startswith(f"TRAIN_RESULT {i} ")]
        assert line, out
        losses.append(float(line[0].split()[-1]))
    # the loss is a global reduction — every process must see the same value
    assert losses[0] == losses[1], losses


def test_init_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    from hyperpri_tpu.parallel.mesh import init_distributed

    assert init_distributed() is False
