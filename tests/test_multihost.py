"""Multi-host smoke: two REAL processes, jax.distributed over a local
coordinator, a global 8-device mesh (4 per host), per-host batch slices, and
a cross-process reduction — validating the subsystem the reference never had
(SURVEY.md §2.3: DataParallel only, no distributed init anywhere)."""

import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vimoclip_tpu.parallel import MeshConfig, create_mesh, local_batch_slice

    assert jax.process_count() == 2
    mesh = create_mesh(MeshConfig(8, 1))
    GLOBAL = 16
    sl = local_batch_slice(GLOBAL)
    full = np.arange(GLOBAL * 4, dtype=np.float32).reshape(GLOBAL, 4)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), full[sl], full.shape)
    total = float(jax.jit(lambda a: jnp.sum(a))(arr))
    assert abs(total - float(full.sum())) < 1e-3, (total, full.sum())
    print(f"OK {pid} {sl.start}:{sl.stop} {total}")
""")


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    assert "OK 0 0:8" in outs[0]
    assert "OK 1 8:16" in outs[1]
