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


_TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vimoclip_tpu import losses
    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.data import (
        BatchLoader, EmbeddingWriter, PairedEmbeddingDataset, collate_pad,
    )
    from vimoclip_tpu.models import TFAM
    from vimoclip_tpu.parallel import (
        MeshConfig, TFAM_PARTITION_RULES, commit_replicated, create_mesh,
        local_batch_slice, shard_params,
    )
    from vimoclip_tpu.train.state import TrainState, make_adamw

    D, C, T, GLOBAL = 32, 6, 8, 16
    mesh = create_mesh(MeshConfig(4, 2))  # 4x2 global, tp spans hosts
    sl = local_batch_slice(GLOBAL)

    # --- per-host HDF5 shard: this host only materialises ITS videos, but
    # the content is derived from the GLOBAL corpus seed, so the two shards
    # tile one deterministic dataset (parallel/mesh.py:80-91 semantics) ---
    rng = np.random.default_rng(0)
    rgb_all = rng.normal(size=(GLOBAL, T, D)).astype(np.float32)
    mot_all = rng.normal(size=(GLOBAL, T - 1, D)).astype(np.float32)
    lab_all = np.zeros((GLOBAL, C), np.float32)
    lab_all[np.arange(GLOBAL), np.arange(GLOBAL) % C] = 1.0
    rgb_h5 = f"{workdir}/rgb_{pid}.h5"
    mot_h5 = f"{workdir}/mot_{pid}.h5"
    with EmbeddingWriter(rgb_h5, num_classes=C, embed_dim=D) as wr, \\
         EmbeddingWriter(mot_h5, embed_dim=D) as wm:
        for i in range(sl.start, sl.stop):
            wr.write_video(f"v{i:02d}.mp4", rgb_all[i], labels=lab_all[i])
            wm.write_video(f"v{i:02d}", mot_all[i])

    ds = PairedEmbeddingDataset(rgb_h5, mot_h5)
    loader = BatchLoader(
        ds, GLOBAL // 2, lambda it: collate_pad(it, bucket=T), shuffle=False,
        drop_last=True, num_workers=1,
    )
    (local,) = list(loader)

    # --- identical model init on both hosts (same seed), tp-sharded ---
    model = TFAM(
        config=TFAMModelConfig(d_model=D, nhead=4, num_layers=1,
                               dim_feedforward=64, dropout=0.0,
                               mlp_dropout=0.0),
        num_classes=C,
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, T, D)), jnp.zeros((1, T - 1, D)),
        jnp.ones((1, T), bool), jnp.ones((1, T - 1), bool),
    )["params"]
    params = shard_params(params, TFAM_PARTITION_RULES, mesh)
    state = commit_replicated(
        TrainState.create(params, make_adamw(1e-3, weight_decay=0.1)), mesh)

    def to_global(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), x, (GLOBAL,) + x.shape[1:])

    batch = {k: to_global(v) for k, v in local.items() if k != "video_id"}

    @jax.jit
    def train_step(state, batch):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, batch["embeddings"], batch["motion_embeddings"],
                batch["mask_rgb"], batch["mask_motion"], deterministic=True)
            return losses.bce_with_logits(logits, batch["labels"])
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    state, loss = train_step(state, batch)

    # --- post-step params must be IDENTICAL on both hosts: fully-replicated
    # jit reduction over the sharded tree gives each process the global value
    @jax.jit
    def checksum(tree):
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                   for l in jax.tree.leaves(tree))

    print(f"TRAINOK {pid} loss={float(loss):.10f} "
          f"sum={float(checksum(state.params)):.12f}", flush=True)
""")


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    """Round-1 VERDICT next #9: the multi-host data path proven with the
    ACTUAL trainer ingredients — per-host HDF5 shards -> BatchLoader ->
    global (data, model) mesh -> one jit'ed TFAM train step — ending with
    bit-identical parameters on both hosts."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    lines = [next(l for l in o.splitlines() if l.startswith("TRAINOK")) for o in outs]
    loss0, sum0 = lines[0].split("loss=")[1].split(" sum=")
    loss1, sum1 = lines[1].split("loss=")[1].split(" sum=")
    assert loss0 == loss1, (lines[0], lines[1])  # same global loss
    assert sum0 == sum1, (lines[0], lines[1])  # identical params post-step
    assert float(loss0) > 0 and float(sum0) > 0


_FLASH_WORKER = textwrap.dedent("""
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
    from vimoclip_tpu.ops.pallas import flash_attention

    mesh = create_mesh(MeshConfig(8, 1))
    B, H, T, D = 8, 2, 128, 32
    rng = np.random.default_rng(7)
    q, k, v = (rng.standard_normal((B, H, T, D)).astype(np.float32)
               for _ in range(3))
    # full unsharded reference computed locally on this process
    ref = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))

    sl = local_batch_slice(B)
    sh = NamedSharding(mesh, P("data", None, None, None))
    mk = lambda a: jax.make_array_from_process_local_data(sh, a[sl], a.shape)
    out = jax.jit(
        lambda a, b, c: flash_attention(a, b, c, interpret=True)
    )(mk(q), mk(k), mk(v))
    # every addressable shard of the global result must equal the local
    # reference's corresponding slice — custom_partitioning ran the kernel
    # per-shard across two real processes
    for s in out.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), ref[s.index])
    print(f"OK {pid} shards={len(out.addressable_shards)}")
""")


@pytest.mark.slow
def test_two_process_flash_attention_parity(tmp_path):
    """The Pallas flash kernel under a TWO-PROCESS global mesh: the
    custom_partitioning path must produce bit-identical results to the
    unsharded computation with real cross-process SPMD (the pattern a
    multi-host TPU pod runs)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "flash_worker.py"
    worker.write_text(_FLASH_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        assert "OK" in out
