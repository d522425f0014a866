"""Multi-host data parallelism (parallel/multihost.py).

The reference vendors a DistributedSampler it never uses
(modal/lib/utils/data/distributed.py); here per-process dataset
partitioning + global-batch assembly are live. Unit tests pin the
partition semantics and the single-process degradation; the integration
test launches TWO real JAX processes (gloo CPU collectives) that form one
global 4-device mesh and assemble per-process batches into one global
sharded array.
"""

import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from sln_amodal_tpu.parallel import multihost
from sln_amodal_tpu.parallel.mesh import make_mesh, shard_batch


# ------------------------------------------------------- partition_ids

def test_partition_even_split_is_disjoint_cover():
    ids = np.arange(12)
    shards = [multihost.partition_ids(ids, i, 4) for i in range(4)]
    assert all(len(s) == 3 for s in shards)
    assert sorted(np.concatenate(shards).tolist()) == list(range(12))


def test_partition_wraps_like_distributed_sampler():
    # N=10, P=4 -> per=3, total=12: pad by wrapping ids[:2] to the front
    # (reference modal/lib/utils/data/distributed.py:44-50)
    ids = np.arange(10)
    shards = [multihost.partition_ids(ids, i, 4) for i in range(4)]
    assert all(len(s) == 3 for s in shards)
    flat = np.concatenate(shards)
    assert flat.tolist() == list(range(10)) + [0, 1]


def test_partition_single_process_is_identity():
    ids = np.arange(7)
    np.testing.assert_array_equal(multihost.partition_ids(ids, 0, 1), ids)


def test_partition_rejects_bad_rank():
    with pytest.raises(ValueError):
        multihost.partition_ids(np.arange(4), 2, 2)


def test_initialize_single_process_is_noop():
    multihost.initialize(num_processes=1)  # must not touch jax.distributed
    multihost.initialize(num_processes=None)


# ------------------------------------- single-process global_batch == put

def test_global_batch_matches_shard_batch_single_process():
    mesh = make_mesh()
    batch = {
        "images": np.random.default_rng(0).normal(
            size=(8, 4, 4, 3)).astype(np.float32),
        "ids": np.arange(8, dtype=np.int32),
    }
    g = multihost.global_batch(batch, mesh)
    s = shard_batch(batch, mesh)
    for k in batch:
        assert g[k].sharding == s[k].sharding
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(s[k]))


# ----------------------------------------------- loader partition wiring

def test_train_loader_partitions_ids(tmp_path):
    from tests.fixtures import make_synthetic_dataset
    from sln_amodal_tpu.config import training_config
    from sln_amodal_tpu.data.dataset import AmodalDataset
    from sln_amodal_tpu.data.pipeline import TrainLoader

    make_synthetic_dataset(str(tmp_path), n_images=5, size=32, subset="train")
    ds = AmodalDataset()
    ds.load_amodal(str(tmp_path), "train", data_type="COCO")
    ds.prepare()
    cfg = training_config(image_size=32, batch_size=1)

    l0 = TrainLoader(ds, cfg, process_index=0, process_count=2, workers=1)
    l1 = TrainLoader(ds, cfg, process_index=1, process_count=2, workers=1)
    assert len(l0.local_ids) == len(l1.local_ids) == 3  # ceil(5/2), wrapped
    union = set(l0.local_ids.tolist()) | set(l1.local_ids.tolist())
    assert union == set(ds.image_ids.tolist())
    # default (single process) keeps the full dataset
    assert len(TrainLoader(ds, cfg, workers=1).local_ids) == 5


# ------------------------------------------------ real 2-process launch

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, {repo!r})
    from sln_amodal_tpu.parallel import multihost
    from sln_amodal_tpu.parallel.mesh import make_mesh, batch_sharding

    pid = int(sys.argv[1])
    multihost.initialize("localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    # each process owns a disjoint slice of the "dataset"
    ids = multihost.partition_ids(np.arange(8))
    assert ids.tolist() == ([0, 1, 2, 3] if pid == 0 else [4, 5, 6, 7])

    # local batch (2 rows/process) -> global [4]-row sharded array
    local = {{"x": (100.0 * pid + np.arange(2 * 3, dtype=np.float32)
                   ).reshape(2, 3)}}
    g = multihost.global_batch(local, make_mesh())
    assert g["x"].shape == (4, 3)
    from jax.sharding import NamedSharding, PartitionSpec as P
    total = jax.jit(lambda b: b["x"].sum(),
                    out_shardings=NamedSharding(make_mesh(), P()))(g)
    # sum over both processes' rows: (0+..+5) + (100+..+105) = 15 + 615
    np.testing.assert_allclose(float(total), 630.0)
    print("WORKER_OK", pid)
""")


def _free_port():
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_processes(tmp_path, worker_src):
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
    return outs


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = _run_two_processes(
        tmp_path, _WORKER.format(repo=repo, port=_free_port()))
    for i, out in enumerate(outs):
        assert f"WORKER_OK {i}" in out


_TRAIN_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, {repo!r})
    from sln_amodal_tpu.parallel import multihost
    from sln_amodal_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicate)
    from sln_amodal_tpu.models.sln import SLNAmodal, init_params
    from sln_amodal_tpu.train.optim import make_optimizer
    from sln_amodal_tpu.train.trainer import TrainState, make_train_step
    from tests.test_dp_scaling import fixed_batch, tiny_config

    pid = int(sys.argv[1])
    multihost.initialize("localhost:{port}", num_processes=2, process_id=pid)
    assert len(jax.devices()) == 4

    cfg = tiny_config()
    model = SLNAmodal(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0))  # same on both hosts
    tx = make_optimizer(variables, "heads", cfg.learning_rate)
    state = TrainState(variables, tx.init(variables),
                       jnp.zeros((), jnp.int32))
    mesh = make_mesh()
    jit_step = jax.jit(
        make_train_step(model, cfg, tx),
        in_shardings=(replicate(mesh), replicate(mesh),
                      batch_sharding(mesh)),
        out_shardings=(replicate(mesh), replicate(mesh)),
    )
    # each process contributes its two rows of the SAME global batch the
    # single-process oracle uses
    local = {{k: v[pid * 2 : (pid + 1) * 2] for k, v in
             fixed_batch(cfg).items()}}
    batch = multihost.global_batch(local, mesh)
    state, losses = jit_step(state, jax.random.PRNGKey(7), batch)
    print("LOSSES", json.dumps({{k: float(v) for k, v in losses.items()}}))
""")


_DEVPREP_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, os.path.join({repo!r}, "tests"))
    from sln_amodal_tpu.parallel import multihost
    from sln_amodal_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicate)
    from sln_amodal_tpu.config import Config
    from sln_amodal_tpu.data.dataset import AmodalDataset
    from sln_amodal_tpu.data.device_prep import DevicePrepLoader

    pid = int(sys.argv[1])
    multihost.initialize("localhost:{port}", num_processes=2, process_id=pid)
    assert len(jax.devices()) == 4

    ds = AmodalDataset()
    ds.load_amodal({root!r}, "train")
    ds.prepare()
    cfg = Config(image_size=64, batch_size=2, name="devprep-mh",
                 glm_input_size=33, pre_nms_limit=128,
                 post_nms_rois_training=16, train_rois_per_image=8,
                 max_gt_instances=4, compute_dtype="float32")
    mesh = make_mesh()

    # per-process dataset shards feed the ONE SPMD prep program
    loader = DevicePrepLoader(ds, cfg, seed=0, augment=False, workers=1,
                              mesh=mesh)
    assert len(loader.local_ids) == 2  # 4 images over 2 processes
    batch = next(iter(loader))
    # prepared batch is GLOBAL: 2 local rows/process -> 4 global rows
    assert batch["images"].shape[0] == 4
    assert not batch["images"].is_fully_addressable
    local_rows = sum(
        s.data.shape[0] for s in batch["images"].addressable_shards)
    assert local_rows == 2
    assert np.isfinite(np.asarray(
        [s.data.sum() for s in batch["images"].addressable_shards])).all()

    # and it feeds the sharded train step directly (no resharding)
    from sln_amodal_tpu.models.sln import SLNAmodal, init_params
    from sln_amodal_tpu.train.optim import make_optimizer
    from sln_amodal_tpu.train.trainer import TrainState, make_train_step
    variables = init_params(cfg, jax.random.PRNGKey(0))
    model = SLNAmodal(cfg)
    tx = make_optimizer(variables, "heads", cfg.learning_rate)
    state = TrainState(variables, tx.init(variables),
                       jnp.zeros((), jnp.int32))
    jit_step = jax.jit(
        make_train_step(model, cfg, tx),
        in_shardings=(replicate(mesh), replicate(mesh),
                      batch_sharding(mesh)),
        out_shardings=(replicate(mesh), replicate(mesh)),
    )
    state, losses = jit_step(state, jax.random.PRNGKey(7), batch)
    total = float(losses["total"])
    assert np.isfinite(total), losses
    print("DEVPREP_OK", pid, total)
""")


@pytest.mark.slow
def test_two_process_device_prep_feeds_sharded_train_step(tmp_path):
    """--device_prep composed with multi-host DP: each process encodes its
    local dataset shard, ONE SPMD prep program runs over the two-process
    global mesh, and the prepared global batch feeds the sharded train step
    without resharding. Both processes must agree on the (replicated)
    loss."""
    from tests.fixtures import make_synthetic_dataset

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_images=4, size=64, subset="train")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = _run_two_processes(
        tmp_path, _DEVPREP_WORKER.format(repo=repo, port=_free_port(),
                                         root=root))
    totals = []
    for i, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("DEVPREP_OK")]
        assert lines, f"process {i} did not finish:\n{out}"
        totals.append(float(lines[-1].split()[2]))
    assert abs(totals[0] - totals[1]) < 1e-6


@pytest.mark.slow
def test_two_process_sharded_train_step_matches_single(tmp_path):
    """The FULL jitted train step (forward + 6 losses + grads + SGD) over a
    two-process global mesh reproduces the single-process step: gradient
    psum crosses a real process boundary (gloo), not just virtual devices."""
    import json

    from tests.test_dp_scaling import one_step, tiny_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = _run_two_processes(
        tmp_path, _TRAIN_WORKER.format(repo=repo, port=_free_port()))
    ref_losses, _ = one_step(tiny_config(), 1)
    for i, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("LOSSES ")]
        assert lines, f"process {i} printed no losses:\n{out}"
        got = json.loads(lines[-1][len("LOSSES "):])
        for k, v in ref_losses.items():
            assert abs(v - got[k]) < 1e-5, (i, k, v, got[k])
