"""Distributed backend: explicit shard_map collectives vs GSPMD, multi-host
init no-op, and mesh/sharding helpers (SURVEY.md §2.6/§5.8).

jax 0.8 semantics pinned here: with default VMA checking (check_vma=True),
`jax.grad` inside `shard_map` ALREADY psums the cotangent of a replicated
(P()) input across the data axis — explicit collectives on gradients belong
only in `check_vma=False` (manually-scheduled) regions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

# EVERY test in this module may run an 8-virtual-device collective program.
# Two such programs in DIFFERENT xdist workers deadlock each other's
# rendezvous on this single-core host (all participants futex-wait; observed
# hanging a full-suite run for 50+ min before this marker). One shared group
# name across all collective-running tests (see also test_trainer.py)
# serializes them onto one worker.
pytestmark = pytest.mark.xdist_group("collectives")

from deep_visual_slam_tpu.parallel import (
    DATA_AXIS,
    all_gather,
    batch_sharding,
    init_distributed,
    make_mesh,
    pmean,
    psum,
    replicate,
    shard_batch,
)


@pytest.fixture
def mesh(cpu_devices):
    return make_mesh(cpu_devices[:8])


def test_init_distributed_single_process_noop():
    assert init_distributed() == 1
    assert init_distributed() == 1  # idempotent


def _loss_inputs():
    r = np.random.default_rng
    w = jnp.asarray(r(0).normal(size=(4, 4)).astype(np.float32))
    x = jnp.asarray(r(1).normal(size=(16, 4)).astype(np.float32))
    y = jnp.asarray(r(2).normal(size=(16, 4)).astype(np.float32))
    return w, x, y


def test_explicit_psum_grads_match_gspmd(mesh):
    """Manually-scheduled DP gradient (collectives.psum, check_vma=False)
    equals the GSPMD jit+NamedSharding gradient — the audited-comms surface
    computes exactly what the default path computes."""
    w, x, y = _loss_inputs()

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    wr = replicate(w, mesh)
    g_gspmd = jax.jit(jax.grad(loss_fn))(wr, xs, ys)

    n_global = x.size  # mean over all 16*4 elements

    def shard_step(w, x, y):
        local = jax.grad(lambda w: jnp.sum((x @ w - y) ** 2))(w)
        return psum(local, DATA_AXIS) / n_global

    g_explicit = jax.jit(
        jax.shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(),
            check_vma=False,  # manual mode: we schedule the psum ourselves
        )
    )(wr, xs, ys)

    np.testing.assert_allclose(
        np.asarray(g_gspmd), np.asarray(g_explicit), rtol=1e-5, atol=1e-6
    )


def test_vma_autoreduces_grad_of_replicated_input(mesh):
    """With default VMA checking, AD inserts the grad psum automatically —
    adding collectives.psum on top would double-count (this pins the jax 0.8
    behavior the trainers rely on via GSPMD)."""
    w, x, y = _loss_inputs()

    def shard_step(w, x, y):
        # No explicit psum: the cotangent of the replicated w is auto-reduced.
        return jax.grad(lambda w: jnp.sum((x @ w - y) ** 2))(w)

    g = jax.jit(
        jax.shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(),
        )
    )(
        replicate(w, mesh),
        jax.device_put(x, batch_sharding(mesh)),
        jax.device_put(y, batch_sharding(mesh)),
    )
    g_true = jax.grad(lambda w: jnp.sum((x @ w - y) ** 2))(w)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_true), rtol=1e-5, atol=1e-5
    )


def test_shard_map_all_gather_and_pmean(mesh):
    """all_gather reconstructs the global eval batch on every device; pmean
    averages a per-device metric."""
    vals = jnp.arange(16, dtype=jnp.float32).reshape(16, 1)
    sharded = shard_batch({"v": vals}, mesh)["v"]

    def gather_fn(v):
        g = all_gather(v, DATA_AXIS)  # [8, 2, 1] on every device
        m = pmean(jnp.mean(v), DATA_AXIS)
        return g.reshape(-1, 1), m

    gathered, mean = jax.jit(
        jax.shard_map(
            gather_fn,
            mesh=mesh,
            in_specs=(P(DATA_AXIS),),
            out_specs=(P(), P()),
            # gathered IS replicated, but VMA inference can't prove it for
            # all_gather outputs — manual mode, like all explicit-collective
            # regions.
            check_vma=False,
        )
    )(sharded)
    np.testing.assert_array_equal(np.asarray(gathered), np.asarray(vals))
    assert float(mean) == pytest.approx(float(vals.mean()))


def test_shard_batch_places_on_data_axis(mesh):
    batch = {"x": np.zeros((16, 3), np.float32)}
    out = shard_batch(batch, mesh)
    shard_shapes = {s.data.shape for s in out["x"].addressable_shards}
    assert shard_shapes == {(2, 3)}


_TRAIN_2D_MESH_BODY = """
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_default_device", jax.devices("cpu")[0])
from deep_visual_slam_tpu.data.synthetic import synthetic_vo_batch
from deep_visual_slam_tpu.models import DepthNet, PoseNet
from deep_visual_slam_tpu.parallel import make_mesh, replicate, shard_batch
from deep_visual_slam_tpu.training import (
    TrainState, VOLossConfig, init_vo_models, make_optimizer,
    make_vo_train_step,
)

mesh2d = make_mesh(
    jax.devices("cpu")[:4], data_parallel=2, model_parallel=2
)
dm, pm = DepthNet(dtype=jnp.float32), PoseNet(dtype=jnp.float32)
v = init_vo_models(dm, pm, (64, 96), jax.random.PRNGKey(0))
state = TrainState.create(v["params"], v["batch_stats"], make_optimizer(1e-4, 10))
state = state.replace(
    params=replicate(state.params, mesh2d),
    batch_stats=replicate(state.batch_stats, mesh2d),
    opt_state=replicate(state.opt_state, mesh2d),
)
step = make_vo_train_step(dm, pm, VOLossConfig(), mesh=mesh2d)
batch, _ = synthetic_vo_batch(0, 4, 64, 96)
batch = shard_batch(batch, mesh2d)
state, losses = step(state, batch, jax.random.PRNGKey(1))
assert np.isfinite(float(losses["loss"]))
assert int(np.asarray(state.step)) == 1
print("2DMESH_OK")
"""


@pytest.mark.xdist_group("collectives")
def test_train_step_on_2d_mesh():
    """The reserved model axis composes: a (data=2, model=2) mesh runs the
    full VO train step with batch sharded over 'data' and params replicated
    (GSPMD keeps gradient reductions on the data axis; the model axis is
    ready for tensor-parallel shardings without API changes).

    Shielded by ``conftest.run_collective_subprocess`` (fresh subprocess +
    rendezvous-SIGABRT retry; see its docstring for the XLA:CPU failure
    mode on this single-core host).
    """
    from tests.conftest import run_collective_subprocess

    run_collective_subprocess(_TRAIN_2D_MESH_BODY, "2DMESH_OK")


def test_looks_multihost_tpu_detection(monkeypatch):
    """Pod-slice detection: multi-worker TPU env vars trigger auto-init;
    single-worker and this environment do not."""
    from deep_visual_slam_tpu.parallel.distributed import _looks_multihost_tpu

    for var in ("DVS_DISTRIBUTED", "TPU_WORKER_HOSTNAMES", "TPU_WORKER_IDS",
                "MEGASCALE_NUM_SLICES"):
        monkeypatch.delenv(var, raising=False)
    assert not _looks_multihost_tpu()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    assert not _looks_multihost_tpu()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1,host2")
    assert _looks_multihost_tpu()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("MEGASCALE_NUM_SLICES", "2")
    assert _looks_multihost_tpu()
    monkeypatch.setenv("MEGASCALE_NUM_SLICES", "1")
    assert not _looks_multihost_tpu()
    monkeypatch.setenv("DVS_DISTRIBUTED", "1")
    assert _looks_multihost_tpu()


def test_explicit_single_process_overrides_pod_detection(monkeypatch):
    """init_distributed(num_processes=1) / JAX_NUM_PROCESSES=1 is an
    explicit single-process request: it must stay a no-op even when the
    environment looks like a pod slice (resolution order: explicit args >
    environment)."""
    import deep_visual_slam_tpu.parallel.distributed as dist

    def boom(*a, **k):  # pragma: no cover - must never be called
        raise AssertionError("jax.distributed.initialize called")

    monkeypatch.setattr(dist.jax.distributed, "initialize", boom)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "h0,h1,h2,h3")
    monkeypatch.setattr(dist, "_INITIALIZED", False)
    assert dist.init_distributed(num_processes=1) == 1
    monkeypatch.setattr(dist, "_INITIALIZED", False)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert dist.init_distributed() == 1


_MULTIPROC_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from deep_visual_slam_tpu.data.loader import DataLoader, device_prefetch

assert jax.process_count() == 2 and len(jax.devices()) == 4

class IdxDataset:
    # Sample content == its dataset index, so shard placement is verifiable.
    def __len__(self):
        return 32
    def __getitem__(self, i, rng=None):
        return {"x": np.full((4,), float(i), np.float32)}

mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
sharding = NamedSharding(mesh, P("data"))
dl = DataLoader(IdxDataset(), batch_size=8, shuffle=True, seed=5,
                num_workers=2)
batches = list(device_prefetch(dl, sharding=sharding))
assert len(batches) == 4, len(batches)

# The single-host reference order this run must reproduce exactly.
order = np.random.default_rng((5, 0)).permutation(32)
for b, batch in enumerate(batches):
    arr = batch["x"]
    assert arr.shape == (8, 4), arr.shape  # GLOBAL batch shape
    expected = order[b * 8 : (b + 1) * 8].astype(np.float32)
    for shard in arr.addressable_shards:
        r0 = shard.index[0].start or 0
        rows = np.asarray(shard.data)[:, 0]
        np.testing.assert_allclose(rows, expected[r0 : r0 + len(rows)])

# And the assembled array drives a jitted cross-process reduction.
total = float(jax.jit(jnp.sum)(batches[0]["x"]))
assert total == float(order[:8].sum()) * 4, (total, order[:8].sum() * 4)
print("MP_FEED_OK", pid)
"""


@pytest.mark.xdist_group("collectives")
def test_multiprocess_data_feeding():
    """Two real jax processes (distributed.initialize, 2 CPU devices each)
    feed one global batch via per-process DataLoader slicing +
    ``jax.make_array_from_process_local_data`` (loader.py multi-host path):
    every global batch reproduces the single-host order exactly, shards
    land on the right hosts, and the result drives a jitted cross-process
    reduction."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # Two processes must not share the one tunnelled TPU — drop the axon
    # plugin (it ignores JAX_PLATFORMS=cpu) from the workers' PYTHONPATH
    # and make sure the repo root is importable.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + path)
    for attempt in range(2):
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _MULTIPROC_WORKER, str(pid), port],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for pid in (0, 1)
        ]
        outs = []
        try:
            for p in procs:
                outs.append(p.communicate(timeout=600))
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            continue
        if all(p.returncode == 0 for p in procs):
            break
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        assert "MP_FEED_OK" in out
