"""Test harness config: force an 8-device virtual CPU mesh.

Tests must never require real TPU hardware; multi-chip sharding is validated
on `--xla_force_host_platform_device_count=8` CPU devices (see the driver's
`dryrun_multichip` contract in `__graft_entry__.py`).

Note: the `axon` TPU plugin in this image ignores ``JAX_PLATFORMS``, so we
instead pin ``jax_default_device`` to a CPU device after import; mesh-using
tests request ``jax.devices("cpu")`` explicitly via the ``cpu_devices``
fixture.
"""

import os

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in flags:
    # XLA:CPU collectives rendezvous one thread per virtual device and
    # F-check (silent SIGABRT) after a timeout; a loaded single-core host
    # can starve a collective past it. Give slow-but-progressing
    # rendezvous time to finish instead of killing the process. (This is
    # the only collective-timeout flag REGISTERED for XLA_FLAGS in this
    # jaxlib; the xla_cpu_collective_call_* pair exists in DebugOptions
    # but an unknown name in XLA_FLAGS is itself a fatal error.)
    flags += " --xla_cpu_collective_timeout_seconds=900"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")


N_FRAMES = 20


@pytest.fixture
def redwood_root(tmp_path, rng):
    """Fake Redwood tree: 2 train scenes + 1 test scene with poses."""
    import cv2
    import json as _json

    root = tmp_path / "redwood"
    root.mkdir()
    np.save(root / "intrinsic.npy",
            np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]]))
    for fold, scenes in (("train", ["scene_a", "scene_b"]), ("test", ["apartment"])):
        for scene in scenes:
            sdir = root / fold / scene
            (sdir / "image").mkdir(parents=True)
            nodes = []
            for i in range(N_FRAMES):
                img = (rng.uniform(size=(480 // 8, 640 // 8, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(sdir / "image" / f"{i:06d}.jpg"), img)
                T = np.eye(4)
                T[0, 3] = 0.1 * i
                nodes.append({"pose": T.flatten(order="F").tolist()})
            with open(sdir / f"{scene}.json", "w") as f:
                _json.dump({"nodes": nodes}, f)
    return str(root)


def run_collective_subprocess(body: str, ok_token: str, timeout: int = 1500,
                              retries: int = 2) -> None:
    """Run a collective-heavy test body in a FRESH subprocess with retries.

    XLA:CPU collectives rendezvous one thread per virtual device and F-check
    (silent SIGABRT, "worker crashed" under xdist) when a loaded single-core
    host starves a participant past the termination timeout. The subprocess
    isolates the abort from the pytest worker; the rendezvous/SIGABRT
    signature is retried (runtime scheduling flake, not repo logic).
    Shared shield for every collective-heavy test (VERDICT r2 #10).
    """
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env_flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in env_flags:
        env["XLA_FLAGS"] = (
            env_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    out = None
    for attempt in range(retries):
        out = subprocess.run(
            [sys.executable, "-c", body],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        if out.returncode == 0:
            break
        flaky = (
            "rendezvous" in out.stderr
            or out.returncode in (-6, 134)  # SIGABRT
        )
        if not flaky:
            break
    assert out.returncode == 0, out.stderr[-3000:]
    assert ok_token in out.stdout
