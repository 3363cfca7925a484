"""Driver entry points: single-chip compile check and the 8-virtual-
device patch-sharded dry run (conftest forces 8 CPU devices)."""

import importlib.util
import pathlib

import jax
import pytest
import jax.numpy as jnp


def _load_graft():
    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles():
    mod = _load_graft()
    fn, args = mod.entry()
    jfn = jax.jit(fn)
    d_new, rn = jfn(*args)
    jax.block_until_ready((d_new, rn))
    assert bool(jnp.all(jnp.isfinite(d_new)))
    assert float(rn) > 0.0


@pytest.mark.slow  # duplicates the driver-run MULTICHIP artifact (386 s)
def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    mod = _load_graft()
    mod.dryrun_multichip(8)


@pytest.mark.slow  # spawns 3 subprocesses (2-process jax.distributed)
def test_two_process_jax_distributed_gradient_parity(tmp_path):
    """REAL multi-process `jax.distributed`: two local processes (2
    virtual CPU devices each) initialize through
    `maybe_init_distributed` with a localhost coordinator, build the
    4-device GLOBAL mesh, and run the patch-sharded forward+adjoint
    step; dJ must match an unsharded single-process reference. Turns
    the SURVEY 2.4 MPI-replacement row from mock-tested into executed
    (reference multi-rank world: GOLDFISH/utils/opt_utils.py:28-54).
    Crash-safe: workers are bounded by a timeout and the parity file
    check fails loudly if either process dies."""
    import os
    import socket
    import subprocess
    import sys as _sys

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_distributed_worker.py")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    base_env = {k: v for k, v in os.environ.items()
                if not k.startswith(("GOLDFISH_COORD", "GOLDFISH_NUM",
                                     "GOLDFISH_PROC", "XLA_FLAGS",
                                     "JAX_"))}
    base_env["PYTHONPATH"] = repo
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["GOLDFISH_TPU_X64"] = "1"

    out = str(tmp_path / "dist")
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["GOLDFISH_COORDINATOR"] = f"127.0.0.1:{port}"
        env["GOLDFISH_NUM_PROCESSES"] = "2"
        env["GOLDFISH_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [_sys.executable, worker, out], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    # unsharded single-process reference runs concurrently
    ref = subprocess.Popen(
        [_sys.executable, worker, out, "reference"], env=dict(base_env),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    logs = []
    for p in procs + [ref]:
        try:
            o, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        logs.append(o.decode(errors="replace"))
    for p, log in zip(procs + [ref], logs):
        assert p.returncode == 0, (
            f"worker rc={p.returncode}\n--- log ---\n{log[-4000:]}")

    r0 = np.load(out + ".p0.npz")
    r1 = np.load(out + ".p1.npz")
    rr = np.load(out + ".ref.npz")
    # both distributed processes saw the global world and agree exactly
    for r in (r0, r1):
        assert int(r["process_count"]) == 2
        assert int(r["n_global_devices"]) == 4
    np.testing.assert_array_equal(r0["g"], r1["g"])
    assert float(r0["J"]) == float(r1["J"])
    rel = (np.linalg.norm(r0["g"] - rr["g"])
           / (np.linalg.norm(rr["g"]) + 1e-300))
    relJ = abs(float(r0["J"]) - float(rr["J"])) / abs(float(rr["J"]))
    assert relJ < 1e-9, relJ
    assert rel < 1e-6, rel
