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
