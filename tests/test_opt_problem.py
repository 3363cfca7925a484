"""OptProblem.run_slsqp evaluation semantics (round-3 fixes):

- the per-iteration callback must not pay a FULL extra
  objective+gradient evaluation (it memoizes against the line-search
  evaluation at the same accepted point);
- a diverged trial evaluation (non-finite new_state) must not poison
  the warm-start state for every subsequent evaluation.

Role reference: the reference drives scipy/pyoptsparse through
OpenMDAO drivers (GOLDFISH/demos_om/thickness_opt/plate_var_th_opt_
wint.py:330-361); state warm-starting across evaluations is this
build's addition."""

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.opt.problem import OptProblem


def test_run_slsqp_callback_is_memoized():
    calls = {"n": 0}

    def bump():
        calls["n"] += 1

    def obj(dvs, state):
        jax.debug.callback(bump)
        x = dvs["x"]
        return jnp.sum((x - 1.0) ** 2), state

    prob = OptProblem()
    prob.add_design_var("x", jnp.asarray([4.0, -3.0]))
    prob.set_objective(obj, state0=jnp.asarray(0.0))
    res = prob.run_slsqp(maxiter=6, tol=1e-12, verbose=True)
    assert res.fun < 1e-10
    # history came from the callback; each entry must have been served
    # from the memo (<= one real evaluation per distinct x: scipy's own
    # line-search/gradient evals, but NO callback duplicates)
    assert len(res.history) >= 1
    assert calls["n"] <= res.nit + 3, (calls, res.nit)


def test_run_slsqp_state_guard_survives_diverged_trial():
    """new_state = 0.5*state + (NaN when x strays): without the commit
    guard the first wild evaluation poisons every later warm start."""

    def obj(dvs, state):
        x = dvs["x"]
        bad = jnp.where(x[0] > 10.0, jnp.nan, 1.0)
        return jnp.sum((x - 1.0) ** 2), 0.5 * state + bad

    prob = OptProblem()
    prob.add_design_var("x", jnp.asarray([20.0]))  # starts in the bad zone
    prob.set_objective(obj, state0=jnp.asarray(1.0))
    res = prob.run_slsqp(maxiter=20, tol=1e-12)
    assert res.fun < 1e-8
    assert bool(jnp.isfinite(prob.state_box[0]))
