#!/usr/bin/env python
"""Benchmark: per-optimization-iteration wall clock on the 20-patch wing.

Governing metric (BASELINE.md): one full optimization iteration =
warm-started nonlinear forward solve + objective + full adjoint gradient
(dJ/d h_ffd through the implicit solve), on a 20-patch non-matching
wing. The reference publishes no numbers; the recorded baseline is the
identical workload executed on this host's CPU backend in float64 (the
reference's native precision/stack-equivalent), measured via
GOLDFISH_BENCH_CPU=1 and pinned below.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
vs_baseline = CPU_BASELINE_S / value  (>1 means faster than baseline).

Hardened against the driver environment (round-3 BENCH ran rc=124 with
zero output — a timeout through the axon tunnel left a diagnostically
empty artifact):
  - progress lines on stderr at every phase ('# bench ...' — never
    JSON-parseable, so the driver's tail parser ignores them);
  - a wall-clock budget (GOLDFISH_BENCH_BUDGET_S, default 2400 s; the
    SIGTERM handler is the real backstop against an earlier driver
    kill) with
    per-phase fractions: warm-up/preload variants are SKIPPED once the
    budget fraction is spent, timed iterations stop early, and the
    refactor honesty iteration is dropped last;
  - a SIGALRM/SIGTERM watchdog that emits the best-so-far JSON line
    (flagged "partial": true) before the process dies, so even a
    driver kill yields a parseable record;
  - transient-failure retries (axon worker crash / relay UNAVAILABLE,
    utils/retry.py) around the build and every evaluation.

Provenance: the detail block records host, date, load average at
process start and sample count. In CPU-baseline mode a contended
machine (load > 0.5 on this 1-core host before we start) marks the
record "contended": true — such a number must NEVER be pinned as
CPU_BASELINE_S (the MI_BENCH_CPU episode: a contended baseline was 60%
inflated, CLAUDE.md).
"""

import json
import os
import signal
import socket
import sys
import time

# CPU float64 baseline for the identical workload (see module docstring).
# Measured on this build host (GOLDFISH_BENCH_CPU=1 python bench.py),
# median of 5 iterations after compile/warm-up, exact-tangent Newton,
# UNCONTENDED (the emitted provenance block records load; a run with
# "contended": true is not eligible to update this constant).
# A round-3 remeasure WITH the secant warm start gave 21.5 s/it (CPU is
# assembly/factor-dominated, so the warm start does not help it); the
# recorded baseline keeps the BEST CPU number ever measured so
# vs_baseline stays conservative.
CPU_BASELINE_S = 19.6

T0 = time.monotonic()


def elapsed():
    return time.monotonic() - T0


def progress(msg):
    print(f"# bench +{elapsed():7.1f}s {msg}", file=sys.stderr, flush=True)


class Watchdog:
    """Guarantees ONE parseable JSON line on stdout, whatever happens.

    `record()` keeps the best-so-far measurement; `emit()` prints it
    exactly once. SIGTERM (the driver's `timeout` kill) and SIGALRM
    (our own budget) both route through `emit(partial=True)` and exit
    0 so the driver's artifact has rc=0 + parsed JSON instead of the
    round-3 rc=124/null."""

    def __init__(self, budget_s):
        self.budget_s = float(budget_s)
        self.phase = "init"
        self.best = None       # provisional (early-probe) measurement
        self.final = None      # proper timed-loop measurement
        self.detail = {}
        self.emitted = False

    def remaining(self):
        return self.budget_s - elapsed()

    def record(self, value, provisional=False, **detail):
        self.detail.update(detail)
        if value is None:
            return
        if provisional:
            if self.best is None or value < self.best:
                self.best = value
        else:
            # Always take the LATEST timed-loop value: the loop records
            # the median-so-far each iteration, so keeping a min here
            # would report the single fastest early sample instead of
            # the final median (advisor finding, round 4).
            self.final = value

    def emit(self, partial):
        if self.emitted:
            return
        self.emitted = True
        v = self.final if self.final is not None else self.best
        d = dict(self.detail)
        d["partial"] = bool(partial)
        d["provisional_timing"] = self.final is None
        d["phase"] = self.phase
        d["elapsed_s"] = round(elapsed(), 1)
        d["cpu_baseline_s"] = CPU_BASELINE_S
        print(json.dumps({
            "metric": "wing20_opt_iteration_wall",
            "value": None if v is None else round(v, 4),
            "unit": "s",
            "vs_baseline": None if v is None else round(CPU_BASELINE_S / v, 2),
            "detail": d,
        }), flush=True)

    def _handler(self, signum, frame):
        progress(f"signal {signum} during phase '{self.phase}' — "
                 "emitting best-so-far and exiting")
        self.emit(partial=True)
        os._exit(0)

    def arm(self):
        signal.signal(signal.SIGTERM, self._handler)
        signal.signal(signal.SIGALRM, self._handler)
        signal.alarm(max(int(self.budget_s), 1))


def build_workload():
    import jax
    import jax.numpy as jnp

    from goldfish_tpu.design.pipeline import ThicknessFFD
    from goldfish_tpu.models import wing
    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.implicit import build_solve_fn

    sys_ = wing.build(num_el=6, p=3)
    th = ThicknessFFD(sys_, num_els=(4, 4, 1), p=(2, 2, 1))
    # exact-tangent Newton (freeze_K degrades gradient parity below the
    # 1e-6 target); the block-operator path keeps the per-iteration f64
    # cost at the Hessian-block compute, not the dense scatter
    solve = build_solve_fn(sys_.data, rtol=1e-9, max_it=30)
    cp = sys_.cp
    energy = jax.jit(kl_shell.internal_energy)

    def opt_iteration(h_ffd, d0):
        h = th(h_ffd)
        d = solve(cp, h, d0)
        J = energy(sys_.stack, d, cp, h, sys_.E, sys_.nu)
        return J, d

    # NO outer jit: the inner kernels are jitted with their data as
    # arguments; an outer jit would capture the system arrays as f64
    # closure constants, which the axon TPU backend corrupts (CLAUDE.md)
    vg = jax.value_and_grad(opt_iteration, has_aux=True)
    h0 = jnp.asarray(th.init_h_ffd(wing.H_TH))
    d0 = sys_.zero_displacement()
    n_dofs = sys_.num_splines * sys_.stack.max_cp * 3
    return vg, h0, d0, n_dofs, getattr(solve, "device_factor", None)


def main():
    wd = Watchdog(os.environ.get("GOLDFISH_BENCH_BUDGET_S", "2400"))
    wd.arm()
    try:
        load0 = os.getloadavg()[0]
    except OSError:
        load0 = -1.0
    cpu_mode = os.environ.get("GOLDFISH_BENCH_CPU") == "1"
    wd.record(None,
              host=socket.gethostname(),
              date=time.strftime("%Y-%m-%dT%H:%M:%S"),
              load_at_start=round(load0, 2),
              contended=bool(load0 > 0.5),
              n_samples=0)
    if cpu_mode and load0 > 0.5:
        progress(f"WARNING: load {load0:.2f} on a 1-core host — this CPU "
                 "baseline is CONTENDED and must not be pinned")

    if cpu_mode:
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("GOLDFISH_TPU_X64", "1")
    import jax

    from goldfish_tpu.config import use_x64
    use_x64(True)

    from goldfish_tpu.opt.warmstart import SecantWarmStart
    from goldfish_tpu.utils.retry import retry_transient

    wd.phase = "build"
    progress(f"building workload (backend request: "
             f"{'cpu' if cpu_mode else 'default/tpu'}), "
             f"budget {wd.budget_s:.0f}s")
    # the relay-outage failure mode is a long init hang then an
    # UNAVAILABLE raise, with jax retrying internally (~25 min cycle,
    # CLAUDE.md); retry_transient covers the raise-path while the
    # SIGALRM budget bounds the hang-path
    vg, h0, d0, n_dofs, fac = retry_transient(build_workload)()
    wd.record(None, n_patches=20, n_dofs=n_dofs)
    progress("workload built")

    def force(*xs):
        # jax.block_until_ready does NOT actually block on the axon TPU
        # backend (CLAUDE.md): force a scalar READBACK of every output
        # so the timer only stops once all device work has completed.
        import jax.numpy as jnp
        return float(sum(jnp.asarray(x).ravel()[0] for x in xs))

    eval_once = retry_transient(
        lambda h, d: vg(h, d), retries=1, base_sleep=10.0)

    # compile + converge the warm start
    wd.phase = "compile"
    progress("first evaluation (compiles the fwd+adjoint programs; "
             "one-time 10-40 min on a cold cache, seconds when cached)")
    (J, d), g = eval_once(h0, d0)
    force(J, d, g)
    progress(f"first evaluation done, J={float(J):.6e}")
    wd.record(None, backend=jax.default_backend(), J=float(J))

    # secant-extrapolated warm start across iterations (the production
    # operations layer does the same, operations/disp_imop.py)
    ws = SecantWarmStart()
    ws.update(h0, d)

    # EARLY PROBES before the long preload: the preload's ~21 program
    # loads took 20 min through a slow relay in one measured run — on
    # a tight driver timeout the watchdog would have had NOTHING to
    # report. Three quick warm iterations here put a real (slightly
    # pessimistic, 'provisional') per-iteration number on record
    # within minutes; the proper timed loop below overrides it.
    wd.phase = "probe"
    for k in range(3):
        hp = h0 * (1.0 - 1e-4 * (k + 1))
        t0 = time.perf_counter()
        (Jp, d), gp = eval_once(hp, ws.predict(hp, d))
        force(Jp, d, gp)
        dt = time.perf_counter() - t0
        ws.update(hp, d)
        wd.record(dt, provisional=True)
        progress(f"early probe {k + 1}/3: {dt:.3f}s")

    # deterministically LOAD every sweep-menu program variant before
    # timing: each distinct n_ir (x seeded/unseeded x dir) is a
    # separate XLA program whose one-time compile costs 1-5 min
    # through the axon tunnel AND whose first-in-process load of an
    # already-cached binary still costs ~15-18 s (CLAUDE.md round-3
    # facts) — a variant the warm-up trajectory happened not to sample
    # showed up as a 16.1 s outlier inside the timed loop even after
    # warm-up covered both step signs and several deltas.
    wd.phase = "preload"
    if fac is not None and getattr(fac, "_ref", None) is not None \
            and wd.remaining() > 0.35 * wd.budget_s:
        progress("preloading IR sweep-menu program variants")
        fac.preload()
        progress("preload done")
    else:
        progress("skipping preload (no factor or budget too tight)")

    # settle the adaptive IR sweep policy BEFORE timing: cover BOTH
    # step signs and a larger delta so the timed loop's rho-dependent
    # n_ir choices enter with a realistic measured-contraction state.
    wd.phase = "warmup"
    n_warm = 0
    for dh in (-1e-4, -2e-4, 1e-4, 5e-4, -1e-4):
        if wd.remaining() < 0.25 * wd.budget_s:
            progress(f"budget: stopping warm-up after {n_warm}/5 variants")
            break
        hw = h0 * (1.0 + dh)
        (Jw, dw), gw = eval_once(hw, ws.predict(hw, d))
        force(Jw, dw, gw)
        ws.update(hw, dw)
        d = dw
        n_warm += 1
        progress(f"warm-up {n_warm}/5 (dh={dh:+.0e}) done")

    # re-load the factorization program ladder LAST, untimed: program
    # loads (preload/warm-up) can EVICT it from the device program
    # cache, and the next refactor then pays the whole ladder re-load
    # inside the timed region (round-5 pegasus evtrace: 285-450 s at
    # pegasus scale; the round-4 17.8 s timed-iter-1 outlier at wing
    # scale is the same mechanism). Must be the final load before
    # timing — a reload BEFORE other loads gets re-evicted (measured).
    if fac is not None and getattr(fac, "_ref", None) is not None:
        fac.ensure(*fac._ref, force=True, why="pre-timed-reload")
        progress("factor ladder re-loaded (untimed)")

    wd.phase = "timed"
    times = []
    for k in range(5):
        if times and wd.remaining() < 2.5 * max(times):
            progress(f"budget: stopping timed loop after {len(times)}/5")
            break
        hk = h0 * (1.0 + 1e-4 * (k + 1))  # optimizer-step-sized change
        t0 = time.perf_counter()
        (J, d), g = eval_once(hk, ws.predict(hk, d))
        force(J, d, g)
        times.append(time.perf_counter() - t0)
        ws.update(hk, d)
        srt = sorted(times)
        wd.record(srt[len(srt) // 2],
                  all_times=[round(x, 4) for x in times],
                  n_samples=len(times), J=float(J))
        progress(f"timed iteration {len(times)}/5: {times[-1]:.3f}s "
                 f"(median so far {srt[len(srt) // 2]:.3f}s)")

    # honesty iteration: an SLSQP-realistic EARLY design delta (1e-2
    # relative) that forces tangent refactorization — the warm 1e-4
    # steps above sit inside the stale-factor comfort zone, so this
    # bounds steady-state optimizer throughput from below
    wd.phase = "refactor"
    if times and wd.remaining() > 12.0 * max(times) + 30.0:
        h_big = h0 * (1.0 + 1e-2)
        t0 = time.perf_counter()
        (Jb, db), gb = eval_once(h_big, ws.predict(h_big, d))
        force(Jb, db, gb)
        wd.record(None,
                  refactor_iteration_s=round(time.perf_counter() - t0, 4))
        progress(f"refactor honesty iteration: "
                 f"{wd.detail['refactor_iteration_s']:.3f}s")
    else:
        progress("budget: skipping refactor honesty iteration")

    if fac is not None:
        # outlier attribution: refactors and IR certificates tell a
        # multi-second timed iteration apart from a program load
        progress(f"refactor_log: {getattr(fac, 'refactor_log', [])}")
        progress(f"cert_log tail: {getattr(fac, 'cert_log', [])[-16:]}")
    wd.phase = "done"
    wd.emit(partial=len(times) < 5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
