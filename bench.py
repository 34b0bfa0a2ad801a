"""Benchmark: wall-clock per 24h forecast step on the flagship model, plus
a full-geometry bf16+remat train-step timing.

Times a K-step autoregressive rollout (forward + de/re-normalization feedback,
the unit of work of production inference; reference
inference/inference_multiOutput.py:171-197) compiled as ONE jitted in-graph
loop with a TRACED step count (``lax.fori_loop``) — every rollout length
shares one compiled program — and reports per-step time. Running all steps device-side in a
single dispatch amortizes host<->device round-trip latency — required for
honest numbers through high-latency device tunnels. The train step (forward
+ backward + Adam update, the reference's primary workload,
finetune/finetune_fully.py) is timed the same way via an in-graph loop.

The reference publishes no speed numbers; the driver's north-star target is
< 1 s per 24h step (BASELINE.md), used as the baseline for ``vs_baseline``
(ratio > 1 means faster than target).

Phase ORDER is ADAPTIVE (round-4 post-mortem, docs/PERFORMANCE.md): before
any phase commits its budget, the train program is PROBED against the
persistent executable cache with ``cold_abort_compile`` — a cache hit
deserializes+loads the executable (seconds), a miss raises instead of
launching the minutes-long XLA compilation. Probe outcomes:

  * train WARM  -> train phase first, forecast rollout second (the round-3
    ordering lesson: the train number is the one 0/4 driver artifacts have
    carried; it must never be forfeited to a cold rollout).
  * train COLD + rollout WARM -> the forward phase runs FIRST and its
    number is flushed as an insurance line; the cold train compile then
    gets everything that remains (on a big-budget prime run it completes
    and primes the cache; on the driver's default budget it reports
    ``train_probe: "cold"`` with the missed key — a self-diagnosing
    artifact instead of round 4's silent total loss).
  * both COLD -> train keeps priority (prime-run semantics).

Each phase still runs on a budget-bounded worker thread (a blocked device
call cannot be interrupted — the bound guarantees the artifact), and every
persistent-cache hit/miss plus the host loadavg is logged into the
artifact (``cache_hits``/``cache_misses``/``loadavg_1m``), so a degraded
run can tell a cache miss from chip/host contention.

Output protocol (every line is a valid driver metric line; the driver
takes the LAST one — verified against BENCH_r03.json):

  1. An insurance line flushes the moment the train phase resolves:
       {"metric": "train_step_time_s", "value": ..., "unit": "s",
        "train_step_time_s": ..., "train_mfu": ..., "device_kind": ...}
  2. The forward phase then compiles the rollout (pre-lowered on a
     background host thread during the train phase) and a final merged
     line always prints within the budget (``PANGU_BENCH_BUDGET`` seconds,
     default 480):
       {"metric": "fwd_step_time_s", "value": ..., "vs_baseline": ...,
        "fwd_mfu": ..., "train_step_time_s": ..., "train_mfu": ...}
     If the forward phase dies or runs out of budget, the final line keeps
     the train metric as its headline, with the forward failure reason.

MFU fields use the analytic matmul-FLOP counter (pangu_tpu/utils/flops.py,
trace-exact, tests/test_flops.py) against the device's published bf16 peak:
whole-step MFU, elementwise/softmax work uncounted, remat recompute
uncounted (train MFU therefore slightly understates hardware utilization).

Round 2's lesson also stands: the bench printed exactly one line at the
very end, after a train subprocess with a fixed 1500 s timeout, and the
driver's harness killed the whole process (rc=124) before anything was
flushed. A bench that measures but never reports is a failed bench.

When the tunnel is too sick for paired-difference timing (see
_robust_step_time), a metric may carry ``timing_degraded: true`` /
``train_timing_degraded: true`` — its value is then the t(k_long)/k_long
upper bound (one tunnel round trip amortized over k_long steps), not the
per-step estimate.
"""

from __future__ import annotations

import json
import os
import sys
import time


BASELINE_S = 1.0
_T0 = time.monotonic()


def _budget_remaining() -> float:
    """Seconds left of the overall bench budget (PANGU_BENCH_BUDGET, default
    480 s — comfortably under typical driver step timeouts of ~600 s)."""
    budget = float(os.environ.get("PANGU_BENCH_BUDGET", "480"))
    return budget - (time.monotonic() - _T0)


def _note(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


#: persistent-cache hit/miss counters for the artifact (see _cache_note)
_CACHE_EVENTS = {"hits": 0, "misses": 0}


def _cache_note(msg: str) -> None:
    """Sink for pangu_tpu.utils.compile_cache.log_cache_events: count the
    persistent-cache hits/misses into the artifact and mirror the line into
    the bench's stderr narration (round-4 verdict: the r04 artifact could
    not tell a cache miss from contention because nothing was logged)."""
    low = msg.lower()
    if "compilation cache hit" in low:
        _CACHE_EVENTS["hits"] += 1
    elif "compilation cache miss" in low:
        _CACHE_EVENTS["misses"] += 1
    _note(msg[:200])


def _diag_fields() -> dict:
    """Self-diagnosis fields stamped into every metric line."""
    out = {"cache_hits": _CACHE_EVENTS["hits"],
           "cache_misses": _CACHE_EVENTS["misses"]}
    try:
        out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - getloadavg is POSIX-only
        pass
    return out


def _cache_dir() -> str:
    """Cache directory shared by the executable cache and the export blobs:
    PANGU_COMPILE_CACHE (test isolation), else .jax_cache at the repo root."""
    return (os.environ.get("PANGU_COMPILE_CACHE")
            or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".jax_cache"))


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (PANGU_COMPILE_CACHE or .jax_cache
    next to this file), with chip-roulette-stable keys for this single-chip
    benchmark (the tunnel may attach each run to a different chip instance
    of the same kind; see pangu_tpu.utils.compile_cache for the full
    story). Full-geometry compiles take minutes through a tunneled device;
    repeat bench runs on the same chip kind should pay that once."""
    from pangu_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(_cache_dir())


def _probe_warm_compile(lowered):
    """(compiled, None) when the persistent executable cache HITS for this
    lowered program (the hit deserializes + loads the executable — the real
    compile step, done); (None, missed_key) when it would have to run a
    cold XLA compilation (aborted before it starts — seconds, not minutes).
    """
    from pangu_tpu.utils.compile_cache import (
        ColdCompileAbort,
        cold_abort_compile,
    )

    try:
        with cold_abort_compile():
            return lowered.compile(), None
    except ColdCompileAbort as e:
        return None, e.cache_key or "<none>"


def _probe_warm_bounded(lowered, timeout: float, what: str):
    """_probe_warm_compile on a bounded worker thread (the hit path loads
    the executable through the device tunnel, which can hang when the
    tunnel is sick). Returns (compiled|None, missed_key|None); a blocked or
    failed probe returns (None, None) — 'unknown', treated as not-warm."""
    import threading

    box: dict = {}

    def work():
        try:
            box["res"] = _probe_warm_compile(lowered)
        except Exception as e:  # noqa: BLE001 — probe is diagnostic
            box["err"] = f"{type(e).__name__}: {e}"[:200]

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout)
    if "res" in box:
        return box["res"]
    if "err" in box:
        _note(f"{what} probe failed: {box['err']}")
    else:
        _note(f"{what} probe still running at {timeout:.0f}s "
              f"(executable load blocked — tunnel sick?)")
    return None, None


def _robust_step_time(timed, k_short: int, k_long: int, reps: int,
                      min_reps: int, reserve: float, progress: dict = None,
                      deadline: float = None):
    """Per-step seconds from paired two-length timings, robust to a sick
    tunnel.

    Healthy days: the tunnel adds a 1-5 s round trip per dispatch; the
    median of paired (t(k_long)-t(k_short))/(k_long-k_short) differences
    cancels it and matches the device-busy profile. Sick days (observed):
    round trips balloon to 25-40 s with NO correlation to the step count,
    and the differences are pure noise — negative train-step "readings"
    and a 0.034 s forward "reading" against a ~0.18 s device profile both
    happened. No wall measurement can recover the per-step time through
    that; what CAN be bounded is t(k_long)/k_long, which contains exactly
    one round trip. So: if the median difference is non-positive or
    implausibly far below its own upper bound (< 20% — healthy readings
    sit at ~65%+), report the tightest upper bound instead, flagged with
    ``timing_degraded`` and the raw median for transparency.

    Stops early once ``min_reps`` pairs exist and under ``reserve`` seconds
    of budget remain (the train phase still has to run). ``progress``, if
    given, receives the pairs as they complete so a caller that times this
    function out from another thread can still report a bound. (Named
    ``progress``, not ``partial``: bench_train_step imports functools.partial
    into its local scope for the jit decorator, and a parameter named
    ``partial`` was silently shadowed by it — the box arrived as the
    functools class and item-assignment blew up.)"""
    diffs, floors = [], []
    for _ in range(max(1, reps)):
        ts, tl = timed(k_short), timed(k_long)
        diffs.append((tl - ts) / (k_long - k_short))
        floors.append(tl / k_long)
        if progress is not None:
            progress["diffs"], progress["floors"] = list(diffs), list(floors)
        if len(diffs) >= min_reps and _budget_remaining() < reserve:
            _note(f"timing: stopping after {len(diffs)} pairs "
                  f"(budget reserve {reserve:.0f}s)")
            break
        # the caller's join(timeout) has already fired past the deadline:
        # stop dispatching device work so a leaked timing thread cannot
        # pollute the NEXT phase's measurements (min_reps does not apply —
        # the caller is no longer listening, progress[] has what there is)
        if deadline is not None and time.monotonic() > deadline:
            _note(f"timing: phase deadline passed after {len(diffs)} pairs")
            break
    diffs.sort()
    value = diffs[len(diffs) // 2]
    bound = min(floors)
    if value <= 0 or value < 0.2 * bound:
        _note(f"timing degraded: median diff {value:.4f} vs upper bound "
              f"{bound:.4f} — tunnel noise dominates; reporting the bound")
        return bound, {"timing_degraded": True,
                       "paired_diff_step_time_s": round(value, 5)}
    return value, {}


def _device_inputs(m, batch: int = 1):
    """Full-geometry synthetic (upper, surface) generated on device."""
    import jax
    import jax.numpy as jnp

    ku, ks = jax.random.split(jax.random.PRNGKey(42))
    upper = jax.random.normal(
        ku, (batch, m.upper_vars, m.levels, m.lat, m.lon), jnp.float32)
    surface = jax.random.normal(
        ks, (batch, m.surface_vars, m.lat, m.lon), jnp.float32)
    return upper, surface


def _start_watchdog() -> None:
    """Periodic stderr heartbeat. Device initialization through the tunnel
    HANGS (rather than raising) when the tunnel is down; if this process is
    killed by the harness, the heartbeat in the captured tail is the
    difference between a diagnosable artifact and a silent rc=124.

    Also registers SIGUSR1 -> all-thread Python tracebacks on stderr
    (faulthandler), so a blocked run can be diagnosed from outside with
    ``kill -USR1 <pid>`` instead of killed blind."""
    import threading

    try:
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (ImportError, AttributeError, ValueError):  # pragma: no cover
        pass

    def beat():
        n = 0
        while True:
            time.sleep(60)
            n += 1
            _note(f"watchdog: still running ({n} min) — if no progress "
                  f"notes follow, device init/compile is blocked "
                  f"(tunnel down?)")

    threading.Thread(target=beat, daemon=True).start()


def _make_rollout(model):
    """The jitted K-step autoregressive rollout program.

    aux is an ARGUMENT (closed-over full-geometry arrays become inlined
    literals and can push the program past the remote-compile size cap).
    `steps` is a TRACED scalar driving a fori_loop, so every rollout
    length shares ONE compiled program — cold runs pay one full-geometry
    compile instead of two, warm runs deserialize one cache entry."""
    import jax
    import jax.numpy as jnp

    from pangu_tpu.aux import norm_back_data

    @jax.jit
    def rollout(params, upper, surface, aux, steps):
        def step(_, carry):
            u, s = carry
            ou, os_ = model.apply(params, u, s, aux, True)
            ou, os_ = norm_back_data(ou, os_, aux)
            return (ou, os_)

        u, s = jax.lax.fori_loop(0, steps, step, (upper, surface))
        # scalar summary so timing includes no bulk device->host transfer
        return jnp.sum(u[:, 0, 0, ::360, ::360]) + jnp.sum(s[:, 0, ::360, ::360])

    return rollout


def _start_rollout_prelower(model, params, upper, surface, aux):
    """Trace+lower the rollout program on a daemon thread — PURE HOST work
    (lowering reads avals only, no device dispatch), so it safely overlaps
    the train phase's device compiles and timed runs. Returns (event, box);
    box gets "lowered" or "error"."""
    import threading

    import numpy as np

    box: dict = {}
    done = threading.Event()

    def work():
        t0 = time.monotonic()
        try:
            roll = _make_rollout(model)
            box["lowered"] = roll.lower(params, upper, surface, aux,
                                        np.int32(1))
        except Exception as e:  # noqa: BLE001 — surfaced by the fwd phase
            box["error"] = f"{type(e).__name__}: {e}"[:300]
        _note(f"rollout pre-lowered in background "
              f"({time.monotonic() - t0:.0f}s)")
        done.set()

    threading.Thread(target=work, daemon=True).start()
    return done, box


def _fwd_metric_inprocess(roll_done, roll_box, params, upper, surface,
                          aux, compiled=None, reserve=10.0) -> dict:
    """Forward (rollout) timing on a budget-bounded worker thread. Returns
    {"fwd_step_time_s": value|None, ...} fields; never raises, never blocks
    past the remaining budget. ``compiled`` skips the compile step when a
    warm probe already loaded the executable (the fwd-first path)."""
    import threading

    import jax
    import jax.numpy as jnp

    timeout = _budget_remaining() - reserve
    if timeout <= 20:
        return {"fwd_step_time_s": None,
                "fwd_error": f"skipped: {timeout:.0f}s left in budget"}
    _note(f"forward bench, budget {timeout:.0f}s")

    box: dict = {}
    progress: dict = {}
    deadline = time.monotonic() + timeout

    def work():
        try:
            compiled_ = compiled
            if compiled_ is None:
                roll_done.wait()
                if "error" in roll_box:
                    raise RuntimeError(
                        f"rollout pre-lowering failed: {roll_box['error']}")
                compiled_, missed = _probe_warm_compile(roll_box["lowered"])
                if compiled_ is None:
                    _note(f"rollout COLD in the persistent cache (missed "
                          f"key {missed}); compiling inside the phase "
                          f"budget")
                    box["rollout_probe"] = "cold"
                    compiled_ = roll_box["lowered"].compile()
                else:
                    box["rollout_probe"] = "warm"

            def run_k(k):
                return float(compiled_(params, upper, surface, aux,
                                       jnp.asarray(k, jnp.int32)))

            def timed(k):
                t0 = time.perf_counter()
                run_k(k)
                return time.perf_counter() - t0

            # 5/25: the dress-rehearsal showed 5/45 x 4 reps spending ~184 s
            # in the timing block alone (steps x ~0.18 s + a tunnel round
            # trip per dispatch) out of a 480 s budget.
            _note("warm rollout (single dynamic-length program)")
            run_k(1)
            _note("timing forward")
            value, extra = _robust_step_time(
                timed, 5, 25,
                reps=int(os.environ.get("PANGU_BENCH_FWD_REPS", "5")),
                min_reps=2, reserve=15.0, progress=progress,
                deadline=deadline)
            box["fwd_step_time_s"] = round(value, 5)
            # fwd extras keep their bare round-1..3 names
            # (timing_degraded, paired_diff_step_time_s)
            box.update(extra)
        except Exception as e:  # noqa: BLE001 — reported in the artifact
            box["fwd_step_time_s"] = None
            box["fwd_error"] = f"{type(e).__name__}: {e}"[:200]

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        if progress.get("floors"):
            return {"fwd_step_time_s": round(min(progress["floors"]), 5),
                    "timing_degraded": True,
                    "fwd_error":
                        f"budget cut at {len(progress['floors'])} pairs; "
                        f"value is the t(k_long)/k_long upper bound"}
        return {"fwd_step_time_s": None,
                "fwd_error": f"still running at budget ({timeout:.0f}s)"}
    return box


def main() -> None:
    _start_watchdog()
    import jax

    # the environment's TPU plugin re-inserts itself into jax_platforms at
    # import (ignoring JAX_PLATFORMS), so the CPU rehearsal needs an
    # explicit config pin (same workaround as tests/conftest.py)
    plat = os.environ.get("PANGU_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    _enable_compile_cache()

    from pangu_tpu.utils.compile_cache import log_cache_events

    log_cache_events(_cache_note)
    try:
        _note(f"host loadavg {os.getloadavg()[0]:.2f}")
    except OSError:
        pass
    _note("initializing device backend")
    _note(f"backend: {jax.default_backend()} x{len(jax.devices())}")

    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_pretrain, pangu_tiny
    from pangu_tpu.model import PanguModel
    from pangu_tpu.utils.flops import (
        forward_matmul_flops,
        mfu,
        train_matmul_flops,
    )

    kw = dict(
        compute_dtype="bfloat16",
        matmul_precision="default",
        use_pallas_attention=jax.default_backend() == "tpu",
    )
    if os.environ.get("PANGU_BENCH_TINY"):
        # end-to-end rehearsal of the whole bench flow (both phases, all
        # threads, the output protocol) in seconds on CPU — numbers are
        # meaningless, the artifact shape is what's being checked
        cfg = pangu_tiny(**kw)
    else:
        cfg = pangu_pretrain(horizon=24, **kw)
    m = cfg.model
    # device_put ONCE: numpy aux (~66 MB) passed as a jit argument is
    # re-uploaded on EVERY call — seconds of per-call overhead and the
    # main source of paired-difference noise through the tunnel
    aux = jax.device_put(synthetic_aux_constants(m, cfg.train))
    model = PanguModel(m)

    # inputs are generated ON DEVICE: uploading the ~286 MB host arrays
    # costs tens of seconds of the budget through the tunnel, and the
    # rollout/train programs see identical avals either way
    upper, surface = _device_inputs(m)

    _note("init params")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), upper, surface, aux)

    # PANGU_BENCH_TRAIN_BATCH: samples per train step (round-4 verdict #3 —
    # the reference trains at per-GPU batch 1 x8 GPUs; batch >= 2 amortizes
    # the weight-gradient matmuls and is the honest single-chip comparison)
    train_batch = max(1, int(os.environ.get("PANGU_BENCH_TRAIN_BATCH", "1")))
    if train_batch > 1:
        _note(f"train batch {train_batch} (separate batched inputs)")
        t_upper, t_surface = _device_inputs(m, train_batch)
    else:
        t_upper, t_surface = upper, surface

    # train-state construction allocates ~2x the params tree of Adam moments
    # ON DEVICE (optax init) — do it HERE, serially, so the background
    # rollout pre-lower thread below stays pure-host
    _note("init train state (Adam moments)")
    objs = _make_train_objects(cfg, model, aux, params, t_upper, t_surface)

    device_kind = jax.devices()[0].device_kind
    fwd_flops = forward_matmul_flops(m, batch=1)["total"]
    train_flops = train_matmul_flops(m, batch=train_batch)

    # tracing+lowering the rollout program is pure host work — overlap it
    # with the entire train phase (device untouched until the forward
    # phase compiles/loads the executable)
    roll_done, roll_box = _start_rollout_prelower(
        model, params, upper, surface, aux)

    # ---- ADAPTIVE PHASE ORDER (module docstring): probe train warmness
    # before committing budget; a cold train program must never forfeit a
    # warm forward number again (round-4 post-mortem) ----
    fwd_reserve = float(os.environ.get("PANGU_BENCH_FWD_RESERVE", "150"))
    train_fields, train_thread, train_progress, prep_box = \
        _train_metric_inprocess(
            cfg, model, aux, params, t_upper, t_surface, objs=objs,
            reserve=fwd_reserve, on_cold="report", train_batch=train_batch)
    if train_batch != 1:
        train_fields["train_batch"] = train_batch

    phase_order = "train-first"
    roll_compiled = None
    fwd_fields: dict = {}
    if (train_fields.get("train_probe") == "cold"
            and train_fields.get("train_step_time_s") is None):
        _note(f"train program COLD (missed key "
              f"{train_fields.get('train_missed_key')}); probing the "
              f"rollout to pick the phase order")
        wait_s = max(0.0, min(240.0, _budget_remaining() - fwd_reserve))
        if roll_done.wait(wait_s) and "lowered" in roll_box:
            roll_compiled, _missed = _probe_warm_bounded(
                roll_box["lowered"], 90.0, "rollout")
            train_fields["rollout_probe"] = (
                "warm" if roll_compiled is not None else "cold")
        else:
            train_fields["rollout_probe"] = "not-lowered"
        if roll_compiled is not None:
            phase_order = "fwd-first"
        else:
            _note("rollout not warm either: train keeps priority "
                  "(prime-run semantics)")

    if phase_order == "fwd-first":
        _note("adaptive order: warm forward phase FIRST, cold train "
              "attempt with whatever budget remains")
        # free the Adam moments before the rollout allocates activations;
        # rebuilt below for the train attempt (params are untouched: the
        # rollout does not donate them)
        objs.pop("state", None)
        train_prep = prep_box.get("prep") or {}
        train_prep.pop("state", None)
        fwd_fields = _fwd_metric_inprocess(
            roll_done, roll_box, params, upper, surface, aux,
            compiled=roll_compiled, reserve=40.0)
        fwd_fields["rollout_probe"] = "warm"
        fv = fwd_fields.get("fwd_step_time_s")
        if fv:
            u = mfu(fwd_flops, fv, device_kind)
            if u is not None:
                fwd_fields["fwd_mfu"] = round(u, 4)
            # insurance: flush the captured forward number before the cold
            # train attempt (every line is a valid driver metric line)
            print(json.dumps({
                "metric": "fwd_step_time_s", "value": fv, "unit": "s",
                "vs_baseline": round(BASELINE_S / fv, 4),
                "device_kind": device_kind, **_diag_fields(), **fwd_fields,
            }), flush=True)
        # rebuild the train state (fresh Adam moments over the live params)
        # and attempt the cold compile with everything that remains — on a
        # prime run it completes and primes the cache; on the default
        # budget the bounded attempt reports progress or a clean reason
        objs = _make_train_objects(cfg, model, aux, params, t_upper,
                                   t_surface)
        if train_prep.get("lowered") is not None:
            train_prep["state"] = objs["state"]
            train_prep["batch"] = objs["batch"]
        else:
            train_prep = None
        attempt_fields, train_thread, train_progress, _ = \
            _train_metric_inprocess(
                cfg, model, aux, params, t_upper, t_surface, objs=objs,
                reserve=25.0, prep=train_prep, on_cold="compile",
                train_batch=train_batch)
        train_fields.update(attempt_fields)
    elif (train_fields.get("train_probe") == "cold"
          and train_fields.get("train_step_time_s") is None):
        # both programs cold (or rollout unknown): cold train attempt NOW
        # with the normal train budget — prime-run semantics; the prep
        # (trace + export blob) from the probe pass is reused
        attempt_fields, train_thread, train_progress, _ = \
            _train_metric_inprocess(
                cfg, model, aux, params, t_upper, t_surface, objs=objs,
                reserve=fwd_reserve, prep=prep_box.get("prep"),
                on_cold="compile", train_batch=train_batch)
        train_fields.update(attempt_fields)

    tr = train_fields.get("train_step_time_s")
    if tr:
        u = mfu(train_flops, tr, device_kind)
        if u is not None:
            train_fields["train_mfu"] = round(u, 4)
    # Insurance line: if anything after this dies, the driver's last-line
    # parse still carries the train metric.
    insurance = {
        "metric": "train_step_time_s",
        "value": tr,
        "unit": "s",
        "device_kind": device_kind,
        "phase_order": phase_order,
        **_diag_fields(),
        **train_fields,
    }
    print(json.dumps(insurance), flush=True)

    if phase_order == "train-first":
        # ---- FORWARD PHASE ----
        # If the train thread outlived its budget it is BLOCKED inside a
        # device call (a cold compile or a warm step) holding the train
        # state and its in-flight activations — dispatching the rollout on
        # top of that OOM'ed the chip in rehearsal (RESOURCE_EXHAUSTED).
        # Grace-join, and skip the forward phase rather than race it if the
        # device is still held; with a primed cache this branch never
        # triggers.
        if train_thread is not None and train_thread.is_alive():
            grace = max(0.0, min(120.0, _budget_remaining() - 120.0))
            _note(f"waiting up to {grace:.0f}s for the overdue train thread "
                  f"to release the device")
            train_thread.join(grace)
        if train_thread is not None and train_thread.is_alive():
            fwd_fields = {
                "fwd_step_time_s": None,
                "fwd_error": "skipped: train phase still holds the device "
                             "(in-flight compile/step); running the rollout "
                             "concurrently OOMs the chip",
            }
        else:
            # the train program DONATED the original param buffers; the
            # trained params in the final state are the live copy (same
            # avals, so the pre-lowered rollout accepts them — this is a
            # timing run, drifted values are irrelevant). Only when the
            # train phase never executed a step do the original buffers
            # still exist. (With a batched train phase the rollout keeps
            # its own batch-1 inputs; params avals are batch-free.)
            fin = train_progress.pop("final_state", None)
            roll_params = fin.params if fin is not None else params
            # free everything of the train state except the params the
            # rollout needs: dropping the TrainState releases the
            # ~2x-params Adam moments back to HBM before the rollout
            # allocates activations
            del fin
            objs.pop("state", None)
            fwd_fields = _fwd_metric_inprocess(
                roll_done, roll_box, roll_params, upper, surface, aux)
    fv = fwd_fields.get("fwd_step_time_s")
    if fv:
        u = mfu(fwd_flops, fv, device_kind)
        if u is not None:
            fwd_fields["fwd_mfu"] = round(u, 4)
        result = {
            "metric": "fwd_step_time_s",
            "value": fv,
            "unit": "s",
            "vs_baseline": round(BASELINE_S / fv, 4),
            # the tunnel may attach each process to a different chip —
            # record which one produced each number
            "device_kind": device_kind,
            "phase_order": phase_order,
            **_diag_fields(),
            **fwd_fields,
            **train_fields,
        }
    else:
        # forward failed: keep the train metric as the headline
        result = {**insurance, **fwd_fields, **_diag_fields()}
    print(json.dumps(result), flush=True)
    # a blocked/hung device call on a worker thread cannot be joined;
    # the artifact is complete, leave unconditionally
    os._exit(0)


def _train_metric_inprocess(cfg, model, aux, params, upper, surface,
                            objs=None, reserve=15.0, prep=None,
                            on_cold="compile", train_batch=1):
    """Train-step timing on a worker THREAD in this process, bounded by the
    remaining overall budget minus ``reserve`` (seconds kept back for the
    forward phase that runs after it).

    ``on_cold`` is the adaptive-phase-order hook (round-4 post-mortem):

      * "report" — after pre-lowering, PROBE the persistent executable
        cache. A hit loads the executable and the phase proceeds (warm,
        today's fast path). A miss returns immediately with
        ``{"train_probe": "cold", "train_missed_key": ...}`` and the prep
        (4th return value) so the caller can run the warm forward phase
        first and re-enter with ``on_cold="compile"``.
      * "compile" — compile regardless (the cold attempt / prime-run path;
        also the pre-round-5 behavior).

    In-process reuses the live backend, the built model and the initialized
    params — a subprocess re-pays backend init plus a full re-trace (minutes)
    and, measured head-to-head, read ~3x slower than the identical program
    timed in-process (2.18 vs 0.72 s/step, same chip kind, same night).
    Pre-lowering (export-blob fast path, else a minutes-long host trace)
    happens ON the worker thread so a hang anywhere in the phase is bounded:
    if it outlives the budget, the insurance line still prints (with null +
    reason, or the completed timing upper bound) and the bench moves on.

    Returns (fields, thread_or_None, progress, prep_box) where
    prep_box.get("prep") carries the pre-lowered program for reuse.
    """
    import threading

    override = os.environ.get("PANGU_BENCH_TRAIN_TIMEOUT")
    if override is not None:
        timeout = float(override)
    else:
        timeout = _budget_remaining() - reserve
    if timeout <= 30:
        return ({"train_step_time_s": None,
                 "train_step_error":
                     f"skipped: {timeout:.0f}s left in budget"},
                None, {}, {})
    _note(f"train bench in-process, budget {timeout:.0f}s "
          f"(reserve {reserve:.0f}s for the forward phase, "
          f"on_cold={on_cold})")
    import jax

    box: dict = {}
    progress: dict = {}
    prep_box: dict = {"prep": prep}
    decided = threading.Event()
    deadline = time.monotonic() + timeout

    def work():
        try:
            p = prep_box["prep"]
            if p is None:
                p = _prelower_train(
                    cfg, objs if objs is not None else _make_train_objects(
                        cfg, model, aux, params, upper, surface),
                    train_batch)
                prep_box["prep"] = p
            if "error" not in p and "compiled" not in p \
                    and on_cold == "report":
                compiled, missed = _probe_warm_compile(p["lowered"])
                if compiled is None:
                    box["train_probe"] = "cold"
                    box["train_missed_key"] = missed
                    decided.set()
                    return
                p["compiled"] = compiled
                box["train_probe"] = "warm"
            decided.set()
            value, extra = bench_train_step(
                cfg, model, aux, params, upper, surface, progress=progress,
                prep=p, reserve=reserve + 20.0, deadline=deadline,
                train_batch=train_batch)
            box["train_step_time_s"] = round(value, 5)
            box["train_device_kind"] = jax.devices()[0].device_kind
            for k, v in extra.items():
                box[f"train_{k}"] = v
        except Exception as e:  # noqa: BLE001 — reported in the artifact
            box["train_step_time_s"] = None
            box["train_step_error"] = f"{type(e).__name__}: {e}"[:200]
        finally:
            decided.set()

    t = threading.Thread(target=work, daemon=True)
    t.start()
    decided.wait(timeout)
    if box.get("train_probe") == "cold" and "train_step_time_s" not in box:
        # cold + report: the worker returned without compiling — hand the
        # decision (and the prep, for the later attempt) back to the caller
        t.join(5.0)
        return box, None, progress, prep_box
    t.join(max(0.0, deadline - time.monotonic()))
    if t.is_alive():
        if progress.get("floors"):
            # the timing loop was underway: report the tightest completed
            # upper bound rather than nothing (degraded, like a sick-tunnel
            # fallback — see _robust_step_time)
            return ({**box,
                     "train_step_time_s": round(min(progress["floors"]), 5),
                     "train_device_kind": jax.devices()[0].device_kind,
                     "train_timing_degraded": True,
                     "train_step_error":
                         f"budget cut at {len(progress['floors'])} pairs; "
                         f"value is the t(k_long)/k_long upper bound"},
                    t, progress, prep_box)
        return ({**box,
                 "train_step_time_s": None,
                 "train_step_error":
                     f"still running at budget ({timeout:.0f}s)"},
                t, progress, prep_box)
    return box, t, progress, prep_box


def _register_export_serializations(trees) -> None:
    """Register pytree-node serializations for jax.export round-trips of the
    train program: AuxConstants (dataclass pytree) plus every namedtuple
    type appearing in the given trees (TrainState, Batch, optax states).
    Must run before BOTH export and deserialize. Idempotent."""
    from jax import export as jexport

    from pangu_tpu.aux import AuxConstants

    try:
        jexport.register_pytree_node_serialization(
            AuxConstants, serialized_name="pangu_tpu.aux.AuxConstants",
            serialize_auxdata=lambda a: b"",
            deserialize_auxdata=lambda b: None)
    except ValueError:
        pass

    def walk(x):
        if hasattr(x, "_fields"):
            t = type(x)
            try:
                jexport.register_namedtuple_serialization(
                    t, serialized_name=f"{t.__module__}.{t.__qualname__}")
            except ValueError:
                pass
            for f in x._fields:
                walk(getattr(x, f))
        elif isinstance(x, (list, tuple)):
            for v in x:
                walk(v)
        elif isinstance(x, dict):
            for v in x.values():
                walk(v)

    walk(trees)


def _train_export_blob_path(cfg, train_batch: int = 1) -> str:
    """Path of the serialized (jax.export) train program, keyed by
    everything that determines the traced computation: jax version, the
    full pangu_tpu source tree, this file, the config, and the train batch
    size. Any source edit re-keys the blob, so a stale export can never be
    silently benched."""
    import glob
    import hashlib

    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    # exported programs are platform-specific: a CPU-lowered blob must
    # never be restored by a TPU run (and vice versa)
    h.update(jax.default_backend().encode())
    root = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(root, "pangu_tpu", "**", "*.py"),
                             recursive=True))
    files.append(os.path.abspath(__file__))
    for f in files:
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    h.update(repr(cfg).encode())
    if train_batch != 1:  # batch 1 keeps the round-1..4 key unchanged
        h.update(f"train_batch={train_batch}".encode())
    return os.path.join(_cache_dir(),
                        f"train_export_{h.hexdigest()[:16]}.bin")


def _make_train_objects(cfg, model, aux, params, upper, surface) -> dict:
    """Optimizer/step/state/batch for the train bench. ALLOCATES ON DEVICE
    (optax's Adam init builds mu/nu as zeros_like(params), ~2x the params
    tree) — callers overlapping the pre-lowering with timed device work
    must run this first, on the main thread (see main())."""
    from pangu_tpu.train.step import Batch, make_optimizer, make_train_step
    from pangu_tpu.train.trainer import init_train_state

    try:
        import jax
        import jax.numpy as jnp

        optimizer = make_optimizer(cfg)
        step = make_train_step(model, cfg, optimizer)
        # the train program donates its state (argnum 0), so the first
        # train call consumes these param buffers. The forward phase
        # (which runs AFTER) therefore reads its params back out of the
        # FINAL train state (progress["final_state"]) — a device COPY here
        # instead was tried and OOM'ed the chip (+1.1 GB on an HBM budget
        # where params + moments + remat residuals already sit near the
        # ceiling; both phases RESOURCE_EXHAUSTED in rehearsal)
        state = init_train_state(model, cfg, aux, optimizer, params=params)
        batch = Batch(upper, surface, upper, surface)
        # the loop rng is folded per-step in-graph; the base key must be a
        # HOST numpy array built with ZERO device traffic. Two observed
        # tunnel hangs forced this (faulthandler stacks, round-5 prime
        # runs): (a) a device-resident key is embedded as an MLIR constant
        # at lowering time via a device->host read inside the lowering,
        # blocked >10 min on the pre-lower thread; (b) even an explicit
        # np.asarray(PRNGKey(0)) D2H read of the 8-byte key blocked >7 min
        # on the MAIN thread — small device->host reads through the tunnel
        # hang intermittently while dispatches run fine. PRNGKey(0) is the
        # threefry seed [0, 0] (asserted equal in CI), so the host zeros
        # are bit-identical: the traced HLO — and therefore every primed
        # executable-cache key — is unchanged.
        import numpy as np

        base_rng = np.zeros((2,), np.uint32)
        return {"step": step, "state": state, "batch": batch, "aux": aux,
                "base_rng": base_rng}
    except Exception as e:  # noqa: BLE001 — surfaced by bench_train_step
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def _prelower_train(cfg, objs, train_batch: int = 1) -> dict:
    """Trace + lower the train-bench program from pre-built train objects
    (:func:`_make_train_objects`) — pure HOST work, no device compile and
    no device dispatch, so it is safe on a background thread while the
    forward phase is being timed.

    Returns {"state", "batch", "lowered", "via"} where ``via`` records the
    path taken: "export-restore" (blob found, host trace skipped),
    "export-new" (traced, exported, then lowered through the
    serialize->deserialize round-trip), or "inline" (export unavailable).
    All paths end in a ``lowered`` program so the caller can probe the
    persistent executable cache (:func:`_probe_warm_compile`) before
    committing budget to ``.compile()``.

    batch and aux are ARGUMENTS: closed over, the full-geometry input
    arrays (~300 MB) become inlined HLO literals and push the serialized
    program past the remote-compile request size cap (HTTP 413).
    An in-graph loop over steps: one dispatch per K, tunnel-latency-immune.
    `steps` is a TRACED scalar (fori_loop), so all K share one compiled
    program — one compile / one cache entry instead of two.
    Caveat (measured, docs/PERFORMANCE.md): the loop carry double-buffers
    the ~1 GB (params + Adam moments) state each iteration, so this reads
    ~2x the profiler's device-busy time — a conservative upper bound.
    (K per-step dispatches chained by donation were tried and do NOT
    pipeline through the tunneled runtime: ~2.8 s/dispatch serialized.)
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    if "error" in objs:
        return {"error": objs["error"]}
    try:
        step = objs["step"]
        state, batch, aux = objs["state"], objs["batch"], objs["aux"]
        base_rng = objs["base_rng"]

        @partial(jax.jit, donate_argnums=(0,))
        def run(state, batch, aux, steps):
            def body(i, carry):
                st, acc = carry
                st, loss = step(st, batch, aux,
                                jax.random.fold_in(base_rng, i))
                return st, acc + loss

            state, total = jax.lax.fori_loop(
                0, steps, body, (state, jnp.float32(0.0)))
            return state, total

        # Fast path: the traced program serialized by a previous run
        # (jax.export) — skips the minutes-long host trace entirely. The
        # blob is ~2 MB StableHLO; compile still goes through the (keyed)
        # persistent executable cache at call time. All host-only: this
        # runs on a background thread during the forward phase and must
        # not touch the device (a host numpy scalar traces identically).
        import numpy as np

        steps0 = np.int32(1)
        try:
            from jax import export as jexport

            _register_export_serializations((state, batch, aux))
            blob_path = _train_export_blob_path(cfg, train_batch)
            if os.path.exists(blob_path):
                with open(blob_path, "rb") as fh:
                    restored = jexport.deserialize(fh.read())
                _note("train program restored from export blob "
                      "(host trace skipped)")
                call = jax.jit(restored.call, donate_argnums=(0,))
                lowered = call.lower(state, batch, aux, steps0)
                return {"state": state, "batch": batch, "lowered": lowered,
                        "via": "export-restore"}
            _note("tracing + exporting the train program (no blob for "
                  "these sources — host work, minutes at full geometry)")
            exported = jexport.export(
                run,
                disabled_checks=[jexport.DisabledSafetyCheck.custom_call(
                    "tpu_custom_call")],
            )(state, batch, aux, steps0)
            blob = exported.serialize()
            # the XLA compile cache creates this dir lazily at first
            # compile — don't rely on it existing yet
            os.makedirs(os.path.dirname(blob_path), exist_ok=True)
            tmp = blob_path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, blob_path)
            _note(f"train program exported for future runs "
                  f"({len(blob) / 1e6:.1f} MB)")
            # lower THROUGH the deserialized program, not `exported.call`:
            # the executable-cache key is computed from the jitted HLO, and
            # only serialize->deserialize->call is guaranteed to produce the
            # identical module on this run (which populates the cache) and
            # on every later run (which restores the blob and must HIT it)
            restored = jexport.deserialize(blob)
            call = jax.jit(restored.call, donate_argnums=(0,))
            lowered = call.lower(state, batch, aux, steps0)
            return {"state": state, "batch": batch, "lowered": lowered,
                    "via": "export-new"}
        except Exception as e:  # noqa: BLE001 — fall back to plain lowering
            _note(f"export path unavailable "
                  f"({type(e).__name__}: {str(e)[:120]}); lowering inline")

        lowered = run.lower(state, batch, aux, steps0)
        return {"state": state, "batch": batch, "lowered": lowered,
                "via": "inline"}
    except Exception as e:  # noqa: BLE001 — surfaced by bench_train_step
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def train_only() -> None:
    import jax

    _enable_compile_cache()

    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_pretrain
    from pangu_tpu.model import PanguModel

    cfg = pangu_pretrain(
        horizon=24,
        compute_dtype="bfloat16",
        matmul_precision="default",
        use_pallas_attention=jax.default_backend() == "tpu",
    )
    m = cfg.model
    # device_put ONCE: numpy aux (~66 MB) passed as a jit argument is
    # re-uploaded on EVERY call — seconds of per-call overhead and the
    # main source of paired-difference noise through the tunnel
    aux = jax.device_put(synthetic_aux_constants(m, cfg.train))
    model = PanguModel(m)
    upper, surface = _device_inputs(m)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), upper, surface, aux)
    value, extra = bench_train_step(cfg, model, aux, params, upper, surface)
    print(json.dumps({"train_step_time_s": round(value, 5),
                      "train_device_kind": jax.devices()[0].device_kind,
                      **{f"train_{k}": v for k, v in extra.items()}}),
          flush=True)


def bench_train_step(cfg, model, aux, params, upper, surface, progress=None,
                     prep=None, reserve=30.0, deadline=None,
                     train_batch=1):
    """Per-step wall time of the jitted train step (fwd+bwd+Adam) at full
    geometry, bf16 compute + per-block remat — loop-amortized like the
    forecast benchmark. ``train_batch`` is the samples-per-step of the
    given inputs (PANGU_BENCH_TRAIN_BATCH; per-step time scales with it,
    MFU is computed against batch-scaled FLOPs by the caller).

    ``prep``: result of :func:`_prelower_train`, optionally carrying a
    ``compiled`` executable from a warm probe. ``reserve``: seconds of
    overall budget to leave untouched by the timing loop (the forward
    phase runs after this one)."""
    import jax
    import jax.numpy as jnp

    if prep is None:
        prep = _prelower_train(
            cfg, _make_train_objects(cfg, model, aux, params, upper, surface),
            train_batch)
    if "error" in prep:
        raise RuntimeError(f"train pre-lowering failed: {prep['error']}")
    # pop: once the first call donates these buffers the prep dict's
    # reference is stale, and holding it pins nothing useful
    state, batch = prep.pop("state"), prep["batch"]
    if "compiled" in prep:
        # a warm probe already deserialized + loaded the executable
        compiled = prep.pop("compiled")
    else:
        _note("compile train (persistent-cache load, or a cold XLA compile "
              "— watch for the cache hit/miss line)")
        compiled = prep["lowered"].compile()

    def timed(k):
        nonlocal state
        t0 = time.perf_counter()
        state, s = compiled(state, batch, aux, jnp.asarray(k, jnp.int32))
        float(s)
        if progress is not None:
            # the forward phase reads its rollout params back out of here
            # (the original param buffers were donated into this state)
            progress["final_state"] = state
        return time.perf_counter() - t0

    k_short, k_long = 2, 8
    _note("warm train (single dynamic-length program)")
    state, s = compiled(state, batch, aux, jnp.asarray(1, jnp.int32))
    float(s)
    if progress is not None:
        progress["final_state"] = state
    _note("timing train")
    # Median of PAIRED (k_long - k_short) differences: with only a 6-step
    # gap, min-of-independent-reps differencing let one tunnel-latency
    # spike on the short run collapse the estimate to nonsense (a 65 ms
    # "train step" was observed against an ~850 ms device-busy profile).
    # _robust_step_time additionally falls back to the t(k_long)/k_long
    # upper bound when the tunnel is too sick for differencing (a -1.7 s
    # "reading" was observed during a chip-sharing storm).
    value, extra = _robust_step_time(
        timed, k_short, k_long,
        reps=int(os.environ.get("PANGU_BENCH_TRAIN_REPS", "4")),
        min_reps=2, reserve=reserve, progress=progress, deadline=deadline)

    # Paired profiled runs when budget allows: the artifact then carries
    # the per-step DEVICE-BUSY time next to the wall-clock number,
    # verifying in the artifact itself (round-4 verdict #4) that the
    # scan-carry timing bound is tight rather than relying on a doc. Same
    # two-length differencing as the wall methodology, read from the
    # "XLA Modules" lane (the executable's device execution spans; the ops
    # lane double-counts everything under the loop outline — measured
    # exactly 2x). v5e result: modules marginal 708.3 ms vs wall marginal
    # 708-711 ms — the loop adds ~0 device overhead per step and the wall
    # number IS the per-step device time.
    if (os.environ.get("PANGU_BENCH_PROFILE", "1") != "0"
            and _budget_remaining() - reserve > 75
            and (deadline is None or time.monotonic() < deadline - 60)):
        try:
            import shutil
            import tempfile

            from pangu_tpu.utils.profiling import trace_device_busy_split

            _note("profiling k=2 / k=8 train calls (device-busy accounting)")
            busy = {}
            for k in (2, 8):
                prof_dir = tempfile.mkdtemp(prefix=f"pangu_bench_prof{k}_")
                jax.profiler.start_trace(prof_dir)
                timed(k)
                jax.profiler.stop_trace()
                busy[k] = trace_device_busy_split(prof_dir)
                shutil.rmtree(prof_dir, ignore_errors=True)
            if busy[2] is not None and busy[8] is not None:
                m2 = busy[2]["modules_ms"] or busy[2]["ops_ms"]
                m8 = busy[8]["modules_ms"] or busy[8]["ops_ms"]
                marg = (m8 - m2) / 6.0
                extra["device_busy_ms"] = round(marg, 1)
                extra["device_busy_fixed_ms"] = round(m2 - 2.0 * marg, 1)
        except Exception as e:  # noqa: BLE001 — the profile is optional
            _note(f"device-busy profile skipped "
                  f"({type(e).__name__}: {str(e)[:100]})")
    return value, extra


if __name__ == "__main__":
    if "--train-only" in sys.argv:
        train_only()
    else:
        main()
