"""Shared on-chip timing helper for the microbenchmark tools.

One definition of the scan-chained timing method (and of the tunnel
dispatch constant) so a recalibration cannot leave the tools silently
disagreeing.

Method: the measured body runs N times inside one jitted ``lax.scan``
whose carry perturbs the next iteration's input by a numerically
irrelevant amount — the compiler cannot hoist or dedupe the body, and one
device round-trip covers all N iterations. The axon tunnel's ~8 ms
per-dispatch overhead is subtracted from the per-call figure.
"""

import time

import jax
import jax.numpy as jnp

N = 24             # in-jit repetitions per dispatch
REPS = 3           # dispatches averaged
DISPATCH_MS = 8.0  # measured axon-tunnel round-trip to subtract


def timed_chain(fn, *args, runs=24):
    """Per-call wall ms of ``fn(*args, carry)`` over ``runs`` chained calls.

    ``fn`` must accept a trailing scalar carry and return a scalar; each
    dispatch consumes the previous result, so dispatches overlap the device
    while one final fetch proves all completed (the bench.py sustained
    method). Includes jit + one warm call.
    """
    import jax

    f = jax.jit(fn)
    # warm with a STRONG-typed f32 scalar: the loop feeds each call's
    # strong f32 result back in, and a weak-typed 0.0 warm call would
    # leave the strong-typed signature uncompiled — the first timed call
    # then recompiles inside the measured region (a ~30 s model compile
    # smeared over `runs`; the round-3 sweep's 46x-inflated forward_ms)
    out = jnp.zeros((), jnp.float32)
    float(f(*args, out))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(runs):
        out = f(*args, out)
    float(out)
    return (time.perf_counter() - t0) / runs * 1e3


def timed_scan(fn, *args, n=N, reps=REPS, dispatch_ms=DISPATCH_MS):
    """Per-call device ms of ``fn(*args, carry)`` via in-jit ``lax.scan``.

    Same call contract as ``timed_chain`` (trailing scalar carry, scalar
    return) but all ``n`` repetitions run inside ONE dispatch — required
    whenever ``args`` hold large arrays: the axon tunnel re-ships
    per-dispatch arguments, so call chaining measures tunnel bandwidth,
    not the kernel (a level-0 DCCL call: 1.6 ms in-jit vs ~180 ms
    chained, 2026-08-18).
    """
    def run(*a):
        def scan_fn(c, _):
            return fn(*a, c), None

        c, _ = jax.lax.scan(scan_fn, 0.0, None, length=n)
        return c

    jfn = jax.jit(run)
    float(jfn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = 0.0
    for _ in range(reps):
        out = jfn(*args)
    float(out)
    total_ms = (time.perf_counter() - t0) / reps * 1e3
    return max(total_ms - dispatch_ms, 0.0) / n


def timeit(name, body, *args, n=N, reps=REPS, dispatch_ms=DISPATCH_MS):
    """Print and return the per-iteration device time of ``body`` in ms.

    ``body(carry, *args)`` must return an array; its first element is
    folded (x1e-20) into the next iteration's carry.
    """
    def run(*a):
        def scan_fn(c, _):
            out = body(c, *a)
            return out.ravel()[0].astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(scan_fn, 0.0, None, length=n)
        return c

    jfn = jax.jit(run)
    float(jfn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    float(out)
    total = (time.perf_counter() - t0) / reps
    per = (total * 1000 - dispatch_ms) / n
    print(f"{name:44s} {per:8.3f} ms/iter", flush=True)
    return per
