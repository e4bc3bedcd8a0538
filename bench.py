"""Headline benchmark: panoramic frame-pairs/sec, 512x1024, 12 GRU iters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference publishes no throughput numbers. REF_FPS_RTX3090 is
a documented literature-derived estimate with a 4-8 pairs/s uncertainty
band (see BASELINE.md "Baseline methodology"): RAFT's published 10 FPS @
1024x440 on a 1080 Ti, scaled by a 3090's ~2.2x advantage, the 1.16x
pixel-count increase to 512x1024, and the ~3x cost of PriOr-RAFT over
single-branch RAFT. ``vs_baseline`` uses the 6.0 point estimate;
``vs_baseline_band`` spans the 4-8 band so the JSON does not overstate the
estimate's precision. A same-host CPU anchor is recorded in BASELINE.md
(tools/bench_reference_cpu.py).

MFU is computed from the COMPILED graph's own cost analysis (XLA flop
count / wall clock / chip peak), not a hand-estimated flop count.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

REF_FPS_RTX3090 = 6.0   # derived point estimate (BASELINE.md)
REF_FPS_BAND = (4.0, 8.0)

H, W = 512, 1024
ITERS = 12
WARMUP = 2
RUNS = 12
BATCH_THROUGHPUT = 4  # secondary serving-throughput measurement

V5E_PEAK_BF16_TFLOPS = 197.0

# DCCL-lookup speed-of-light composite at THIS config (512x1024, 12
# iters): op counts from tools/roofline_model.py (9.06 G gather / 21.14 G
# select / 14.09 G fma / 12,288 grid steps per forward) divided by v5e
# hardware peaks (crossbar ~0.96 T elem/s, VPU ALU 3.85 T, 0.162 us/step
# measured by tools/microbench_vpu_anchor.py) -> 20.6 ms; the kernel's
# measured per-level lookup total is 56.1 ms (docs/ARCHITECTURE.md §7).
# MFU is the wrong lens for this gather/select-bound model; these fields
# carry the binding-resource denominator instead.
DCCL_SOL_MS = 20.6
DCCL_MEASURED_MS = 56.1

# Timeout-proofing: if the driver's `timeout` SIGTERMs us mid-compile
# (a cold XLA+Mosaic cache costs tens of minutes), still emit ONE JSON
# line — the last completed run's record (flagged "stale") or an explicit
# compiling marker — instead of dying with no parseable output.
LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_last.json")
_best: dict = {}


def _emit_and_exit(signum, frame):
    if _best.get("done"):
        # the sustained record already printed — a late SIGTERM must not
        # emit a second (mislabelled) JSON line
        os._exit(0)
    rec = dict(_best)
    if not rec:
        try:
            with open(LAST_GOOD) as f:
                rec = json.load(f)
            rec["stale"] = True
        except Exception:
            rec = {"metric": f"frame-pairs/sec @ {H}x{W}, {ITERS} GRU "
                             "iters, bf16, 1 chip, sustained",
                   "value": None, "unit": "pairs/s", "compiling": True}
    rec["interrupted"] = True
    print(json.dumps(rec), flush=True)
    os._exit(0)


def main():
    global T_START
    T_START = time.perf_counter()
    signal.signal(signal.SIGTERM, _emit_and_exit)
    import jax
    try:  # persistent compile cache: driver re-runs skip the long compile
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from prior_flow_tpu.models import PriOrRAFT

    # the production default: lookup_mode='auto' resolves to the fused
    # Pallas kernel on TPU — bench measures exactly what the CLIs run
    model = PriOrRAFT(mixed_precision=True)
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1), (1, H, W, 3)) * 255.0
    variables = model.init(rng, img1, img2, iters=1)

    # AOT compile once (also yields the XLA flop count for a MEASURED MFU).
    # The scalar 4th arg (scaled to numerical irrelevance) lets throughput
    # runs CHAIN on-device: each forward consumes the previous result, so
    # one final fetch proves all K completed while dispatches overlap the
    # device — measuring sustained serving throughput rather than one
    # tunnel round-trip per frame.
    fwd = jax.jit(lambda v, a, b, s: model.apply(v, a + s * 1e-30, b,
                                                 iters=ITERS,
                                                 test_mode=True).sum())
    zero = 0.0
    print("compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    compiled = fwd.lower(variables, img1, img2, zero).compile()
    print(f"compiled in {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # reduce on device, fetch the scalar: forces real completion even
    # through async device tunnels where block_until_ready returns early
    for _ in range(WARMUP):
        float(compiled(variables, img1, img2, zero))

    # single-frame latency: synchronous round trips (includes the host
    # dispatch / tunnel overhead a lone request pays)
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        out = compiled(variables, img1, img2, zero)
        _ = float(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    p90 = times[int(len(times) * 0.9)]
    # first measurement milestone: a SIGTERM from here on reports latency
    _best.update({
        "metric": f"frame-pairs/sec @ {H}x{W}, {ITERS} GRU iters, bf16, "
                  "1 chip, latency-bound (sustained run interrupted)",
        "value": round(1.0 / p50, 3), "unit": "pairs/s",
        "vs_baseline": round(1.0 / p50 / REF_FPS_RTX3090, 2),
        "latency_p50_ms": round(p50 * 1e3, 1),
    })

    # sustained throughput: K chained forwards, one fetch
    t0 = time.perf_counter()
    out = 0.0
    for _ in range(RUNS):
        out = compiled(variables, img1, img2, out)
    _ = float(out)
    per = (time.perf_counter() - t0) / RUNS

    fps = 1.0 / per
    rec = {
        "metric": f"frame-pairs/sec @ {H}x{W}, {ITERS} GRU iters, bf16, "
                  "1 chip, sustained",
        "value": round(fps, 3),
        "unit": "pairs/s",
        "vs_baseline": round(fps / REF_FPS_RTX3090, 2),
        "vs_baseline_band": [round(fps / REF_FPS_BAND[1], 2),
                             round(fps / REF_FPS_BAND[0], 2)],
        "device_ms_per_pair": round(per * 1e3, 1),
        "latency_p50_ms": round(p50 * 1e3, 1),
        "latency_p90_ms": round(p90 * 1e3, 1),
        "baseline_note": "RTX3090 est 6.0 pairs/s, band 4-8 (BASELINE.md)",
    }
    if flops:
        rec["tflop_per_pair"] = round(flops / 1e12, 3)
        rec["mfu"] = round(flops * fps / (V5E_PEAK_BF16_TFLOPS * 1e12), 4)
    if (H, W, ITERS) == (512, 1024, 12):
        # binding-resource roofline (ARCHITECTURE §7): the model is
        # VPU-bound in its DCCL lookup, not MXU-bound — mfu understates it
        rec["binding_resource"] = "vpu (gather+select network)"
        rec["dccl_sol_ms"] = DCCL_SOL_MS
        rec["dccl_measured_ms"] = DCCL_MEASURED_MS
        rec["dccl_x_of_sol"] = round(DCCL_MEASURED_MS / DCCL_SOL_MS, 2)

    # The sustained measurement is complete: make it the SIGTERM record and
    # the stale fallback NOW, before the batch-4 secondary risks a cold
    # compile of a second graph — a SIGTERM there must report this result,
    # not the latency-bound partial (the BENCH_r02 rc=124 failure mode).
    _best.clear()
    _best.update(rec)
    if (H, W, ITERS) == (512, 1024, 12):
        try:
            with open(LAST_GOOD, "w") as f:
                json.dump(rec, f)
        except Exception:
            pass

    # Secondary: batched serving throughput (pairs/s at batch 4). Batching
    # amortises per-op dispatch and feeds the MXU larger contractions; the
    # headline stays batch 1 (the reference protocol is single-pair,
    # demo.py:15-19 / evaluate.py batch 1). Only attempted when enough of
    # the timeout budget remains — a cold-cache driver run must never spend
    # it on a second graph (round-2 lesson, BENCH_r02 rc=124; the round-3
    # driver run tripped the old 300 s guard and lost the batch-4 key, so
    # the builder pre-warms BOTH graphs at end of round and the guard now
    # only needs to exclude the genuinely-cold case).
    elapsed = time.perf_counter() - T_START
    if elapsed < 450:
        try:
            imgs1 = jax.numpy.tile(img1, (BATCH_THROUGHPUT, 1, 1, 1))
            imgs2 = jax.numpy.tile(img2, (BATCH_THROUGHPUT, 1, 1, 1))
            cb = fwd.lower(variables, imgs1, imgs2, zero).compile()
            for _ in range(WARMUP):
                float(cb(variables, imgs1, imgs2, zero))
            t0 = time.perf_counter()
            outb = 0.0
            for _ in range(RUNS):
                outb = cb(variables, imgs1, imgs2, outb)
            _ = float(outb)
            perb = (time.perf_counter() - t0) / RUNS / BATCH_THROUGHPUT
            rec[f"batch{BATCH_THROUGHPUT}_pairs_per_s"] = round(1.0 / perb, 3)
            rec[f"batch{BATCH_THROUGHPUT}_ms_per_pair"] = round(perb * 1e3, 1)
        except Exception as e:
            # OOM or tunnel hiccup: the primary record stands alone, but
            # the artifact must say WHY the batch key is absent
            # (BENCH_r03/r04 both lost it silently)
            rec[f"batch{BATCH_THROUGHPUT}_error"] = repr(e)[:300]
    else:
        rec[f"batch{BATCH_THROUGHPUT}_skipped"] = (
            f"time budget: {elapsed:.0f}s elapsed >= 450s guard "
            "(cold compile run — the secondary must not eat the timeout)")
    _best["done"] = True
    if (H, W, ITERS) == (512, 1024, 12):
        # refresh the stale fallback with the secondary's batch keys
        # (only a production-config record may serve as the fallback —
        # tiny-shape smoke tests must not clobber it)
        try:
            with open(LAST_GOOD, "w") as f:
                json.dump(rec, f)
        except Exception:
            pass
    print(json.dumps(rec))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the contract is ONE JSON line
        if not _best.get("done"):
            # device/tunnel failures must still yield a parseable record
            # (value null + the error), not a bare traceback
            rec = {"metric": f"frame-pairs/sec @ {H}x{W}, {ITERS} GRU "
                             "iters, bf16, 1 chip, sustained",
                   "value": None, "unit": "pairs/s",
                   "error": f"{type(e).__name__}: {e}"}
            try:
                with open(LAST_GOOD) as f:
                    rec.update({k: v for k, v in json.load(f).items()
                                if k not in rec})
                    rec["stale"] = True
            except Exception:
                pass
            print(json.dumps(rec), flush=True)
        raise SystemExit(1)
