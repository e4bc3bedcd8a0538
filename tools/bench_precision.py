"""Eval precision-mode cost/accuracy table on the real chip.

The evaluate CLI defaults to ``--precision highest`` (full fp32 matmul
accumulation) for benchmark-grade checkpoint parity; ``--precision
fastest`` keeps the backend default (bf16 passes on the MXU). This tool
justifies that default with numbers: for each mode it measures the
test-mode forward time at the production 512x1024 / 12-iter protocol and
the flow delta against the 'highest' output — i.e. what 'fastest' costs
in EPE terms and buys in throughput. CPU runs are meaningless here (every
CPU matmul is f32), so this belongs to the hardware queue.

Prints one JSON line per mode:  python tools/bench_precision.py
"""

from __future__ import annotations

import json
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import timed_chain  # noqa: E402

H, W = 512, 1024
ITERS = 12


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from prior_flow_tpu.models import PriOrRAFT

    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1),
                              (1, H, W, 3)) * 255.0

    flows = {}
    for mode in ("highest", "fastest"):
        model = PriOrRAFT(mixed_precision=True,
                          precision=None if mode == "fastest" else mode)
        variables = model.init(rng, img1, img2, iters=1)
        flow = np.asarray(jax.jit(
            lambda v, a, b: model.apply(v, a, b, iters=ITERS,
                                        test_mode=True)
        )(variables, img1, img2))
        flows[mode] = flow
        ms = timed_chain(
            lambda v, a, b, s: model.apply(v, a + s * 1e-30, b, iters=ITERS,
                                           test_mode=True).sum(),
            variables, img1, img2, runs=12)
        rec = {"precision": mode, "forward_ms": round(ms, 1),
               "pairs_per_s": round(1000.0 / ms, 3)}
        if "highest" in flows and mode != "highest":
            ref = flows["highest"]
            epe_delta = np.linalg.norm(flow - ref, axis=-1)
            mag = np.linalg.norm(ref, axis=-1).mean()
            rec["epe_vs_highest_px"] = round(float(epe_delta.mean()), 4)
            rec["epe_vs_highest_rel"] = round(
                float(epe_delta.mean() / max(mag, 1e-6)), 4)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
