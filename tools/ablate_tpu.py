"""Ablation timing: monkeypatch individual per-iteration components of the
PriOr-RAFT step to no-ops and measure the 512x1024/12-iter forward, to
attribute the per-iteration wall-clock budget on TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import prior_flow_tpu.models.prior_raft as PR
from prior_flow_tpu.models import PriOrRAFT

H, W = 512, 1024
ITERS = 12

_orig = dict(
    dccl_call=PR.DCCL.__call__,
    flo_rotate=PR.flo_rotate,
    groupwise=PR.groupwise_corr,
    upsample=PR.upsample_flow_convex,
    cbs=PR.cycle_bilinear_sample,
)


def restore():
    PR.DCCL.__call__ = _orig["dccl_call"]
    PR.flo_rotate = _orig["flo_rotate"]
    PR.groupwise_corr = _orig["groupwise"]
    PR.upsample_flow_convex = _orig["upsample"]
    PR.cycle_bilinear_sample = _orig["cbs"]


def ablate(name):
    restore()
    if name == "dccl":
        def fake(self, coords, pyr_own, pyr_other, g1, g2):
            B, h, w, _ = coords.shape
            z = jnp.zeros((B, h, w, self.num_levels * (2 * self.radius + 1) ** 2),
                          jnp.float32)
            return z, z
        PR.DCCL.__call__ = fake
    elif name == "flo_rotate":
        PR.flo_rotate = lambda f, a, b: f
    elif name == "flaw":
        PR.groupwise_corr = lambda f1, f2, num_groups: jnp.zeros(
            f1.shape[:3] + (num_groups,), jnp.float32)
    elif name == "upsample":
        def fake_up(flow, mask):
            B, h, w, _ = flow.shape
            return jnp.broadcast_to(
                (8.0 * flow)[:, :, None, :, None, :],
                (B, h, 8, w, 8, 2)).reshape(B, 8 * h, 8 * w, 2)
        PR.upsample_flow_convex = fake_up
    elif name == "warp_gather":
        # the flaw warps' 256-ch gathers
        PR.cycle_bilinear_sample = lambda img, c, mask=False: (
            jnp.zeros(c.shape[:-1] + (img.shape[-1],), img.dtype))


def run(label):
    model = PriOrRAFT(mixed_precision=True)
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, H, W, 3)) * 255
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1), (1, H, W, 3)) * 255
    v = model.init(rng, img1, img2, iters=1)
    f = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=ITERS,
                                            test_mode=True).sum())
    float(f(v, img1, img2))
    t0 = time.perf_counter()
    for _ in range(4):
        out = f(v, img1, img2)
    float(out)
    dt = (time.perf_counter() - t0) / 4 * 1000
    print(f"{label:16s} {dt:8.1f} ms", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["baseline", "dccl", "flo_rotate", "flaw",
                             "upsample", "warp_gather"]
    for name in which:
        if name != "baseline":
            ablate(name)
        else:
            restore()
        run(name)
        restore()
