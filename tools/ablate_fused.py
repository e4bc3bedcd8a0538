"""Subtraction profile of the PRODUCTION forward (pallas DCCL path).

Times the 512x1024/12-iter test-mode forward with individual per-iteration
components no-op'd, attributing the wall-clock budget of the headline
benchmark. Each variant is one jit call amortised over several runs (the
axon tunnel adds ~8 ms per dispatch, so micro-benchmarks below ~10 ms are
meaningless — subtraction on the full graph is the only reliable signal).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

H, W = 512, 1024
ITERS = 12
REPEAT = 6


def build(variant: str):
    import prior_flow_tpu.models.prior_raft as PR
    from prior_flow_tpu.models import PriOrRAFT
    from prior_flow_tpu.ops import corr as C

    if variant == "no_dccl":
        def fake(self, cA, cB, pyrA, pyrB, *grids):
            B, h, w, _ = cA.shape
            z = jnp.zeros((B, h, w,
                           self.num_levels * (2 * self.radius + 1) ** 2),
                          jnp.float32)
            return z, z, z, z
        C.DCCLFused.__call__ = fake
    elif variant == "no_crosscoords":
        # cross-view taps become the (broadcast) window centres: removes the
        # sample_image_window_mxu einsums but keeps kernel + back-rotations
        def cheap(img, coords, radius):
            B, Q, _ = coords.shape
            n = 2 * radius + 1
            return jnp.broadcast_to(coords[:, :, None, :],
                                    (B, Q, n * n, 2))
        C.sample_image_window_mxu = cheap
    elif variant == "no_backrot":
        C.resample_static = lambda x, g: x
        C.is_static = lambda g: True
    elif variant == "no_flaw":
        PR.groupwise_corr = lambda f1, f2, num_groups: jnp.zeros(
            f1.shape[:3] + (num_groups,), jnp.float32)
        PR.cycle_bilinear_sample = lambda img, c: jnp.zeros(
            c.shape[:-1] + (img.shape[-1],), img.dtype)
    elif variant == "no_flo_rotate":
        PR.flo_rotate = lambda f, a, b: f
    elif variant == "no_upsample":
        def fake_up(flow, mask):
            B, h, w, _ = flow.shape
            return jnp.broadcast_to(
                (8.0 * flow)[:, :, None, :, None, :],
                (B, h, 8, w, 8, 2)).reshape(B, 8 * h, 8 * w, 2)
        PR.upsample_flow_convex = fake_up
    elif variant == "no_update":
        from prior_flow_tpu.nn import update as U
        def fake_oddc(self, net, inp, flow, corr, flaw, flow_BA, flaw_BA):
            B, h, w, _ = net.shape
            return (net, jnp.zeros((B, h, w, 576), jnp.float32),
                    jnp.zeros((B, h, w, 2), jnp.float32) + corr.mean() * 0)
        def fake_upd(self, net, inp, corr, flow):
            B, h, w, _ = net.shape
            return (net, jnp.zeros((B, h, w, 576), jnp.float32),
                    jnp.zeros((B, h, w, 2), jnp.float32) + corr.mean() * 0)
        U.BasicMultiUpdateBlock.__call__ = fake_oddc
        U.BasicUpdateBlock.__call__ = fake_upd
        PR.BasicMultiUpdateBlock.__call__ = fake_oddc
        PR.BasicUpdateBlock.__call__ = fake_upd

    model = PriOrRAFT(mixed_precision=True, lookup_mode="pallas")
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, H, W, 3)) * 255
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1), (1, H, W, 3)) * 255
    v = model.init(rng, img1, img2, iters=1)
    f = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=ITERS,
                                            test_mode=True).sum())
    return f, (v, img1, img2)


def run_variant(name):
    f, args = build(name)
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(REPEAT):
        out = f(*args)
    float(out)
    dt = (time.perf_counter() - t0) / REPEAT * 1000
    print(f"{name:18s} {dt:8.1f} ms", flush=True)
    return dt


if __name__ == "__main__":
    names = sys.argv[1:] or ["baseline", "no_dccl", "no_crosscoords",
                             "no_backrot", "no_flaw", "no_flo_rotate",
                             "no_upsample", "no_update"]
    for name in names:
        # fresh process per variant so monkeypatches don't stack
        if os.environ.get("_ABLATE_CHILD"):
            run_variant(name)
            break
        import subprocess
        env = dict(os.environ, _ABLATE_CHILD="1")
        subprocess.run([sys.executable, __file__, name], env=env)
