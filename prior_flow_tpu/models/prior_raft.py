"""PriOr-RAFT: dual-branch recurrent panoramic optical-flow model.

TPU-native rebuild of the reference model (PriOr-RAFT/core/prior_raft.py).
Key architectural departures from the PyTorch original — all TPU-first,
none behaviour-changing:

- NHWC layout everywhere; convs hit the MXU without layout transposes.
- The 12-iteration GRU loop is a ``jax.lax.scan`` (flat compile time,
  per-iteration rematerialisation for backward memory) instead of an
  unrolled Python loop.
- All eight spherical rotation grids are precomputed host-side constants
  (geometry.grids) — the reference rebuilds them on-device every forward
  call (core/prior_raft.py:115-125).
- Mixed precision is bfloat16 compute (no loss scaling needed), while the
  correlation volume, its lookups, and the flaw maps stay float32 — the
  same split the reference's autocast regions produce
  (core/prior_raft.py:134-188).

Forward contract (core/prior_raft.py:107-215): inputs are uint8-range RGB
images (B, H, W, 3) in [0, 255]; ``test_mode`` returns the final upsampled
branch-A flow (B, H, W, 2); otherwise both branches' per-iteration
predictions are returned stacked as (iters, B, H, W, 2).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..geometry import grids as gridlib
from ..nn.encoder import BasicEncoder
from ..nn.update import BasicMultiUpdateBlock, BasicUpdateBlock
from ..ops.corr import (DCCL, DCCLFused, DCCLOnTheFly, all_pairs_correlation,
                        build_pyramid, groupwise_corr)
from ..ops.samplers import cycle_bilinear_sample
from ..ops.warp import flo_rotate, img_rotate


class StepConsts(NamedTuple):
    """Loop-invariant inputs broadcast (not scanned) into every GRU step."""

    inp_A: jnp.ndarray
    inp_B: jnp.ndarray
    fmap1_A: jnp.ndarray
    fmap2_A: jnp.ndarray
    pyr_A: Tuple[jnp.ndarray, ...]
    pyr_B: Tuple[jnp.ndarray, ...]
    coords0: jnp.ndarray
    # NOTE: the rotation grids are deliberately NOT consts — _step re-derives
    # them from the host cache so they stay compile-time constants inside the
    # scan body (required for the scatter-free static resampler)


def upsample_flow_convex(flow, mask):
    """Convex-combination 8x flow upsampling (core/prior_raft.py:58-67).

    flow: (B, h, w, 2); mask: (B, h, w, 576) ordered (9, 8, 8) channel-major
    exactly like the torch ``view(N, 1, 9, 8, 8, H, W)``.
    """
    B, h, w, C = flow.shape
    # (9, 8, 8) channel-major == reshape to (9, 64) with k on its own axis
    m = mask.reshape(B * h * w, 9, 64)
    m = jax.nn.softmax(m, axis=1)
    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighbourhoods in F.unfold order: k = ky*3 + kx
    neigh = jnp.stack(
        [fp[:, ky:ky + h, kx:kx + w, :] for ky in range(3) for kx in range(3)],
        axis=3,
    ).reshape(B * h * w, 9, C)
    # batched (C, 9) x (9, 64) dot: contracting over the 9 taps with the
    # subpixel positions on the output axis keeps every operand 3-D and
    # lane-tileable — the 6-D einsum formulation of this op costs 17.9 ms
    # fwd+bwd at B=4 vs 2.1 ms for this one (tools/microbench_upsample.py)
    up = jax.lax.dot_general(
        neigh.astype(jnp.float32), m.astype(jnp.float32),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (BHW, C, 64)
    # (B, h, w, c, i, j) -> (B, h, i, w, j, c) -> (B, 8h, 8w, c)
    up = up.reshape(B, h, w, C, 8, 8).transpose(0, 1, 4, 2, 5, 3)
    return up.reshape(B, 8 * h, 8 * w, C).astype(f.dtype)


@jax.custom_vjp
def _tape_probe(c, z):
    """Identity on ``c``; ``z`` is a dead operand whose COTANGENT carries
    the corr-field gradient out of the GRU scan (d(z) == d(c + z) == g).

    Equivalent to ``c + z`` with z == 0, but the zero tape's primal value
    is never read, so XLA DCEs both the (iters, B, h8, w8, L*K) zeros
    buffer and the ~1 GB/forward of add traffic it would cost."""
    return c


def _tape_probe_fwd(c, z):
    return c, None


def _tape_probe_bwd(_, g):
    return (g, g)


_tape_probe.defvjp(_tape_probe_fwd, _tape_probe_bwd)


def build_packed_pyramids(fmap1, fmap2, num_levels: int = 4,
                          dtype=jnp.float32):
    """One branch's kernel-packed correlation pyramid, differentiably.

    ``build_pyramid_lean`` (chunked MXU build — never materialises the
    full f32 volume; its chunk loop is a plain unrolled Python loop, so
    the whole build is reverse-differentiable) followed by
    ``pack_volume`` per level. Used by the taped training path, whose
    manual VJP composition pulls the deferred scatter's volume cotangents
    back through this function to the feature maps."""
    from ..ops.corr import build_pyramid_lean
    from ..ops.pallas.dccl_gather import pack_volume

    pyr = build_pyramid_lean(fmap1, fmap2, num_levels, dtype)
    return tuple(pack_volume(p) for p in pyr)


class PriOrRAFT(nn.Module):
    """Dual-branch RAFT with Dual-Cost Collaborative Lookup and
    Ortho-Driven Distortion Compensation (reference core/prior_raft.py:27)."""

    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    dropout: float = 0.0
    mixed_precision: bool = False
    bn_running_average: bool = True  # freeze_bn semantics (prior_raft.py:43-48)
    remat: bool = True
    # 'dccl' = save only the DCCL lookup results (lowest memory);
    # 'dots' = save all conv/matmul results (fastest backward that fits)
    remat_policy: str = "dccl"
    # XLA matmul/conv precision: None = backend default (fastest on TPU),
    # 'highest' = full fp32 accumulation (checkpoint-parity mode).
    precision: Optional[str] = None
    # DCCL lookup implementation: 'auto' resolves to the fused Pallas
    # kernel on TPU and the one-hot-matmul path elsewhere, so every
    # production surface (CLIs, entry(), bench) runs the fast path by
    # default; explicit 'mxu' / 'pallas' / 'gather' override.
    lookup_mode: str = "auto"
    # 'volume' materialises the O((HW/64)^2) cost volume once (fastest for
    # iterative lookups); 'onthefly' evaluates correlation per tap from the
    # pooled feature pyramid — O(HW*C) memory, the alt_cuda_corr capability
    # (reference core/corr.py:64-91) for resolutions whose volume exceeds
    # HBM.
    corr_mode: str = "volume"
    # Deferred volume gradients (training only): record every iteration's
    # lookup in a no-grad pass, re-bind the taps to the volumes through ONE
    # stacked-scatter custom VJP (ops/pallas/dccl_gather.py::
    # dccl_deferred_rebind), and replay the GRU scan with the taps as
    # scanned inputs. Mathematically identical gradients (the lookup is
    # linear in the volume and coords are stop_gradiented each iteration);
    # turns 12 accumulated volume-shaped scatters per branch/level into
    # one. Requires the DCCLFused volume path with static rotation grids.
    deferred_vol_grad: bool = False

    def setup(self):
        dtype = jnp.bfloat16 if self.mixed_precision else None
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=self.dropout, dtype=dtype)
        self.cnet = BasicEncoder(output_dim=self.hidden_dim + self.context_dim,
                                 norm_fn="batch", dropout=self.dropout,
                                 use_running_average=self.bn_running_average,
                                 dtype=dtype)
        self.ODDC = BasicMultiUpdateBlock(hidden_dim=self.hidden_dim, dtype=dtype)
        self.update_block = BasicUpdateBlock(hidden_dim=self.hidden_dim, dtype=dtype)
        mode = self.lookup_mode
        if mode == "auto":
            mode = "pallas" if jax.default_backend() == "tpu" else "mxu"
        if self.corr_mode == "onthefly":
            self._dccl = DCCLOnTheFly(num_levels=self.corr_levels,
                                      radius=self.corr_radius)
        elif mode == "pallas":
            # fused both-branch lookup: each level volume read once per
            # iteration by the gather kernel (ops/pallas/dccl_gather.py)
            self._dccl = DCCLFused(num_levels=self.corr_levels,
                                   radius=self.corr_radius)
        else:
            self._dccl = DCCL(num_levels=self.corr_levels,
                              radius=self.corr_radius,
                              lookup_mode=mode)

    # -- one GRU iteration (reference core/prior_raft.py:170-211) ----------
    def _step_core(self, carry, consts: StepConsts, taps=None,
                   record: bool = False, z=None):
        """Shared iteration body; returns the new carry plus the two
        upsample masks (upsampling itself is the caller's choice — the
        test-mode scan defers it to after the loop).

        ``taps``/``record`` drive the deferred volume-gradient path
        (see ``_forward``): with ``record=True`` the DCCL lookup runs
        primal-only and the step additionally returns the scatter tape;
        with ``taps=(corr_A, corr_B)`` the lookup is skipped entirely and
        the provided (rebound) taps are consumed instead."""
        net_A, net_B, coords1_A, coords1_B = carry
        c = consts

        # The rotation grids are pure functions of (H, W): re-derive the
        # HOST-cached numpy constants here rather than reading the traced
        # StepConsts copies — static grids let flo_rotate and the DCCL
        # back-rotations use the transpose-plan resampler, whose backward
        # is a gather instead of an XLA scatter (ops/static_resample.py).
        B, h8, w8, _ = coords1_A.shape
        g8 = gridlib.rotation_grids(h8 * 8, w8 * 8)

        coords1_A = jax.lax.stop_gradient(coords1_A)
        flow_A = coords1_A - c.coords0
        warped_fmap2_A = cycle_bilinear_sample(c.fmap2_A, coords1_A)
        flaw_A = groupwise_corr(c.fmap1_A, warped_fmap2_A, num_groups=4)

        coords1_B = jax.lax.stop_gradient(coords1_B)
        flow_B = coords1_B - c.coords0

        flow_B_A = flo_rotate(flow_B, g8.b2a_w2c_8, g8.b2a_8)
        coords1_B_A = c.coords0 + flow_B_A
        warped_fmap2_B_A = cycle_bilinear_sample(c.fmap2_A, coords1_B_A)
        flaw_B_A = groupwise_corr(c.fmap1_A, warped_fmap2_B_A, num_groups=4)

        tape = None
        if taps is not None:
            # deferred replay: the rebound taps ARE the summed own+cross
            # fields — no lookup runs inside this scan at all (the scan
            # saves its xs, so no checkpoint_name is needed either)
            corr_A, corr_B = taps
        elif record:
            (corr_A, corr_B), cens = self._dccl.record(
                coords1_A, coords1_B, c.pyr_A, c.pyr_B,
                g8.a2b_w2c_8, g8.b2a_w2c_8, g8.a2b_8, g8.b2a_8)
            if z is not None:
                # taped single-forward path: the record lookup is a
                # constant (all inputs stop_gradiented), the zero tape z
                # carries the gradient channel — its cotangent IS this
                # iteration's summed-field cotangent, collected stacked by
                # the scan backward (train/trainer.py::_taped_grads)
                corr_A = checkpoint_name(_tape_probe(corr_A, z[0]),
                                         "dccl_corr")
                corr_B = checkpoint_name(_tape_probe(corr_B, z[1]),
                                         "dccl_corr")
                tape = cens
            else:
                tape = ((corr_A, corr_B), cens)
        else:
            if isinstance(self._dccl, DCCLFused):
                corr_A, corr_B_A, corr_B, corr_A_B = self._dccl(
                    coords1_A, coords1_B, c.pyr_A, c.pyr_B,
                    g8.a2b_w2c_8, g8.b2a_w2c_8, g8.a2b_8, g8.b2a_8)
            else:
                corr_A, corr_B_A = self._dccl(coords1_A, c.pyr_A, c.pyr_B,
                                              g8.a2b_w2c_8, g8.b2a_8)
                corr_B, corr_A_B = self._dccl(coords1_B, c.pyr_B, c.pyr_A,
                                              g8.b2a_w2c_8, g8.a2b_8)
            # name the lookup results so the remat policy keeps them: DCCL
            # is ~80% of forward time (docs/ARCHITECTURE.md §3) and its
            # inputs are stop_gradiented coords, so saving ~85 MB/iteration
            # avoids the most expensive recomputation in the backward pass
            corr_A = checkpoint_name(corr_A + corr_B_A, "dccl_corr")
            corr_B = checkpoint_name(corr_B + corr_A_B, "dccl_corr")

        net_A, up_mask_A, delta_flow_A = self.ODDC(
            net_A, c.inp_A, flow_A, corr_A, flaw_A, flow_B_A, flaw_B_A)
        net_B, up_mask_B, delta_flow_B = self.update_block(
            net_B, c.inp_B, corr_B, flow_B)

        coords1_A = coords1_A + delta_flow_A
        coords1_B = coords1_B + delta_flow_B

        return ((net_A, net_B, coords1_A, coords1_B),
                (up_mask_A, up_mask_B), tape)

    def _step(self, carry, consts: StepConsts):
        """Training/eval step: per-iteration convex upsampling of both
        branches (the reference appends both upsampled predictions every
        iteration, core/prior_raft.py:199-211)."""
        carry, (up_mask_A, up_mask_B), _ = self._step_core(carry, consts)
        _, _, coords1_A, coords1_B = carry
        flow_up_A = upsample_flow_convex(coords1_A - consts.coords0, up_mask_A)
        flow_up_B = upsample_flow_convex(coords1_B - consts.coords0, up_mask_B)
        return carry, (flow_up_A, flow_up_B)

    def _step_record(self, carry, consts: StepConsts):
        """Deferred-path recording step: identical recurrence through a
        primal-only lookup; ys are the scatter tape (the summed corr
        fields and the query coords — cross tap coords are recomputed in
        the rebind backward, not taped). The upsample masks are dead here
        — XLA DCEs both mask heads."""
        carry, _, tape = self._step_core(carry, consts, record=True)
        return carry, tape

    def _step_replay(self, carry, taps, consts: StepConsts):
        """Deferred-path differentiable step: consumes one iteration's
        rebound taps (scanned xs) instead of running the lookup."""
        carry, (up_mask_A, up_mask_B), _ = self._step_core(
            carry, consts, taps=taps)
        _, _, coords1_A, coords1_B = carry
        flow_up_A = upsample_flow_convex(coords1_A - consts.coords0, up_mask_A)
        flow_up_B = upsample_flow_convex(coords1_B - consts.coords0, up_mask_B)
        return carry, (flow_up_A, flow_up_B)

    def _step_taped(self, carry, z, consts: StepConsts):
        """Single-forward taped step (see train/trainer.py::_taped_grads):
        the standard differentiable recurrence, except the DCCL lookup runs
        primal-only (record mode) and the scanned zero tape ``z`` is added
        to the summed corr fields so the scan backward emits the stacked
        per-iteration corr cotangents as d(z). ys additionally carry the
        (stop_gradiented) query centres the deferred scatter needs."""
        carry, (up_mask_A, up_mask_B), (cqA, cqB) = self._step_core(
            carry, consts, record=True, z=z)
        _, _, coords1_A, coords1_B = carry
        flow_up_A = upsample_flow_convex(coords1_A - consts.coords0, up_mask_A)
        flow_up_B = upsample_flow_convex(coords1_B - consts.coords0, up_mask_B)
        return carry, (flow_up_A, flow_up_B, cqA, cqB)

    def _step_test(self, carry, consts: StepConsts):
        """Inference step: identical recurrence, but only branch A's LAST
        upsample mask is kept (in the carry) and nothing is upsampled
        inside the loop — the final 8x upsample runs ONCE after the scan.
        Output-equivalent to ``_step`` + taking the last A prediction
        (test_mode, core/prior_raft.py:212-213) with 12x less upsample work
        and no (iters, B, H, W, 2) prediction stacks; branch B's dead mask
        head is DCE'd by XLA."""
        core, (up_mask_A, _), _ = self._step_core(carry[:4], consts)
        return core + (up_mask_A,), ()

    def __call__(self, image1, image2, iters: int = 12,
                 init_flow: Optional[jnp.ndarray] = None,
                 test_mode: bool = False, train: bool = False):
        if self.precision is not None:
            with jax.default_matmul_precision(self.precision):
                return self._forward(image1, image2, iters, init_flow,
                                     test_mode, train)
        return self._forward(image1, image2, iters, init_flow, test_mode, train)

    def encode(self, image1, image2, train: bool = False):
        """Image normalisation + orthogonal view + context/feature encoders
        (prior_raft.py:109-149). Split out of ``_forward`` so the taped
        training path (train/trainer.py::_taped_grads) can VJP the encoder
        stage separately from the GRU scan.

        Returns ``(net_A, net_B, inp_A, inp_B, fmaps)`` with fmaps the
        float32 4-tuple (fmap1_A, fmap2_A, fmap1_B, fmap2_B)."""
        H, W = image1.shape[1:3]
        a2b = jnp.asarray(gridlib.rotation_grids(H, W).a2b)

        # normalise to [-1, 1] (prior_raft.py:109-110)
        image1_A = 2.0 * (image1 / 255.0) - 1.0
        image2_A = 2.0 * (image2 / 255.0) - 1.0

        # orthogonal view (prior_raft.py:127-129)
        stacked = jnp.concatenate([image1_A, image2_A], axis=-1)
        rotated = img_rotate(stacked, a2b)
        image1_B, image2_B = rotated[..., :3], rotated[..., 3:]

        # context network (prior_raft.py:134-142)
        cnet_A, cnet_B = self.cnet([image1_A, image1_B], train=train)
        net_A = jnp.tanh(cnet_A[..., : self.hidden_dim])
        inp_A = nn.relu(cnet_A[..., self.hidden_dim:])
        net_B = jnp.tanh(cnet_B[..., : self.hidden_dim])
        inp_B = nn.relu(cnet_B[..., self.hidden_dim:])

        # feature network (prior_raft.py:144-149); float32 for correlation
        fmaps = self.fnet([image1_A, image2_A, image1_B, image2_B], train=train)
        return (net_A, net_B, inp_A, inp_B,
                tuple(f.astype(jnp.float32) for f in fmaps))

    def _forward(self, image1, image2, iters, init_flow, test_mode, train):
        B, H, W, _ = image1.shape
        g = gridlib.rotation_grids(H, W)

        net_A, net_B, inp_A, inp_B, fmaps = self.encode(image1, image2, train)
        fmap1_A, fmap2_A, fmap1_B, fmap2_B = fmaps

        # all-pairs cost volumes + pyramids (prior_raft.py:151-159).
        # With mixed precision the pyramid is STORED in bf16 (halved HBM
        # traffic for every per-iteration lookup) while lookups accumulate
        # in f32; full-precision mode keeps f32 storage for parity.
        corr_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32
        use_deferred = (self.deferred_vol_grad and not test_mode
                        and isinstance(self._dccl, DCCLFused)
                        and self.corr_mode != "onthefly")
        if self.corr_mode == "onthefly":
            pyr_A = tuple(DCCLOnTheFly.build_pyramid(fmap1_A, fmap2_A,
                                                     self.corr_levels))
            pyr_B = tuple(DCCLOnTheFly.build_pyramid(fmap1_B, fmap2_B,
                                                     self.corr_levels))
        elif H * W // 64 > 16384 or (use_deferred
                                     and corr_dtype == jnp.bfloat16):
            # large volumes (above 724x1448-class shapes): chunked build —
            # the dense f32 volume + f32 pyramid would exceed HBM before
            # the bf16 cast (ops/corr.py::build_pyramid_lean; bit-exact
            # per level vs the dense path). Makes corr_mode='volume', and
            # with it the fast Pallas lookup, reachable at 1024x2048.
            # Also used by the deferred training path at any size: the
            # dense build's two coexisting 1 GB f32 temps (volume + pool
            # reshape) were the margin by which the 512x1024 batch-4
            # train step overflowed a 16 GB chip.
            from ..ops.corr import build_pyramid_lean
            pyr_A = tuple(build_pyramid_lean(fmap1_A, fmap2_A,
                                             self.corr_levels, corr_dtype))
            pyr_B = tuple(build_pyramid_lean(fmap1_B, fmap2_B,
                                             self.corr_levels, corr_dtype))
        else:
            pyr_A = tuple(p.astype(corr_dtype) for p in build_pyramid(
                all_pairs_correlation(fmap1_A, fmap2_A), self.corr_levels))
            pyr_B = tuple(p.astype(corr_dtype) for p in build_pyramid(
                all_pairs_correlation(fmap1_B, fmap2_B), self.corr_levels))
        if self.corr_mode != "onthefly" and isinstance(self._dccl, DCCLFused):
            # pack for the gather kernel ONCE, outside the GRU scan —
            # repacking inside the scan would copy every tile-padded
            # level each iteration (ops/pallas/dccl_gather.pack_volume)
            from ..ops.pallas.dccl_gather import pack_volume
            pyr_A = tuple(pack_volume(p) for p in pyr_A)
            pyr_B = tuple(pack_volume(p) for p in pyr_B)

        # flow initialisation (prior_raft.py:161-165)
        h8, w8 = H // 8, W // 8
        coords0 = jnp.broadcast_to(
            jnp.asarray(gridlib.identity_grid(h8, w8))[None], (B, h8, w8, 2))
        coords1_A = coords0
        coords1_B = coords0
        if init_flow is not None:
            coords1_A = coords1_A + init_flow
            coords1_B = coords1_B + flo_rotate(init_flow, g.a2b_w2c_8,
                                               g.a2b_8)

        consts = StepConsts(
            inp_A=inp_A, inp_B=inp_B,
            fmap1_A=fmap1_A, fmap2_A=fmap2_A,
            pyr_A=pyr_A, pyr_B=pyr_B,
            coords0=coords0,
        )
        carry0 = (net_A, net_B, coords1_A, coords1_B)

        if use_deferred:
            return self._forward_deferred(carry0, consts, iters, H, W)

        step = PriOrRAFT._step_test if test_mode else PriOrRAFT._step
        if self.remat:
            step = nn.remat(step, prevent_cse=False,
                            policy=self._remat_policy())
        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=nn.broadcast,
            out_axes=0,
            length=iters,
        )
        if test_mode:
            # single final upsample (see _step_test)
            # dtype matches the update blocks' mask heads (bf16 under
            # mixed precision) so the scan carry is type-stable
            mask0 = jnp.zeros((B, h8, w8, 576), net_A.dtype)
            carry, _ = scan(self, carry0 + (mask0,), consts)
            _, _, coords1_A, _, up_mask_A = carry
            return upsample_flow_convex(coords1_A - coords0, up_mask_A)
        _, (preds_A, preds_B) = scan(self, carry0, consts)
        return preds_A, preds_B

    def _remat_policy(self):
        if self.remat_policy == "dots":
            # save every conv/matmul result, recompute elementwise ops:
            # trades ~2-4 GB of per-iteration activations for skipping
            # the full forward replay in the backward pass. The Pallas
            # lookup outputs/residuals are NOT dots — keep them saved
            # too or the kernels replay anyway.
            return jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "dccl_corr", "dccl_coords"))
        # dccl_corr: the lookup results (largest recompute);
        # dccl_coords: the kernel VJP's residual tap coords — saving them
        # stops the backward from replaying the whole Pallas kernel to
        # regenerate residuals
        return jax.checkpoint_policies.save_only_these_names(
            "dccl_corr", "dccl_coords")

    def _forward_deferred(self, carry0, consts: StepConsts, iters, H, W):
        """Training forward with deferred volume gradients.

        Three stages (see dccl_gather.py §deferred cross-iteration volume
        grads): (1) a no-grad recording scan runs the full recurrence
        through primal-only lookups and tapes every iteration's summed
        corr fields + tap coords; (2) ``dccl_deferred_rebind`` re-binds
        the taped taps to the LIVE volume pyramids — identity forward, one
        stacked scatter per level/branch backward; (3) the differentiable
        replay scan consumes the rebound taps as scanned xs (no lookups
        inside). Gradients are mathematically identical to the standard
        path: the lookup is linear in the volume and the query coords are
        stop_gradiented each iteration (core/prior_raft.py:171), so the
        trajectory carries no volume gradient."""
        from ..ops.pallas.dccl_gather import dccl_deferred_rebind

        sg = jax.lax.stop_gradient
        rec_scan = nn.scan(
            PriOrRAFT._step_record,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=nn.broadcast,
            out_axes=0,
            length=iters,
        )
        _, tape = rec_scan(self, sg(carry0),
                           jax.tree_util.tree_map(sg, consts))
        # stop_gradient the whole tape so the rebind's zero cotangents for
        # it die here instead of transposing the recording scan
        (recA, recB), (cenA, cenB) = sg(tape)

        g = gridlib.rotation_grids(H, W)
        scales = [1.0 / (2.0 ** i) for i in range(self.corr_levels)]
        tapsA, tapsB = dccl_deferred_rebind(
            consts.pyr_A, consts.pyr_B, recA, recB, cenA, cenB,
            g.a2b_w2c_8, g.b2a_w2c_8, g.a2b_8, g.b2a_8, scales)

        step = PriOrRAFT._step_replay
        if self.remat:
            step = nn.remat(step, prevent_cse=False,
                            policy=self._remat_policy())
        # the replay never touches the pyramids — drop them from its
        # consts so the scan carries no dead broadcast operands
        replay_consts = consts._replace(pyr_A=(), pyr_B=())
        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            length=iters,
        )
        _, (preds_A, preds_B) = scan(self, carry0, (tapsA, tapsB),
                                     replay_consts)
        return preds_A, preds_B

    def iterate_taped(self, net_A, net_B, inp_A, inp_B, fmap1_A, fmap2_A,
                      pyr_A, pyr_B, z_A, z_B, iters: int = 12):
        """GRU scan for the single-forward taped training path.

        Runs the STANDARD differentiable recurrence once, with the DCCL
        lookups primal-only (the packed pyramids are consumed under
        stop_gradient) and the scanned zero tapes ``z_A``/``z_B``
        ((iters, B, h8, w8, L*K) each) added to the summed corr fields.
        The caller (train/trainer.py::_taped_grads) VJPs this function:
        d(z) is then exactly the stacked per-iteration corr-field
        cotangents, which ONE deferred scatter per level/branch converts
        into the volume cotangent — no per-iteration scatter chain in the
        scan backward, and no second recording scan either (the
        two-scan ``deferred_vol_grad`` path pays an extra full forward).

        Returns ``((preds_A, preds_B), (cen_A, cen_B))`` with preds the
        per-iteration upsampled flows and cen the stacked (iters, B, Q, 2)
        stop-gradiented query centres for the scatter."""
        sg = jax.lax.stop_gradient
        B, h8, w8, _ = net_A.shape
        coords0 = jnp.broadcast_to(
            jnp.asarray(gridlib.identity_grid(h8, w8))[None], (B, h8, w8, 2))
        consts = StepConsts(
            inp_A=inp_A, inp_B=inp_B,
            fmap1_A=fmap1_A, fmap2_A=fmap2_A,
            pyr_A=jax.tree_util.tree_map(sg, tuple(pyr_A)),
            pyr_B=jax.tree_util.tree_map(sg, tuple(pyr_B)),
            coords0=coords0,
        )
        carry0 = (net_A, net_B, coords0, coords0)

        step = PriOrRAFT._step_taped
        if self.remat:
            step = nn.remat(step, prevent_cse=False,
                            policy=self._remat_policy())
        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            length=iters,
        )
        _, (preds_A, preds_B, cen_A, cen_B) = scan(
            self, carry0, (z_A, z_B), consts)
        return (preds_A, preds_B), (cen_A, cen_B)
