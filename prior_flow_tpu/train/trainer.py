"""Training state, jitted train step, and the high-level training loop.

Rebuild of the reference trainer (train_flow.py:94-203) as a functional
JAX/optax pipeline:

- ``TrainState``: params + frozen batch_stats + optimizer state + step.
- ``make_train_step``: builds one jitted SPMD step — B-branch ground truth
  synthesised on device via ``flo_a2b`` under stop_gradient
  (train_flow.py:123-126), optional gaussian noise augmentation
  (train_flow.py:127-130), dual-branch latitude-weighted sequence loss
  (sum, train_flow.py:137-139), global-norm clip + AdamW + OneCycle.
- ``Trainer``: epoch-less loop with periodic checkpointing + validation
  every VAL_FREQ steps (train_flow.py:181-194), pluggable metric logger,
  and per-step timing (a first-class upgrade — the reference has no
  profiling at all, SURVEY.md §5).

bf16 note: with ``mixed_precision`` the model computes in bfloat16; no loss
scaling is needed (bf16 has fp32 exponent range), so the reference's AMP
GradScaler machinery (train_flow.py:113,141-146) has no TPU counterpart by
design.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..ops.warp import flo_a2b
from .loss import uniform_sequence_loss
from .optim import make_optimizer

VAL_FREQ = 5000  # train_flow.py:48
IMAGE_LOG_FREQ = 1024  # train_flow.py:152


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def taped_value_and_grad(model, variables, image1, image2, flow_gt, valid,
                         flow_gt_B, valid_B, rng, iters: int, gamma: float):
    """Training loss + gradients via the SINGLE-FORWARD taped path.

    The fastest exact training backward for the DCCL volume gradients.
    Where the standard path scatter-adds into every pyramid level 12
    times per branch inside the scan backward, and the two-scan
    ``deferred_vol_grad`` path pays a whole extra recording forward, this
    runs the standard differentiable recurrence ONCE with the lookups
    primal-only and a dead zero tape ``z`` added to the summed corr
    fields (models/prior_raft.py::iterate_taped). Manual VJP composition
    then routes the gradient:

      encode --> packed pyramids --> taped GRU scan --> loss
                        ^                  |
                        |   d(z): stacked per-iteration corr cotangents
                        +---- ONE deferred scatter per level/branch
                              (ops/pallas/dccl_gather.dccl_deferred_rebind)

    Exactness: the DCCL lookup is linear in the volume and the query
    coords are stop_gradiented each iteration (core/prior_raft.py:171),
    so the volume cotangent is the coords-indexed scatter of the field
    cotangents — independent of WHEN it is applied. Validated against
    the standard path in tests/test_model.py::TestTapedGrads.

    Returns ``((loss, metrics), grads)`` with grads matching
    ``jax.grad`` of the standard loss over ``variables['params']``.
    """
    import contextlib

    from ..geometry import grids as gridlib
    from ..models.prior_raft import PriOrRAFT, build_packed_pyramids
    from ..ops.pallas.dccl_gather import dccl_deferred_rebind

    if model.corr_mode == "onthefly":
        raise ValueError("taped gradients require corr_mode='volume'")
    resolved = model.lookup_mode
    if resolved == "auto":
        resolved = "pallas" if jax.default_backend() == "tpu" else "mxu"
    if resolved != "pallas":
        raise ValueError(
            "grad_mode='taped' needs the fused Pallas lookup (DCCLFused"
            ".record); the model resolves lookup_mode=%r on this backend "
            "— pass lookup_mode='pallas' or use grad_mode='standard'"
            % resolved)

    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}
    bind = lambda p: {"params": p, **others}

    B, H, W, _ = image1.shape
    h8, w8 = H // 8, W // 8
    L = model.corr_levels
    K = (2 * model.corr_radius + 1) ** 2
    corr_dtype = jnp.bfloat16 if model.mixed_precision else jnp.float32
    rng_enc, rng_scan = jax.random.split(rng)

    ctx = (jax.default_matmul_precision(model.precision)
           if model.precision is not None else contextlib.nullcontext())
    with ctx:
        def f_enc(p):
            return model.apply(bind(p), image1, image2, train=True,
                               method=PriOrRAFT.encode,
                               rngs={"dropout": rng_enc})

        enc, vjp_enc = jax.vjp(f_enc, params)
        net_A, net_B, inp_A, inp_B, fmaps = enc

        def f_pyr(fm):
            return (build_packed_pyramids(fm[0], fm[1], L, corr_dtype),
                    build_packed_pyramids(fm[2], fm[3], L, corr_dtype))

        (pyr_A, pyr_B), vjp_pyr = jax.vjp(f_pyr, fmaps)

        # dead zero tape: primal never read (prior_raft._tape_probe), its
        # scan-stacked cotangent is the per-iteration corr-field gradient
        z = jnp.zeros((iters, B, h8, w8, L * K), jnp.float32)

        def f_scan(p, nA, nB, iA, iB, f1A, f2A, zA, zB):
            return model.apply(
                bind(p), nA, nB, iA, iB, f1A, f2A, pyr_A, pyr_B,
                zA, zB, iters, method=PriOrRAFT.iterate_taped,
                rngs={"dropout": rng_scan})

        ((preds_A, preds_B), (cen_A, cen_B)), vjp_scan = jax.vjp(
            f_scan, params, net_A, net_B, inp_A, inp_B,
            fmaps[0], fmaps[1], z, z)

        def f_loss(pA, pB):
            loss_A, mA = uniform_sequence_loss(pA, flow_gt, valid,
                                               gamma=gamma, prefix="A-")
            loss_B, mB = uniform_sequence_loss(pB, flow_gt_B, valid_B,
                                               gamma=gamma, prefix="B-")
            return loss_A + loss_B, {**mA, **mB}

        loss, vjp_loss, metrics = jax.vjp(f_loss, preds_A, preds_B,
                                          has_aux=True)

        # ---- backward composition ----
        d_pA, d_pB = vjp_loss(jnp.ones((), loss.dtype))
        zc = (jnp.zeros_like(cen_A), jnp.zeros_like(cen_B))
        (g_params_scan, d_netA, d_netB, d_inpA, d_inpB, d_f1A, d_f2A,
         d_zA, d_zB) = vjp_scan(((d_pA, d_pB), zc))

        # ONE stacked scatter per level/branch: per-iteration corr
        # cotangents -> volume cotangents (tap values are unused by the
        # rebind backward, so d_zA/d_zB double as the dummy taps operand)
        g = gridlib.rotation_grids(H, W)
        scales = [1.0 / (2.0 ** i) for i in range(L)]
        sg = jax.lax.stop_gradient

        def f_rebind(pA_, pB_):
            return dccl_deferred_rebind(
                pA_, pB_, d_zA, d_zB, sg(cen_A), sg(cen_B),
                g.a2b_w2c_8, g.b2a_w2c_8, g.a2b_8, g.b2a_8, scales)

        _, vjp_rebind = jax.vjp(f_rebind, tuple(pyr_A), tuple(pyr_B))
        d_pyrA, d_pyrB = vjp_rebind((d_zA, d_zB))

        (d_fmaps,) = vjp_pyr((d_pyrA, d_pyrB))
        d_fmaps = (d_fmaps[0] + d_f1A, d_fmaps[1] + d_f2A,
                   d_fmaps[2], d_fmaps[3])
        (g_params_enc,) = vjp_enc(
            (d_netA, d_netB, d_inpA, d_inpB, d_fmaps))

    grads = jax.tree_util.tree_map(jnp.add, g_params_enc, g_params_scan)
    return (loss, metrics), grads


def make_train_step(model, tx, iters: int = 12, gamma: float = 0.8,
                    add_noise: bool = False, grad_mode: str = "standard"):
    """Build the (jittable) one-step update function.

    step(state, batch, rng) -> (state, metrics)
    batch = (image1, image2, flow_gt, valid): NHWC float32 on device.

    grad_mode: 'standard' = jax.value_and_grad over the model forward;
    'taped' = the single-forward deferred-scatter backward
    (``taped_value_and_grad``) — identical gradients, one stacked volume
    scatter per level/branch instead of one per GRU iteration. Requires
    the DCCLFused volume path (lookup_mode pallas/auto-on-TPU).
    """

    def train_step(state: TrainState, batch, rng):
        image1, image2, flow_gt, valid = batch

        # B-branch GT synthesised on device, no grad (train_flow.py:123-126).
        # Per-batch-element: the batched packed-corner gathers inside
        # flo_rotate draw batch-minormost operand layouts from XLA
        # (4 x ~15 ms/step of 2-wide gathers in the train-step trace,
        # 2026-08-20); splitting is bit-exact and sidesteps it (same
        # finding as img_rotate — tools/bench_img_rotate.py)
        B = flow_gt.shape[0]
        if B > 1:
            flow_gt_B = jnp.concatenate(
                [flo_a2b(flow_gt[i:i + 1]) for i in range(B)], axis=0)
        else:
            flow_gt_B = flo_a2b(flow_gt)
        flow_gt_B = jax.lax.stop_gradient(flow_gt_B)
        valid_B = ((jnp.abs(flow_gt_B[..., 0]) < 1000) &
                   (jnp.abs(flow_gt_B[..., 1]) < 1000)).astype(jnp.float32)

        if add_noise:
            nrng, srng = jax.random.split(rng)
            stdv = jax.random.uniform(srng, (), minval=0.0, maxval=5.0)
            image1 = jnp.clip(
                image1 + stdv * jax.random.normal(nrng, image1.shape), 0.0, 255.0)
            nrng2 = jax.random.fold_in(nrng, 1)
            image2 = jnp.clip(
                image2 + stdv * jax.random.normal(nrng2, image2.shape), 0.0, 255.0)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            preds_A, preds_B = model.apply(
                variables, image1, image2, iters=iters, train=True,
                rngs={"dropout": rng})
            loss_A, mA = uniform_sequence_loss(
                preds_A, flow_gt, valid, gamma=gamma, prefix="A-")
            loss_B, mB = uniform_sequence_loss(
                preds_B, flow_gt_B, valid_B, gamma=gamma, prefix="B-")
            return loss_A + loss_B, {**mA, **mB}

        if grad_mode == "taped":
            (loss, metrics), grads = taped_value_and_grad(
                model, state.variables, image1, image2, flow_gt, valid,
                flow_gt_B, valid_B, rng, iters, gamma)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = dict(metrics)
        metrics["train/loss"] = loss
        metrics["train/grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


@dataclass
class TrainerConfig:
    """Flag surface mirroring train_flow.py:206-231."""

    name: str = "EFT"
    stage: str = "EFT"
    lr: float = 1e-4
    num_steps: int = 60000
    batch_size: int = 4
    iters: int = 12
    wdecay: float = 1e-4
    epsilon: float = 1e-8
    clip: float = 1.0
    gamma: float = 0.8
    add_noise: bool = False
    grad_mode: str = "standard"  # 'taped' = single-forward deferred scatter
    mixed_precision: bool = False
    dropout: float = 0.0
    save_path: str = "./checkpoints"
    restore_ckpt: Optional[str] = None
    validation: tuple = ()
    val_freq: int = VAL_FREQ
    seed: int = 1234
    data_root: Optional[str] = None


class Trainer:
    """Epoch-less training loop (train_flow.py:119-203) with mesh sharding."""

    def __init__(self, model, cfg: TrainerConfig, mesh=None,
                 logger: Optional[Callable[[Dict, int], None]] = None,
                 validators: Optional[Dict[str, Callable]] = None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.logger = logger or (lambda metrics, step: None)
        self.validators = validators or {}
        self.tx, self.schedule = make_optimizer(
            cfg.lr, cfg.num_steps, cfg.wdecay, cfg.epsilon, cfg.clip)
        self._step_fn = None
        self._panel_fn = None

    def init_state(self, sample_shape) -> TrainState:
        B, H, W, C = sample_shape
        rng = jax.random.PRNGKey(self.cfg.seed)
        dummy = jnp.zeros((1, H, W, C), jnp.float32)
        variables = self.model.init(rng, dummy, dummy, iters=1)
        state = TrainState.create(variables, self.tx)

        path = self.cfg.restore_ckpt
        if not path:
            return state
        if path == "auto":
            path = self._latest_checkpoint()
            if path is None:
                return state
        if os.path.isdir(path):
            from ..checkpoint.orbax_io import restore_any, restore_train_state
            tree = restore_any(path)
            if all(k in tree for k in ("params", "opt_state", "step")):
                # FULL train-state resume: optimizer moments, the OneCycle
                # schedule position and the step counter all carry over —
                # the reference can only reload weights (train_flow.py:99-104)
                return restore_train_state(path, state)
            variables = {"params": tree["params"]}
            if tree.get("batch_stats"):
                variables["batch_stats"] = tree["batch_stats"]
        else:
            variables = self._restore(variables)
        return state.replace(params=variables["params"],
                             batch_stats=variables.get("batch_stats", {}))

    def _latest_checkpoint(self):
        """Most recent step checkpoint under save_path (auto-resume — an
        upgrade over the reference, which has no crash recovery,
        SURVEY.md §5 'Failure detection: none')."""
        root = os.path.abspath(self.cfg.save_path)
        if not os.path.isdir(root):
            return None
        steps = [d for d in os.listdir(root) if d.isdigit()]
        if os.path.isdir(os.path.join(root, "final")):
            return os.path.join(root, "final")
        if not steps:
            return None
        return os.path.join(root, max(steps, key=int))

    def _restore(self, template):
        """Restore weights from a .pth file: exact load or FlyingThings
        graft — the reference's try/except restore chain
        (train_flow.py:99-104)."""
        from ..checkpoint.convert import (convert_state_dict,
                                          convert_things_ckpt, load_pth)
        sd = load_pth(self.cfg.restore_ckpt)
        try:
            return convert_state_dict(sd, template=template)
        except ValueError:
            return convert_things_ckpt(sd, template)

    def _batch_sharding(self):
        """Input sharding for this trainer's mesh: P('data') on 1D meshes,
        P('data', 'space') (batch x image-height) on 2D data x space meshes
        — the production entry into the spatial-parallel path that divides
        the correlation volume's query axis across chips."""
        from ..parallel.mesh import batch_sharding, spatial_batch_sharding
        if "space" in self.mesh.axis_names:
            return spatial_batch_sharding(self.mesh)
        return batch_sharding(self.mesh)

    def compile_step(self, state, batch):
        step_fn = make_train_step(self.model, self.tx, iters=self.cfg.iters,
                                  gamma=self.cfg.gamma,
                                  add_noise=self.cfg.add_noise,
                                  grad_mode=self.cfg.grad_mode)
        if self.mesh is not None:
            from ..parallel.mesh import replicated
            rep = replicated(self.mesh)
            bsh = self._batch_sharding()
            self._step_fn = jax.jit(
                step_fn,
                in_shardings=(rep, (bsh, bsh, bsh, bsh), rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
        else:
            self._step_fn = jax.jit(step_fn, donate_argnums=(0,))
        return self._step_fn

    def run(self, train_loader, state: Optional[TrainState] = None):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        if state is None:
            # peek one dataset sample for shapes (no stream consumed, so a
            # resumed run can open the stream at exactly its restored step)
            sample = train_loader.dataset[0]
            shape = (cfg.batch_size,) + tuple(np.asarray(sample[0]).shape)
            state = self.init_state(shape)

        # double-buffered host->device prefetch so the next batch's HBM copy
        # overlaps the current step's compute (SURVEY.md §3.1 hot loop #2)
        from ..data.loader import device_prefetch
        sharding = None
        if self.mesh is not None:
            sharding = self._batch_sharding()
        # resume-aware: a restored full TrainState continues from its step,
        # and the loader replays the deterministic batch sequence from there
        # (per-epoch keyed shuffles + per-(epoch, index) augmentation rngs),
        # so a resumed run trains on the same data an uninterrupted one would
        total_steps = int(state.step)
        it = device_prefetch(
            (tuple(b[:4]) for b in train_loader.infinite(
                start_batch=total_steps)), sharding)
        first = next(it)

        step_fn = self.compile_step(state, first)
        batch = first
        t_last = time.perf_counter()
        while total_steps <= cfg.num_steps:
            # keyed by absolute step: the rng stream is identical whether a
            # run is uninterrupted or resumed from a checkpoint
            step_rng = jax.random.fold_in(rng, total_steps)
            arrays = tuple(jnp.asarray(x) for x in batch[:4])
            state, metrics = step_fn(state, arrays, step_rng)

            if (total_steps % 100) == 0:
                host = {k: float(v) for k, v in metrics.items()}
                t_now = time.perf_counter()
                host["train/steps_per_sec"] = 100.0 / max(t_now - t_last, 1e-9)
                host["train/learning_rate"] = float(self.schedule(total_steps))
                t_last = t_now
                self.logger(host, total_steps)

            if total_steps % IMAGE_LOG_FREQ == 0 and \
                    hasattr(self.logger, "log_images"):
                self._log_image_panels(state, batch, total_steps)

            if total_steps % cfg.val_freq == cfg.val_freq - 1:
                self.save(state, total_steps + 1)
                results = {}
                for name, validator in self.validators.items():
                    if name in cfg.validation:
                        results.update(validator(self.model, state.variables))
                if results:
                    self.logger(results, total_steps)

            total_steps += 1
            if total_steps > cfg.num_steps:
                break
            batch = next(it)

        self.save(state, "final")
        return state

    def _log_image_panels(self, state, batch, step):
        """Input / prediction / GT colour panels every IMAGE_LOG_FREQ steps —
        the reference's wandb image logging (train_flow.py:152-178)."""
        import numpy as np

        from ..ops.warp import img_a2b
        from ..utils.flow_viz import omniflow_to_image

        image1, image2, flow_gt = batch[0][:1], batch[1][:1], batch[2][:1]
        if self._panel_fn is None:
            # jitted and cached: an op-by-op 12-iteration forward at full
            # resolution would stall the train loop for minutes every
            # IMAGE_LOG_FREQ steps (the reference pays this too — its panel
            # forward reruns the model inside wandb logging)
            self._panel_fn = jax.jit(
                lambda v, a, b: self.model.apply(v, a, b,
                                                 iters=self.cfg.iters))
        preds_A, preds_B = self._panel_fn(
            state.variables, jnp.asarray(image1), jnp.asarray(image2))
        panels = {
            "image1": np.asarray(image1[0]),
            "image2": np.asarray(image2[0]),
            "image1_B": np.asarray(img_a2b(jnp.asarray(image1)))[0],
            "flow_gt": omniflow_to_image(np.asarray(flow_gt[0])),
            "flow_pred_A": omniflow_to_image(np.asarray(preds_A[-1][0])),
            "flow_pred_B": omniflow_to_image(np.asarray(preds_B[-1][0])),
        }
        self.logger.log_images(panels, step)

    def save(self, state: TrainState, tag):
        from ..checkpoint.orbax_io import save_train_state
        path = os.path.join(os.path.abspath(self.cfg.save_path), str(tag))
        save_train_state(path, state)
        return path
