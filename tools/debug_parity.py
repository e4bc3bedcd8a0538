"""Stage-by-stage parity bisection between our ops and the reference model.

Dev tool (not shipped API): run `python tools/debug_parity.py` on a machine
with /root/reference mounted. Prints per-stage max abs errors.
"""
import os
import sys
import types
import math
from types import SimpleNamespace

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

sys.modules.setdefault("timm", types.ModuleType("timm"))
oc = types.ModuleType("omegaconf"); oc.OmegaConf = object; oc.ListConfig = list
sys.modules.setdefault("omegaconf", oc)
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
sys.path.insert(0, "/root/reference/PriOr-RAFT")

import core.prior_raft as rp
import core.utils.projection_prim_ortho as proj
from core.corr import DCCL as RefDCCL
from core.utils.utils import cycle_bilinear_sampler as ref_cbs

import jax
import jax.numpy as jnp

from prior_flow_tpu.checkpoint import convert_state_dict
from prior_flow_tpu.models import PriOrRAFT
from prior_flow_tpu.models.prior_raft import upsample_flow_convex
from prior_flow_tpu.geometry import grids as gridlib
from prior_flow_tpu.ops import corr as ours_corr
from prior_flow_tpu.ops import warp as ours_warp
from prior_flow_tpu.ops.samplers import cycle_bilinear_sample
from prior_flow_tpu.nn.encoder import BasicEncoder
from prior_flow_tpu.nn.update import BasicMultiUpdateBlock, BasicUpdateBlock

H, W = 128, 256


def t2n(t, tr=True):
    a = t.detach().cpu().numpy()
    if tr and a.ndim == 4:
        a = np.transpose(a, (0, 2, 3, 1))
    return a


def report(name, ours, ref):
    ours = np.asarray(ours)
    err = np.abs(ours - ref)
    print(f"{name:24s} maxerr={err.max():.5g} q999={np.quantile(err, 0.999):.5g} "
          f"med={np.median(err):.5g} scale={np.abs(ref).max():.4g}")
    return err


def main():
    torch.manual_seed(1234)
    tm = rp.PriOr_RAFT(SimpleNamespace(dropout=0.0, mixed_precision=False))
    tm.eval()

    rng = np.random.default_rng(7)
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    t1 = torch.from_numpy(np.transpose(img1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(img2, (0, 3, 1, 2)))

    model = PriOrRAFT(precision="highest")
    tmpl = model.init(jax.random.PRNGKey(0), jnp.asarray(img1), jnp.asarray(img1), iters=1)
    var = convert_state_dict(tm.state_dict(), template=tmpl)
    g = gridlib.rotation_grids(H, W)

    with torch.no_grad(), jax.default_matmul_precision("highest"):
        im1 = 2 * (t1 / 255.) - 1
        im2 = 2 * (t2 / 255.) - 1
        x1 = 2 * (jnp.asarray(img1) / 255.) - 1
        x2 = 2 * (jnp.asarray(img2) / 255.) - 1

        R1 = proj.generate_rotation_metrix(theta_list=[0., 0., -math.pi / 2])
        R2 = proj.generate_rotation_metrix(theta_list=[0., 0., math.pi / 2])
        gA2B = proj.generate_samplegrid(im1.shape, R1)
        h8, w8 = H // 8, W // 8
        gA2B8 = proj.generate_samplegrid([1, 3, h8, w8], R1)
        gA2B8w = proj.generate_samplegrid([1, 3, h8, w8], R1.T)
        gB2A8 = proj.generate_samplegrid([1, 3, h8, w8], R2)
        gB2A8w = proj.generate_samplegrid([1, 3, h8, w8], R2.T)

        imB = proj.img_rotate(torch.cat([im1, im2], 1), sample_grid=gA2B)
        i1B, i2B = imB.split([3, 3], 1)
        rotated = ours_warp.img_rotate(jnp.concatenate([x1, x2], -1), jnp.asarray(g.a2b))
        x1B, x2B = rotated[..., :3], rotated[..., 3:]
        report("image_B", x1B, t2n(i1B))

        # encoders
        fnet = BasicEncoder(output_dim=256, norm_fn="instance")
        f_params = {"params": var["params"]["fnet"]}
        f1A, f2A, f1B, f2B = tm.fnet([im1, im2, i1B, i2B])
        o1A = fnet.apply(f_params, x1)
        o2A = fnet.apply(f_params, x2)
        o1B = fnet.apply(f_params, x1B)
        o2B = fnet.apply(f_params, x2B)
        report("fmap1_A", o1A, t2n(f1A))
        report("fmap1_B", o1B, t2n(f1B))

        cnet = BasicEncoder(output_dim=256, norm_fn="batch")
        c_params = {"params": var["params"]["cnet"],
                    "batch_stats": var["batch_stats"]["cnet"]}
        cA, cB = tm.cnet([im1, i1B])
        ocA = cnet.apply(c_params, x1)
        ocB = cnet.apply(c_params, x1B)
        report("cnet_A", ocA, t2n(cA))

        netA_t = torch.tanh(cA[:, :128]); inpA_t = torch.relu(cA[:, 128:])
        netB_t = torch.tanh(cB[:, :128]); inpB_t = torch.relu(cB[:, 128:])
        netA = jnp.tanh(ocA[..., :128]); inpA = jax.nn.relu(ocA[..., 128:])
        netB = jnp.tanh(ocB[..., :128]); inpB = jax.nn.relu(ocB[..., 128:])

        # cost volumes (use the torch fmaps on both sides to isolate stages)
        f1A_j = jnp.asarray(t2n(f1A)); f2A_j = jnp.asarray(t2n(f2A))
        f1B_j = jnp.asarray(t2n(f1B)); f2B_j = jnp.asarray(t2n(f2B))
        cvA_t = tm.corr(f1A, f2A)  # (B, h, w, h, w)
        cvA = ours_corr.all_pairs_correlation(f1A_j, f2A_j)  # (B, Q, h, w)
        report("cost_volume_A", cvA.reshape(1, h8, w8, h8, w8), cvA_t.numpy())

        ref_dccl = RefDCCL(radius=4)
        pA_t = ref_dccl.build_pyramid(cvA_t)
        pB_t = ref_dccl.build_pyramid(tm.corr(f1B, f2B))
        cvB = ours_corr.all_pairs_correlation(f1B_j, f2B_j)
        pA = ours_corr.build_pyramid(cvA)
        pB = ours_corr.build_pyramid(cvB)
        for i in range(4):
            report(f"pyr_A[{i}]", pA[i].reshape(pA_t[i].shape[0], 1, *pA_t[i].shape[2:]),
                   pA_t[i].numpy())

        c0_t, c1A_t = tm.initialize_flow(im1)
        coords0 = jnp.asarray(gridlib.identity_grid(h8, w8))[None]
        c1A = coords0 + 1.7  # push coords off-identity to exercise lookups
        c1A_t = c1A_t + 1.7
        c1B = coords0 - 2.3
        c1B_t = tm.initialize_flow(im1)[1] - 2.3

        cA_t, cBA_t = ref_dccl(c1A_t, pA_t, pB_t, gA2B8w, gB2A8)
        dccl = ours_corr.DCCL()
        cA_o, cBA_o = dccl(c1A, pA, pB, jnp.asarray(g.a2b_w2c_8), jnp.asarray(g.b2a_8))
        report("dccl_own_A", cA_o, t2n(cA_t))
        report("dccl_cross_A", cBA_o, t2n(cBA_t))

        # flaw
        w2A_t = ref_cbs(f2A, c1A_t.permute(0, 2, 3, 1))
        flawA_t = tm.groupwise_corr(f1A, w2A_t, 4)
        w2A_o = cycle_bilinear_sample(f2A_j, c1A)
        flawA_o = ours_corr.groupwise_corr(f1A_j, w2A_o, 4)
        report("flaw_A", flawA_o, t2n(flawA_t))

        # flow rotate
        flow_B_t = c1B_t - c0_t
        fBA_t = proj.flo_rotate(flow_B_t, sample_grid_W2C=gB2A8w, sample_grid_C2W=gB2A8)
        fBA_o = ours_warp.flo_rotate(c1B - coords0, jnp.asarray(g.b2a_w2c_8), jnp.asarray(g.b2a_8))
        report("flow_B_A", fBA_o, t2n(fBA_t))

        # update blocks
        c1BA_t = c0_t + fBA_t
        w2BA_t = ref_cbs(f2A, c1BA_t.permute(0, 2, 3, 1))
        flawBA_t = tm.groupwise_corr(f1A, w2BA_t, 4)
        flawBA_o = ours_corr.groupwise_corr(
            f1A_j, cycle_bilinear_sample(f2A_j, coords0 + jnp.asarray(t2n(fBA_t))), 4)

        na_t, um_t, df_t = tm.ODDC(netA_t, inpA_t, c1A_t - c0_t, cA_t + cBA_t,
                                   flawA_t, fBA_t, flawBA_t)
        oddc = BasicMultiUpdateBlock(hidden_dim=128)
        na_o, um_o, df_o = oddc.apply(
            {"params": var["params"]["ODDC"]},
            jnp.asarray(t2n(netA_t)), jnp.asarray(t2n(inpA_t)),
            c1A - coords0, jnp.asarray(t2n(cA_t)) + jnp.asarray(t2n(cBA_t)),
            jnp.asarray(t2n(flawA_t)), jnp.asarray(t2n(fBA_t)),
            jnp.asarray(t2n(flawBA_t)))
        report("ODDC_delta", df_o, t2n(df_t))
        report("ODDC_mask", um_o, t2n(um_t))

        up_t = tm.upsample_flow(c1A_t + df_t - c0_t, um_t)
        up_o = upsample_flow_convex(c1A + jnp.asarray(t2n(df_t)) - coords0,
                                    jnp.asarray(t2n(um_t)))
        report("upsample", up_o, t2n(up_t))


if __name__ == "__main__":
    main()
