"""Analytic roofline model of the fused DCCL lookup (ARCHITECTURE §7).

Counts, from the kernel's actual structure (ops/pallas/dccl_gather.py),
the per-forward work in each hardware-limited class:

- ``gather``  : tpu.dynamic_gather lane-gather elements
                (_sample_taps corner fetches + _grid_window x-corners);
- ``select``  : where/compare/add elements of the row-select halving
                network, one-hot reduces, paired bf16 bit-extraction, and
                the grid-window's tap-accumulate network;
- ``fma``     : bilinear blend + coordinate arithmetic elements;
- ``hbm``     : volume + grid + output bytes that must cross HBM once
                per level per iteration (each volume element is read
                exactly once per iteration — the kernel serves own+cross
                for both branches in one pass);
- ``step``    : kernel grid steps (fixed per-step cost: DMA issue,
                semaphores — measured by tools/microbench_vpu_anchor.py).

Dividing each class by the chip's MEASURED achieved rate on that
primitive (tools/microbench_vpu_anchor.py, Pallas, VMEM-resident) gives
a composite floor for ANY implementation built from these primitives —
the honest denominator for "how close is the 56 ms lookup to the metal".

Usage: python tools/roofline_model.py [--H 512 --W 1024 --iters 12]
       [--rates select=S,gather=G,fma=F (T elem-ops/s), step=US (us)]
"""

from __future__ import annotations

import argparse

LANES = 128
NTAP = 81


def level_shapes(H, W, num_levels=4):
    h, w = H // 8, W // 8
    out = []
    for l in range(num_levels):
        Hl, Wl = h >> l, w >> l
        R = max(1, (Hl * Wl + LANES - 1) // LANES)
        # round up to pow2 (pack_volume)
        R2 = 1
        while R2 < R:
            R2 *= 2
        out.append((Hl, Wl, R2))
    return out


def row_select_elems(Rw):
    """Element count of _row_select on Rw packed rows x 128 lanes:
    halving stages (one where per surviving row) + the 8-row one-hot
    reduce (compare + select + add)."""
    total = 0
    m = Rw
    while m > 8:
        m //= 2
        total += m * LANES
    if m > 1:
        total += 3 * m * LANES
    return total


def sample_taps_counts(Hl, Wl, R, bf16=True):
    """(gather, select, fma) element-ops per QUERY for ONE _sample_taps
    pass (dccl_gather.py:83-164)."""
    paired = bf16 and R % 2 == 0
    Rw = R // 2 if paired else R
    if Wl >= LANES and Wl % LANES == 0:
        gathers = 2 * Rw * LANES          # g0/g1 shared across y-corners
        picks = 4
    else:
        gathers = 4 * Rw * LANES          # one gather per corner
        picks = 4
    select = picks * row_select_elems(Rw)
    if paired:
        select += picks * 3 * LANES       # hi/lo word extract + bitcast
    # coord arithmetic (mod/floor/clip/masks ~14 ops) + bilinear blend
    # (~11 mul/add) on (1, 128)
    fma = 25 * LANES
    return gathers, select, fma


def grid_window_counts(Hg, Wg):
    """(gather, select, fma, mxu_flops) per QUERY for ONE _grid_window
    call (dccl_gather.py:178-236): 10-row one-hot MXU fetch, then per
    plane 9 strip rows x (y-blend, 2 lane gathers, x-blend, tap
    accumulate)."""
    mxu = 2 * 10 * Hg * 2 * LANES         # (T*10, Hg) @ (Hg, 256)
    gather = 2 * 9 * 2 * LANES            # 2 planes x 9 rows x 2 corners
    fma = 2 * 9 * (2 + 3) * LANES         # y-blend + x-blend
    select = 2 * 9 * 2 * LANES            # jj==j one-hot accumulate
    return gather, select, fma, mxu


def forward_counts(H, W, iters=12, num_levels=4, bf16=True):
    Q = (H // 8) * (W // 8)
    Hg, Wg = H // 8, W // 8  # rotation grid at 1/8 res
    per_class = {"gather": 0, "select": 0, "fma": 0, "mxu": 0, "hbm": 0}
    per_level = []
    for (Hl, Wl, R) in level_shapes(H, W, num_levels):
        g = s = f = m = 0
        # 4 tap passes per level (ownA, ownB on own volumes; crossB on
        # VA, crossA on VB — dccl_gather.py:292-306)
        for _ in range(4):
            gg, ss, ff = sample_taps_counts(Hl, Wl, R, bf16)
            g, s, f = g + gg, s + ss, f + ff
        # 2 grid-window extractions (cross branches)
        for _ in range(2):
            gg, ss, ff, mm = grid_window_counts(Hg, Wg)
            g, s, f, m = g + gg, s + ss, f + ff, m + mm
        # HBM per level per iteration: both packed volumes read once
        # (Q * R * 128 elements x bytes), 4 x (Q,128) f32 outputs written
        ebytes = 2 if bf16 else 4
        hbm = 2 * Q * R * LANES * ebytes + 4 * Q * LANES * 4
        per_level.append((Hl, Wl, R, g, s, f, m, hbm))
        per_class["gather"] += g * Q
        per_class["select"] += s * Q
        per_class["fma"] += f * Q
        per_class["mxu"] += m * Q
        per_class["hbm"] += hbm
    for k in per_class:
        per_class[k] *= iters
    # kernel grid steps: BQ / T per level per iteration (T = 32 cap)
    per_class["steps"] = iters * num_levels * (Q // 32)
    return Q, per_level, per_class


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=512)
    ap.add_argument("--W", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=12)
    # achieved rates, measured by tools/microbench_vpu_anchor.py on the
    # v5e (T elem-ops/s); step cost in us. Defaults = measured 2026-08-20.
    ap.add_argument("--rate-select", type=float, default=None)
    ap.add_argument("--rate-gather", type=float, default=None)
    ap.add_argument("--rate-fma", type=float, default=None)
    ap.add_argument("--step-us", type=float, default=None)
    ap.add_argument("--hbm-gbs", type=float, default=820.0)
    ap.add_argument("--mxu-tflops", type=float, default=197.0)
    ap.add_argument("--measured-ms", type=float, default=56.0,
                    help="measured per-forward DCCL lookup time to compare")
    args = ap.parse_args()

    Q, per_level, pc = forward_counts(args.H, args.W, args.iters)
    print(f"DCCL lookup work per forward ({args.H}x{args.W}, "
          f"{args.iters} iters, Q={Q}):")
    print(f"{'level':>10} {'R':>4} {'gather':>12} {'select':>12} "
          f"{'fma':>12} {'HBM MB':>8}")
    for (Hl, Wl, R, g, s, f, m, hbm) in per_level:
        print(f"{Hl:>5}x{Wl:<4} {R:>4} {g * Q:>12,} {s * Q:>12,} "
              f"{f * Q:>12,} {hbm / 1e6:>8.1f}")
    print(f"totals/fwd: gather {pc['gather'] / 1e9:.2f} G, select "
          f"{pc['select'] / 1e9:.2f} G, fma {pc['fma'] / 1e9:.2f} G, "
          f"MXU {pc['mxu'] / 1e9:.2f} GFLOP, HBM {pc['hbm'] / 1e9:.2f} GB, "
          f"{pc['steps']:,} grid steps")

    if args.rate_select:
        t = (pc["select"] / (args.rate_select * 1e12)
             + pc["gather"] / (args.rate_gather * 1e12)
             + pc["fma"] / (args.rate_fma * 1e12))
        t_hbm = pc["hbm"] / (args.hbm_gbs * 1e9)
        t_mxu = pc["mxu"] / (args.mxu_tflops * 1e12)
        t_step = pc["steps"] * args.step_us * 1e-6
        print(f"\ncomposite floor: VPU {t * 1e3:.1f} ms "
              f"(+ steps {t_step * 1e3:.1f} ms) "
              f"vs HBM {t_hbm * 1e3:.1f} ms vs MXU {t_mxu * 1e3:.1f} ms")
        floor = max(t + t_step, t_hbm, t_mxu)
        print(f"binding: {'VPU+steps' if t + t_step >= max(t_hbm, t_mxu) else ('HBM' if t_hbm >= t_mxu else 'MXU')}; "
              f"floor {floor * 1e3:.1f} ms; measured {args.measured_ms:.1f} "
              f"ms = {floor * 1e3 / args.measured_ms * 100:.0f}% of floor-"
              f"speed (lookup at {args.measured_ms / (floor * 1e3):.1f}x "
              f"floor)")


if __name__ == "__main__":
    main()
