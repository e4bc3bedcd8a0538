"""Build a synthetic MPF-layout dataset tree at production resolution.

The environment has no egress (BASELINE.md), so the real MPF/FlowScape
data cannot enter it. This tool synthesises a LEARNABLE stand-in at the
true 512x1024 resolution for the on-chip production training run
(VERDICT round-3 item 4): smooth band-limited images warped by smooth
ground-truth flow fields, so the sequence loss has real signal and
declines as the model fits — unlike pure-noise frames, where the
optimum is the mean and the curve is flat.

Layout matches MPFDataset's EFT train+val split dirs
(reference core/datasets.py:222-265): EFTs_Car2000/{image,flow} and
EFTs_Car200/{image,flow}.

    python tools/make_synth_dataset.py --root /tmp/synth_mpf \
        [--n 9] [--height 512] [--width 1024]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prior_flow_tpu.data import frame_utils  # noqa: E402


def smooth_field(rng, H, W, channels, octaves=4, amp=1.0):
    """Band-limited random field: summed upsampled noise octaves."""
    import cv2

    out = np.zeros((H, W, channels), np.float32)
    for o in range(octaves):
        h, w = max(2, H >> (octaves - o + 2)), max(2, W >> (octaves - o + 2))
        noise = rng.standard_normal((h, w, channels)).astype(np.float32)
        up = cv2.resize(noise, (W, H), interpolation=cv2.INTER_CUBIC)
        out += up.reshape(H, W, channels) * (amp / (2 ** o))
    return out


def warp_backward(img, flow):
    """Sample img at x+flow with longitude wrap (ERP semantics)."""
    import cv2

    H, W = img.shape[:2]
    gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
    mx = (gx + flow[..., 0]) % W
    my = np.clip(gy + flow[..., 1], 0, H - 1)
    return cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_WRAP)


def make_split(root, split_dir, n, H, W, seed):
    import cv2

    rng = np.random.default_rng(seed)
    d = os.path.join(root, split_dir)
    os.makedirs(os.path.join(d, "image"), exist_ok=True)
    os.makedirs(os.path.join(d, "flow"), exist_ok=True)

    img = smooth_field(rng, H, W, 3, amp=80.0) + 127.0
    img = np.clip(img, 0, 255).astype(np.uint8)
    for i in range(n):
        cv2.imwrite(os.path.join(d, "image", f"{i:04d}.png"), img)
        # smooth flow, a few pixels of motion (u wrapped into [-W/2, W/2))
        flow = smooth_field(rng, H, W, 2, amp=6.0)
        # MPF convention: pair (frame[i+1], frame[i]) carries flow[i+1]
        # (backward flow); next frame = previous warped by this flow
        frame_utils.write_flo(os.path.join(d, "flow", f"{i:04d}.flo"),
                              flow.astype(np.float32))
        img = warp_backward(img, flow)
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n", type=int, default=9, help="frames per split")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    args = ap.parse_args()

    for split_dir, seed in (("EFTs_Car2000", 0), ("EFTs_Car200", 1),
                            ("EFTs_Car100", 2)):
        d = make_split(args.root, split_dir, args.n, args.height,
                       args.width, seed)
        print(f"wrote {args.n} frames / {args.n - 1} pairs -> {d}")


if __name__ == "__main__":
    main()
