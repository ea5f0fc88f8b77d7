"""Roofline for the headline pipeline on TPU v5e (round-4 verdict item 3).

Analytic HBM-traffic and FLOP model of each pipeline stage (derived from
the actual kernel layouts — what each kernel genuinely reads from / writes
to HBM, since everything inside a fused octave program stays in VMEM),
combined with measured stage device times (from tools/trace_headline.py)
into achieved GB/s / GFLOP/s vs v5e peaks.

v5e peaks used: HBM 819 GB/s, MXU bf16 197 TFLOP/s, MXU f32 ~49 TFLOP/s
(public chip specs; the pipeline is all-f32).

Usage:
  PYTHONPATH=/root/repo python tools/roofline.py [batch]
prints the per-stage byte/FLOP model; pass measured ms via env or edit the
MEASURED dict after a trace run to print the achieved-fraction table.
"""

from __future__ import annotations

import sys

import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.core.fed import allocate_evolutions

HBM_GBPS = 819.0
F32_TFLOPS = 49.0


def model(batch: int = 16, h0: int = 480, w0: int = 640):
    cfg = AkazeConfig()
    specs = allocate_evolutions(w0, h0, cfg)
    B = batch
    rows = []

    def add(stage, rbytes, wbytes, flops, note=""):
        rows.append((stage, rbytes, wbytes, flops, note))

    # ---- scale space: fused per-octave Mosaic kernels ----
    # Each octave kernel reads its seed plane and writes the level-major
    # stacks (Lt, Lx, Ly) + detect fields (score, ox, oy) per level at
    # native octave resolution; everything else stays in VMEM.
    oct_specs = {}
    for s in specs:
        oct_specs.setdefault(s.octave, []).append(s)
    ss_read = ss_write = ss_flops = 0
    for o, os_ in oct_specs.items():
        h, w = os_[0].height, os_[0].width
        n = len(os_)
        px = B * h * w
        ss_read += px * 4  # seed (octave 0: the input frame)
        ss_write += 6 * n * px * 4  # Lt/Lx/Ly + score/ox/oy stacks
        # FED stencil: ~12 flops/px/tau-step + per-level convs (~60 flops/px
        # for the 9-tap separable chains + conductivity + detector algebra).
        taus = sum(len(s.taus) for s in os_)
        ss_flops += px * (12 * taus + 60 * n)
    add("scale_space(+detect fields)", ss_read, ss_write, ss_flops,
        "seeds in, 6 level-major stacks out; FED chain VMEM-resident")

    # ---- candidates: per-octave approx_max_k over score stacks ----
    cand_read = sum(
        B * len(os_) * os_[0].height * os_[0].width * 4
        for os_ in oct_specs.values()
    )
    K = cfg.per_level_candidates
    L = len(specs)
    cand_write = B * L * K * 8
    add("candidates(approx_max_k)", cand_read, cand_write,
        cand_read // 4 * 2, "reads every score plane once")

    # ---- NMS + top-M + subpixel gathers (small) ----
    M = cfg.max_keypoints
    nms_flops = B * 3 * L * K * K * 8
    add("nms+topk+subpixel", B * L * K * 16, B * M * 24, nms_flops,
        "candidate SoA only")

    # ---- describe: fused kernel, per-keypoint patch DMAs ----
    # ~210 live keypoints/frame at the bench operating point; each DMAs a
    # (3, PHA, PWA) aligned window (octave-0 worst case 72x256).
    live = 210
    pha, pwa = 72, 256
    d_read = B * live * 3 * pha * pwa * 4
    d_write = B * M * (4 + 64)
    # one-hot sampling matmuls: (3*64, 64) @ (64, 512) + (8, 192) @ ... per
    # 8-kp sub-group ~ 19 MFLOP; orientation/window/pack smaller.
    d_flops = B * (live / 8) * 25e6
    add("describe(fused)", d_read, d_write, d_flops,
        f"{live} live kp/frame, ({pha},{pwa}) windows")

    # ---- match: one-pass Hamming over packed descriptors ----
    words = cfg.descriptor_words
    m_read = 2 * B * M * words * 4
    m_flops = (B - 1) * M * M * words * 3
    add("match(hamming)", m_read, (B - 1) * M * 12, m_flops,
        "XOR+popcount cube")

    print(f"batch={B} @ {h0}x{w0}, {L} levels / {len(oct_specs)} octaves")
    tr = tw = tf = 0
    for stage, r, w, f, note in rows:
        tr += r
        tw += w
        tf += f
        print(f"  {stage:28s} read {r/1e6:8.1f} MB  write {w/1e6:8.1f} MB  "
              f"{f/1e9:7.2f} GFLOP   {note}")
    print(f"  {'TOTAL':28s} read {tr/1e6:8.1f} MB  write {tw/1e6:8.1f} MB  "
          f"{tf/1e9:7.2f} GFLOP")
    per_frame = (tr + tw) / B
    print(f"\nper-frame HBM traffic: {per_frame/1e6:.1f} MB; "
          f"per-frame FLOPs: {tf/B/1e9:.2f} GFLOP")
    print(f"HBM-bound floor at {HBM_GBPS:.0f} GB/s: "
          f"{(tr+tw)/HBM_GBPS/1e9*1e3:.2f} ms/batch "
          f"= {B/((tr+tw)/HBM_GBPS/1e9):.0f} fps")
    print(f"f32-MXU-bound floor at {F32_TFLOPS:.0f} TFLOP/s: "
          f"{tf/F32_TFLOPS/1e12*1e3:.2f} ms/batch")
    return (tr + tw), tf


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    total_bytes, total_flops = model(b)
    # With a measured device time, print achieved fractions.
    import os

    ms = os.environ.get("MEASURED_DEVICE_MS")
    if ms:
        t = float(ms) / 1e3
        print(f"\nmeasured device time {ms} ms/batch:")
        print(f"  achieved {total_bytes/t/1e9:.0f} GB/s "
              f"({total_bytes/t/1e9/HBM_GBPS:.1%} of HBM peak)")
        print(f"  achieved {total_flops/t/1e12:.2f} TFLOP/s "
              f"({total_flops/t/1e12/F32_TFLOPS:.1%} of f32 MXU peak)")
