"""Deep-octave cost model probe (round-4 verdict item 2a).

The recorded-but-never-tried idea is lane-packing deep-octave frames
(e.g. (8, 60, 80) -> (60, 640)) to cut wasted vector-register lanes
(80/128 = 62.5% lane utilization).  Whether that can pay depends on the
cost model: if deep-octave Mosaic programs are FIXED-COST-PER-OP bound
(issue overhead), vreg count is irrelevant and packing saves ~nothing;
if they are per-vreg-throughput bound, packing saves up to 1.6x.

Probe without implementing packing: run the SAME op-chain (octave-3
specs) at widths 80 / 160 / 320 / 640 (1x / 2x / 4x / 8x the vregs per
op, identical op count per program, B scaled down to hold total element
work constant).  Time ~flat across widths => fixed-cost bound => record
the packing idea as a measured negative.  Time ~proportional => packing
has real headroom.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_octave_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_akaze_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics
from akaze_tpu.kernels.fed_pallas import fused_octave_batched, octave_groups

F = 8  # frames per program (the production deep-octave setting)


def main():
    cfg = AkazeConfig()
    st = ScaleSpaceStatics(640, 480, cfg)
    groups = octave_groups(st)
    l0, n, h, w = groups[3]  # octave 3: (60, 80) at VGA
    specs = tuple(st.specs[l0 : l0 + n])
    rng = np.random.default_rng(0)
    # Constant total element work: B * h * W = const.
    results = {}
    for mult in (1, 2, 4, 8):
        W = w * mult
        B = 64 // mult  # 64*80 = 5120 columns of total width at every mult
        seed = jnp.asarray(rng.standard_normal((B, h, W)).astype(np.float32))
        k = jnp.full((B,), 0.03, jnp.float32)

        @jax.jit
        def run(s, kk, reps):
            def body(i, carry):
                x, acc = carry
                out = fused_octave_batched(
                    x, kk, specs, cfg.diffusivity, first=False, f=F,
                    with_detect=True, threshold=float(cfg.detector_threshold),
                )
                # carry a tiny data dependence into the next rep
                x2 = s + out[0][0] * 1e-30
                return (x2, acc + jnp.sum(out[0][-1]))

            _, acc = jax.lax.fori_loop(0, reps, body, (s, jnp.float32(0.0)))
            return acc

        # float() forces a HOST transfer per measurement: on the tunneled
        # backend block_until_ready alone can return before queued work
        # finishes (BASELINE.md "Measurement integrity") — the first cut of
        # this probe measured ~0 ms/rep for exactly that reason.
        float(run(seed, k, 2))
        t_small = time.perf_counter()
        float(run(seed, k, 4))
        t_small = time.perf_counter() - t_small
        t_big = time.perf_counter()
        float(run(seed, k, 16))
        t_big = time.perf_counter() - t_big
        per = (t_big - t_small) / 12 * 1e3
        results[mult] = per
        print(
            f"width {W:4d} (B={B:2d}, {B // F} programs): {per:7.3f} ms/rep",
            flush=True,
        )
    base = results[1]
    print("scaling vs width-1x:",
          {m: round(results[m] / base, 2) for m in results})
    print("flat (~1.0 at every mult) => fixed-cost/op bound => lane packing"
          " is a measured negative; proportional => packing headroom exists")


if __name__ == "__main__":
    main()
