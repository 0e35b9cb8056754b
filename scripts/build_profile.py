"""Profile the build-side pipeline at scale.

Feeds synthetic encoded genome pieces straight into the device build
pipeline (isolating it from fasta parsing) and reports Mbp/m for the
count pass, sizing, and the scatter pass.

Usage: python scripts/build_profile.py [total_mbp] [n_targets]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

K, W = 19, 31


def main(total_mbp: float, n_targets: int):
    import jax

    from ganon_tpu.index import sizing
    from ganon_tpu.index.config import IBFConfig
    from ganon_tpu.index.device_build import CHUNK, DeviceBuildPipeline

    print("device:", jax.devices()[0], file=sys.stderr)
    rng = np.random.default_rng(0)
    per_target = int(total_mbp * 1e6 / n_targets)
    total_bp = per_target * n_targets

    pipe = DeviceBuildPipeline(K, W)
    t0 = time.monotonic()
    gen = 0.0
    for t in range(n_targets):
        remaining = per_target
        while remaining > 0:
            n = min(CHUNK, remaining)
            g0 = time.monotonic()
            piece = rng.integers(0, 4, size=n, dtype=np.uint8)
            gen += time.monotonic() - g0
            pipe.add_encoded((f"T{t}", 0), piece)
            remaining -= n - (W - 1) if n == CHUNK else remaining
    t_ingest = time.monotonic() - t0 - gen

    t0 = time.monotonic()
    pipe.finish_counts()
    t_counts = time.monotonic() - t0
    hashes_count = {t: c for t, c in pipe.hashes_count().items() if c}

    t0 = time.monotonic()
    icfg = sizing.size_filter(
        hashes_count, kmer_size=K, window_size=W, max_fp=0.05
    )
    t_sizing = time.monotonic() - t0

    t0 = time.monotonic()
    bits = pipe.scatter(icfg)
    t_scatter = time.monotonic() - t0
    pipe.close()

    total = t_ingest + t_counts + t_sizing + t_scatter
    print(
        f"ingest+extract {t_ingest:.1f}s | counts {t_counts:.1f}s | "
        f"sizing {t_sizing:.1f}s | scatter {t_scatter:.1f}s"
    )
    print(
        f"build: {total_bp/1e6:.0f} Mbp in {total:.1f}s "
        f"= {total_bp/1e6/(total/60):,.0f} Mbp/m   "
        f"(filter {bits.nbytes/1e6:.0f} MB, "
        f"{sum(hashes_count.values())/1e6:.1f}M hashes, {icfg})"
    )


if __name__ == "__main__":
    main(
        float(sys.argv[1]) if len(sys.argv) > 1 else 128,
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
    )
