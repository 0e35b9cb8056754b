"""Gather fusion cost vs table row width / probe count (trace-based)."""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/tmp/xp")

import jax
import jax.numpy as jnp
import numpy as np

N_TRACE = 3
NPROBE = 8192 * 64 * 4  # 2.1M, the current per-batch probe count


def trace_jit_total(fn, inputs):
    np.asarray(fn(*inputs[0]))
    tracedir = "/tmp/jaxtrace_w"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        outs = [fn(*i) for i in inputs[1:]]
        for o in outs:
            np.asarray(o)
    import xplane_pb2 as xp

    f = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.xplane.pb"))[-1]
    sp = xp.XSpace()
    sp.ParseFromString(open(f, "rb").read())
    n = len(inputs) - 1
    for pl in sp.planes:
        if "TPU" not in pl.name:
            continue
        md = pl.event_metadata
        jit_total = 0.0
        gather = 0.0
        for ln in pl.lines:
            for ev in ln.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else ""
                if name.startswith("jit_"):
                    jit_total += ev.duration_ps / 1e12
                elif "fusion" in name and "u8[" in name and "gather" not in (
                    name
                ):
                    pass
        return jit_total / n * 1e3
    return float("nan")


def main():
    rng = np.random.default_rng(0)
    total_bytes = 870_575 * 32  # keep table size constant

    for width, nprobe in [
        (32, NPROBE),
        (64, NPROBE),
        (128, NPROBE),
        (256, NPROBE),
        (512, NPROBE),
        (32, NPROBE // 2),
        (32, NPROBE // 4),
        (128, NPROBE // 4),
    ]:
        R = total_bytes // width
        tbl = jnp.asarray(
            rng.integers(0, 256, size=(R, width), dtype=np.uint8)
        )

        def mk(i):
            r2 = np.random.default_rng(i)
            return (
                jnp.asarray(
                    r2.integers(0, R, size=(nprobe,), dtype=np.int32)
                ),
            )

        inputs = [mk(i) for i in range(N_TRACE + 1)]

        @jax.jit
        def g(rows, tbl=tbl):
            x = tbl[rows]
            return jnp.sum(x.astype(jnp.int32), axis=0)

        ms = trace_jit_total(g, inputs)
        ns_per_probe = ms * 1e6 / nprobe
        print(
            f"width {width:4d}B  probes {nprobe//1000:5d}k  "
            f"jit {ms:8.3f} ms  {ns_per_probe:6.2f} ns/probe"
        )


if __name__ == "__main__":
    main()
