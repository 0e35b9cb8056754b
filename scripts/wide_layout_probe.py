"""HBM-regime gather: u8 vs u32 table element type (trace-based).

A logical row of W8 bytes stored u8 tiles as (8,128) -> W8/128 scattered
segments per row fetch; u32 tiles as (8,128) words -> W8/512 segments.
If the HBM gather is transaction-bound, wider elements should win in the
wide-table regime (the measured 1.7x u8 win was VMEM-staged, 32 B rows).
"""

import glob
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

B, M = 2048, 48  # smaller batch: per-probe metric, bounded temps
N_TRACE = 3


def trace_ms(fn, inputs):
    np.asarray(fn(*inputs[0]))
    tracedir = "/tmp/jaxtrace_layout"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        outs = [fn(*i) for i in inputs[1:]]
        for o in outs:
            np.asarray(o)
    from xplane_parse import load_xplane_pb2

    xp = load_xplane_pb2()
    f = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.xplane.pb"))[-1]
    sp = xp.XSpace()
    sp.ParseFromString(open(f, "rb").read())
    n = len(inputs) - 1
    for pl in sp.planes:
        if "TPU" not in pl.name:
            continue
        md = pl.event_metadata
        tot = 0.0
        for ln in pl.lines:
            for ev in ln.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else ""
                if name.startswith("jit_"):
                    tot += ev.duration_ps / 1e12
        return tot / n * 1e3
    return float("nan")


def _popcount_u8(x):
    x = x - ((x >> 1) & jnp.uint8(0x55))
    x = (x & jnp.uint8(0x33)) + ((x >> 2) & jnp.uint8(0x33))
    return (x + (x >> 4)) & jnp.uint8(0x0F)


def _popcount_u32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> jnp.uint32(24)


@jax.jit
def count_u8(tbl, rows):
    member = tbl[rows]  # [B, M, W8]
    pc = _popcount_u8(member).astype(jnp.int32)
    return jnp.sum(pc, axis=1)


@jax.jit
def count_u32(tbl, rows):
    member = tbl[rows]  # [B, M, W]
    pc = _popcount_u32(member).astype(jnp.int32)
    return jnp.sum(pc, axis=1)


def main():
    rng = np.random.default_rng(0)
    for T, R in [(1024, 2723899), (4096, 680975)]:
        key = jax.random.key(T)

        def mk(i):
            r = np.random.default_rng(i)
            return (jnp.asarray(
                r.integers(0, R, size=(B, M), dtype=np.int32)
            ),)

        inputs = [mk(i) for i in range(N_TRACE + 1)]
        # content is irrelevant for gather cost: build each layout fresh
        # (jitted: eager u8 random.bits materializes a 4x u32 temp)
        mk8 = jax.jit(
            lambda k: jax.random.bits(k, (R, T), dtype=jnp.uint8),
        )
        tbl8 = mk8(key)
        tbl8.block_until_ready()
        ms8 = trace_ms(lambda rr: count_u8(tbl8, rr), inputs)
        del tbl8
        mk32 = jax.jit(
            lambda k: jax.random.bits(k, (R, T // 4), dtype=jnp.uint32),
        )
        tbl32 = mk32(key)
        tbl32.block_until_ready()
        ms32 = trace_ms(lambda rr: count_u32(tbl32, rr), inputs)
        del tbl32
        probes = B * M
        print(
            f"T={T}: u8 {ms8:7.2f} ms ({ms8*1e6/probes:5.1f} ns/probe) | "
            f"u32 {ms32:7.2f} ms ({ms32*1e6/probes:5.1f} ns/probe)"
        )


if __name__ == "__main__":
    main()
