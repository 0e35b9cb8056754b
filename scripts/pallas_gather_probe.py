"""Measure Pallas/Mosaic dynamic row-load rate vs XLA's native gather.

Decides whether a fused Pallas bulk-count kernel can beat the XLA
gather path (which pays ~1.9ns/probe + layout copies).
"""

import functools
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/tmp/xp")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 1 << 17          # table rows (4MB table — fits VMEM comfortably)
W8 = 32
NPROBE = 1 << 20     # 1M probes
BT = 2048            # probes per grid step
N_TRACE = 3


def pallas_count(tbl, rows):
    """sum over probes of popcount(tbl[row]) per byte -> [W8] i32."""

    def kernel(rows_ref, tbl_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(m, acc):
            r = rows_ref[0, 0, m]
            v = tbl_ref[r >> 4, :].reshape(1, 128)
            x = v - ((v >> 1) & jnp.uint32(0x55555555))
            x = (x & jnp.uint32(0x33333333)) + (
                (x >> 2) & jnp.uint32(0x33333333))
            x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
            pc = ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)
            q = (r & 15).astype(jnp.int32)
            pc = jnp.where((lane >> 3) == q, pc, 0)
            return acc + pc

        acc = jax.lax.fori_loop(
            0, BT, body, jnp.zeros((1, 128), dtype=jnp.int32)
        )
        out_ref[...] += acc

    grid = NPROBE // BT
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BT), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R // 16, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(rows.reshape(grid, 1, BT),
       tbl.reshape(-1).view(jnp.uint32).reshape(R // 16, 128))


def xla_count(tbl, rows):
    g = tbl[rows]  # [N, W8]
    x = g - ((g >> 1) & jnp.uint8(0x55))
    x = (x & jnp.uint8(0x33)) + ((x >> 2) & jnp.uint8(0x33))
    pc = ((x + (x >> 4)) & jnp.uint8(0x0F)).astype(jnp.int32)
    return pc.sum(axis=0, keepdims=True)


def trace_it(fn, inputs, label):
    np.asarray(fn(*inputs[0]))
    os.system("rm -rf /tmp/jt")
    with jax.profiler.trace("/tmp/jt"):
        outs = [fn(*i) for i in inputs[1:]]
        for o in outs:
            np.asarray(o)
    import xplane_pb2 as xp

    f = sorted(glob.glob("/tmp/jt/plugins/profile/*/*.xplane.pb"))[-1]
    sp = xp.XSpace()
    sp.ParseFromString(open(f, "rb").read())
    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        tot = sum(
            ev.duration_ps / 1e12
            for ln in plane.lines
            for ev in ln.events
            if md[ev.metadata_id].name.startswith("jit_")
        )
        n = len(inputs) - 1
        print(f"{label}: {tot/n*1e3:8.3f} ms  "
              f"({tot/n/NPROBE*1e9:.2f} ns/probe)")


def main():
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 256, size=(R, W8), dtype=np.uint8))

    def mk(i):
        r = np.random.default_rng(i)
        return (jnp.asarray(r.integers(0, R, size=(NPROBE,), dtype=np.int32)),)

    inputs = [mk(i) for i in range(N_TRACE + 1)]
    trace_it(jax.jit(lambda r: xla_count(tbl, r)), inputs, "XLA gather+popcount")
    trace_it(jax.jit(lambda r: pallas_count(tbl, r)), inputs,
             "Pallas loop kernel  ")


if __name__ == "__main__":
    main()
