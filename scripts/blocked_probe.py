"""Blocked-bloom gather shape probe (real chip, trace-based).

A blocked layout stores a filter's h rows consecutively so one gather
element of h*W bytes replaces h separate row fetches. Cost model says
the win is the (h-1) saved fixed transaction costs: ~1.6x at W8=1024,
h=4. This probes ONLY the gather shapes (same total bytes fetched):

  split:  h gathers from u32[R, W]      (today's layout)
  fused:  1 gather  from u32[R/h, h*W]  (blocked layout)

plus the AND/popcount/sum consumers, so the comparison reflects the
whole count pipeline.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from wide_layout_probe import trace_ms
from ganon_tpu.index.device_build import enable_compile_cache
from ganon_tpu.ops.ibf_query import _popcount_u32_bytelanes

enable_compile_cache()

B, M = 2048, 48
N_TRACE = 3


@partial(jax.jit, static_argnames=("h",))
def count_split(tbl, rows, *, h):
    """h separate row gathers + AND (today's path shape)."""
    member = tbl[rows[:, :, 0]]
    for s in range(1, h):
        member = member & tbl[rows[:, :, s]]
    pc = _popcount_u32_bytelanes(member)
    return jnp.sum(pc.astype(jnp.int32), axis=(1, 2))


@partial(jax.jit, static_argnames=("h", "W"))
def count_fused(tblb, brows, *, h, W):
    """One blocked gather of h*W words + AND across the h row slices."""
    blk = tblb[brows]  # [B, M, h*W]
    member = blk[:, :, :W]
    for s in range(1, h):
        member = member & blk[:, :, s * W:(s + 1) * W]
    pc = _popcount_u32_bytelanes(member)
    return jnp.sum(pc.astype(jnp.int32), axis=(1, 2))


def main():
    h = 4
    for W8, R in [(256, 870575), (1024, 870575), (4096, 217644)]:
        W = W8 // 4
        Rb = R // h
        key = jax.random.key(W8)
        tbl = jax.jit(
            lambda k: jax.random.bits(k, (R, W), dtype=jnp.uint32)
        )(key)
        tbl.block_until_ready()

        def mk(i):
            r = np.random.default_rng(i)
            return (jnp.asarray(
                r.integers(0, R, size=(B, M, h), dtype=np.int32)),)

        def mkb(i):
            r = np.random.default_rng(i)
            return (jnp.asarray(
                r.integers(0, Rb, size=(B, M), dtype=np.int32)),)

        ins = [mk(i) for i in range(N_TRACE + 1)]
        ms_split = trace_ms(lambda rr: count_split(tbl, rr, h=h), ins)
        del tbl
        tblb = jax.jit(
            lambda k: jax.random.bits(k, (Rb, h * W), dtype=jnp.uint32)
        )(key)
        tblb.block_until_ready()
        insb = [mkb(i) for i in range(N_TRACE + 1)]
        ms_fused = trace_ms(
            lambda rr: count_fused(tblb, rr, h=h, W=W), insb)
        del tblb
        probes = B * M * h
        print(
            f"W8={W8:5d} ({R*W*4/1e6:5.0f} MB): split {ms_split:7.2f} ms "
            f"({ms_split*1e6/probes:5.1f} ns/probe) | fused {ms_fused:7.2f} "
            f"ms ({ms_fused*1e6/probes:5.1f} ns/probe) "
            f"-> {ms_split/ms_fused:4.2f}x"
        )


if __name__ == "__main__":
    main()
