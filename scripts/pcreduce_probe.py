"""Probe: popcount group-reduce variants for bulk_target_counts_u32.

The round-3 trace showed the grouped accumulation staging through an
odd pad-to-[B,2,31,W] + reduce (1.55 + 0.69 ms/batch at T=1024,
W=256 u32 words). Candidates:

  g31   current: G=31 (max lane-safe group), pad M=48 -> 62
  g16   G=16: divides M=48 exactly (no pad), power-of-two reduce
  g8    G=8:  M is always a multiple of 8 (compact_width rounds up)
  tree  pairwise halving adds 48->24->12->6->3 (no reshape-reduce)

All are exact: per-byte popcounts <= 8, so G <= 31 groups stay inside
u32 byte lanes (G*8 <= 248 < 256). Run on the real chip; op times from
the xplane trace (wall clock through the tunnel is unreliable).
"""

import glob
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ganon_tpu.index.device_build import enable_compile_cache

enable_compile_cache()
from ganon_tpu.ops.ibf_query import (
    _popcount_u32_bytelanes,
    _segment_matmul,
    commit_device_table,
)

B, M, S = 8192, 48, 1
R, W = 274_000, 256  # ~281 MB u32 table (T=1024 bench shape)
T = 1024
N_TRACE = 4


def _expand_sum(grp, byte_starts, byte_ends, n_hashes):
    """Shared tail: byte-lane expansion + segment matmul."""
    Bv, Gn, Wv = grp.shape
    shifts = jnp.arange(4, dtype=jnp.uint32) * jnp.uint32(8)
    pcb = ((grp[:, :, :, None] >> shifts) & jnp.uint32(0xFF)).astype(jnp.int32)
    cw = jnp.sum(pcb, axis=1).reshape(Bv, -1)
    return _segment_matmul(cw, byte_starts, byte_ends, max_val=8 * n_hashes)


def _member_pc(tbl32, rows, mask):
    member = tbl32[rows[:, :, 0]]
    for s in range(1, rows.shape[2]):
        member = member & tbl32[rows[:, :, s]]
    member = jnp.where(mask[:, :, None], member, jnp.uint32(0))
    return _popcount_u32_bytelanes(member)


@partial(jax.jit, static_argnames=("G",))
def counts_grouped(tbl32, rows, mask, bs, be, *, G: int):
    pc = _member_pc(tbl32, rows, mask)
    Bv, Mv, Wv = pc.shape
    Mp = -(-Mv // G) * G
    if Mp != Mv:
        pc = jnp.pad(pc, ((0, 0), (0, Mp - Mv), (0, 0)))
    grp = jnp.sum(pc.reshape(Bv, Mp // G, G, Wv), axis=2, dtype=jnp.uint32)
    return _expand_sum(grp, bs, be, rows.shape[1])


@jax.jit
def counts_tree(tbl32, rows, mask, bs, be):
    pc = _member_pc(tbl32, rows, mask)
    # pairwise halving adds; stop before byte lanes can overflow
    # (values <=8 -> 4 doublings reach <=128)
    for _ in range(4):
        Mv = pc.shape[1]
        if Mv % 2:
            pc = jnp.pad(pc, ((0, 0), (0, 1), (0, 0)))
            Mv += 1
        pc = pc[:, 0::2] + pc[:, 1::2]
    return _expand_sum(pc, bs, be, rows.shape[1])


def main():
    rng = np.random.default_rng(0)
    tbl8 = rng.integers(0, 256, size=(R, W * 4), dtype=np.uint8)
    tbl32 = commit_device_table(tbl8, u32_threshold_bytes=0)
    assert tbl32.dtype == jnp.uint32
    mask = jnp.ones((B, M), dtype=bool)
    per = (W * 4) // T
    bs = jnp.arange(T, dtype=jnp.int32) * per
    be = bs + per

    variants = {
        "g31": partial(counts_grouped, G=31),
        "g16": partial(counts_grouped, G=16),
        "g8": partial(counts_grouped, G=8),
        "tree": counts_tree,
    }
    rows_np = [
        rng.integers(0, R, size=(B, M, S), dtype=np.int32)
        for _ in range(N_TRACE + 1)
    ]
    rows_dev = [jnp.asarray(r) for r in rows_np]

    from xplane_parse import op_durations

    for name, fn in variants.items():
        np.asarray(fn(tbl32, rows_dev[0], mask, bs, be))  # warm
        tracedir = f"/tmp/jaxtrace_pcr_{name}"
        os.system(f"rm -rf {tracedir}")
        with jax.profiler.trace(tracedir):
            outs = [fn(tbl32, r, mask, bs, be) for r in rows_dev[1:]]
            for o in outs:
                np.asarray(o)
        f = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.xplane.pb"))[-1]
        durs = op_durations(f)
        total = sum(d for n, d in durs.items() if not n.startswith("jit_"))
        print(f"== {name}: {total / N_TRACE * 1e3:.3f} ms/batch ==")
        for opname, d in sorted(durs.items(), key=lambda kv: -kv[1])[:8]:
            print(f"  {d / N_TRACE * 1e3:9.3f} ms  {opname[:120]}")

    # cross-check exactness of all variants against each other
    outs = {
        name: np.asarray(fn(tbl32, rows_dev[0], mask, bs, be))
        for name, fn in variants.items()
    }
    base = outs.pop("g31")
    for name, o in outs.items():
        assert np.array_equal(base, o), f"{name} diverges from g31"
    print("all variants agree")


if __name__ == "__main__":
    main()
