"""Trace optimization variants of the count chain (truth = xplane trace)."""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/tmp/xp")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

from ganon_tpu.index.ibf import IBF
from ganon_tpu.ops.ibf_query import _popcount_u8, pack_table_u8
from ganon_tpu.ops.minimizers import minimizers_masked_jax
from ganon_tpu.ops.ibf_query import compact_hashes, ibf_row_indices

K, W = 19, 31
B, L = 8192, 150
N_TRACE = 3


def trace_device_total(fn, inputs):
    np.asarray(fn(*inputs[0]))
    tracedir = "/tmp/jaxtrace_var"
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
        durs = {}
        for ln in pl.lines:
            for ev in ln.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                durs[name] = durs.get(name, 0.0) + ev.duration_ps / 1e12
        jit_total = sum(d for nm, d in durs.items() if nm.startswith("jit_"))
        top = sorted(
            ((d, nm) for nm, d in durs.items() if not nm.startswith("jit_")),
            reverse=True,
        )[:4]
        print(f"    jit total {jit_total/n*1e3:8.3f} ms/batch; top ops:")
        for d, nm in top:
            print(f"      {d/n*1e3:8.3f} ms  {nm[:110]}")


def main():
    ibf = IBF.load(".bench_cache/db.ibf")
    cfg = ibf.ibf_config
    T = len(ibf.targets())
    tbl8np, bsnp, benp = pack_table_u8(ibf.bits, ibf.bin_to_target_ids(), T)
    S, R = cfg.hash_functions, cfg.bin_size_bits
    M = 64

    tbl_plain = jnp.asarray(tbl8np)
    tbl_rm = jax.device_put(
        tbl8np,
        Format(
            Layout((0, 1)),
            jax.sharding.SingleDeviceSharding(jax.devices()[0]),
        ),
    )

    rng = np.random.default_rng(0)

    def mk(i):
        rng2 = np.random.default_rng(i)
        rows = jnp.asarray(rng2.integers(0, R, size=(B, M, S), dtype=np.int32))
        mask = jnp.asarray(rng2.random((B, M)) < 0.6)
        return rows, mask

    inputs = [mk(i) for i in range(N_TRACE + 1)]

    def chain_sum(t, rows, mask):
        g = t[rows]
        m = g[:, :, 0, :]
        for s in range(1, S):
            m = m & g[:, :, s, :]
        m = jnp.where(mask[:, :, None], m, jnp.uint8(0))
        pc = _popcount_u8(m).astype(jnp.int32)
        return jnp.sum(pc, axis=1)

    def chain_matmul(t, rows, mask):
        g = t[rows]
        m = g[:, :, 0, :]
        for s in range(1, S):
            m = m & g[:, :, s, :]
        m = jnp.where(mask[:, :, None], m, jnp.uint8(0))
        pc = _popcount_u8(m)  # [B, M, W8] u8, values <= 8
        ones = jnp.ones((M,), dtype=jnp.bfloat16)
        out = jnp.einsum(
            "bmw,m->bw", pc.astype(jnp.bfloat16), ones,
            preferred_element_type=jnp.float32,
        )
        return out.astype(jnp.int32)

    print("A: plain layout, sum reduce")
    trace_device_total(jax.jit(lambda r, m: chain_sum(tbl_plain, r, m)),
                       inputs)
    print("B: row-major table, sum reduce")
    trace_device_total(jax.jit(lambda r, m: chain_sum(tbl_rm, r, m)), inputs)
    print("C: row-major table, MXU matmul reduce")
    trace_device_total(jax.jit(lambda r, m: chain_matmul(tbl_rm, r, m)),
                       inputs)


if __name__ == "__main__":
    main()
