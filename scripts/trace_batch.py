"""Device-op trace of the production classify_batch_packed dispatch.

Wall-clock timing through the tunneled device is unreliable (dispatch
elision/latency hide real costs); the xplane device trace records true
per-op durations. Prints the top device ops for one production batch.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ganon_tpu.index.device_build import enable_compile_cache

enable_compile_cache()
from ganon_tpu.index.ibf import IBF
from ganon_tpu.ops.ibf_query import pack_table_u8
from ganon_tpu.classify.device import classify_batch_packed, pack_batch_input

K, W = 19, 31
B, L = 8192, 150
N_TRACE = 3


def main(db=".bench_cache/db_T32.ibf"):
    from ganon_tpu.ops.ibf_query import commit_device_table

    ibf = IBF.load(db)
    cfg = ibf.ibf_config
    T = len(ibf.targets())
    tbl8np, bsnp, benp = pack_table_u8(ibf.bits, ibf.bin_to_target_ids(), T)
    tbl8 = commit_device_table(tbl8np)  # production layout policy
    bs, be = jnp.asarray(bsnp), jnp.asarray(benp)
    print(f"T={T} table={tbl8np.nbytes/1e6:.1f}MB dtype={tbl8.dtype}")

    rng = np.random.default_rng(0)

    def make_batch(i):
        rng2 = np.random.default_rng(i)
        codes1 = rng2.integers(0, 4, size=(B, L), dtype=np.uint8)
        codes2 = rng2.integers(0, 4, size=(B, L), dtype=np.uint8)
        lens = np.full((B,), L, dtype=np.int32)
        return pack_batch_input(codes1, lens, codes2, lens)

    def run(buf):
        # python-scalar thresholds: same jit signature as the engine,
        # so the persistent compile cache from bench/e2e runs hits
        return classify_batch_packed(
            tbl8, bs, be, jnp.asarray(buf),
            0.25, 0.0, 65535,
            k=K, w=W, L1=L, L2=L,
            bin_size=cfg.bin_size_bits,
            hash_functions=cfg.hash_functions,
            top_k=min(128, T), pack16=True,
        )

    np.asarray(run(make_batch(0)))  # warm

    tracedir = "/tmp/jaxtrace_batch"
    os.system(f"rm -rf {tracedir}")
    bufs = [make_batch(i + 1) for i in range(N_TRACE)]
    with jax.profiler.trace(tracedir):
        outs = [run(b) for b in bufs]
        for o in outs:
            np.asarray(o)

    from xplane_parse import op_durations

    f = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.xplane.pb"))[-1]
    durs = op_durations(f)
    if True:
        print("== device plane ==")
        total = 0.0
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {d/N_TRACE*1e3:9.3f} ms  {name[:150]}")
        for name, d in durs.items():
            if not name.startswith("jit_"):
                total += d
        print(f"  (sum of non-jit ops: {total/N_TRACE*1e3:.3f} ms/batch)")


if __name__ == "__main__":
    main(*sys.argv[1:])
