"""Does fewer-hash-functions sizing win in the VMEM-staged regime too?

The HBM-regime measurements (docs/perf_notes.md "round 2") showed h=1
winning ~linearly because gathers there are transaction-bound. The VMEM
regime was assumed to favor the memory-optimal h (the one old h=2 data
point crossed the staging cliff, confounding the comparison). The cost
model says per-probe cost is FLAT (~2 ns) while the table stays staged,
so h=1 with a 3.1x larger — but still VMEM-resident — table should cut
the dominant gather ~4x. This probe measures the production fused step
on the bench database (32 targets, 1 Mbp each) sized at h = 4 / 2 / 1.

Run on the real TPU:  python scripts/vmem_h_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

K, W = 19, 31
NT = 32
GL = 1_000_000
RL = 150
B = 8192
NB = 8
CHUNK = 1 << 18


def main():
    import jax
    import jax.numpy as jnp

    from ganon_tpu.classify.device import classify_counts_fused
    from ganon_tpu.index.ibf import build_ibf
    from ganon_tpu.index.sizing import VMEM_STAGED_TABLE_BYTES
    from ganon_tpu.ops.ibf_query import pack_table_u8, table_as_u32
    from ganon_tpu.ops.minimizers import window_mins_jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(42)
    genomes = rng.integers(0, 4, size=(NT, GL), dtype=np.uint8)
    step_len = CHUNK - (W - 1)
    starts = list(range(0, GL - W + 1, step_len))
    target_hashes = {}
    for t in range(NT):
        chunks = np.zeros((len(starts), CHUNK), dtype=np.uint8)
        lens = np.zeros(len(starts), dtype=np.int32)
        for i, s in enumerate(starts):
            piece = genomes[t, s : s + CHUNK]
            chunks[i, : len(piece)] = piece
            lens[i] = len(piece)
        mv, valid = window_mins_jax(chunks, lens, k=K, w=W)
        target_hashes[f"T{t}"] = np.unique(np.asarray(mv)[np.asarray(valid)])

    tgt = rng.integers(0, NT, size=(NB, B))
    pos1 = rng.integers(0, GL - RL, size=(NB, B))
    pos2 = rng.integers(0, GL - RL, size=(NB, B))
    idx = np.arange(RL)
    a1 = genomes[tgt[..., None], pos1[..., None] + idx].astype(np.uint8)
    a2 = (3 - genomes[tgt[..., None], pos2[..., None] + idx])[..., ::-1].astype(
        np.uint8
    )
    al = np.full((NB, B), RL, dtype=np.int32)
    j1, j2, jl = jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(al)
    jax.block_until_ready((j1, j2, jl))
    m = RL - W + 1

    variants = []
    for a in sys.argv[1:] or ["4", "2", "1"]:
        h, _, lay = a.partition(":")
        variants.append((int(h), lay or None))
    for h, layout in variants:
        t0 = time.time()
        ibf = build_ibf(
            target_hashes, kmer_size=K, window_size=W, max_fp=0.05,
            hash_functions=h,
        )
        cfg = ibf.ibf_config
        tbl8_np, bs_np, be_np = pack_table_u8(
            ibf.bits, ibf.bin_to_target_ids(), len(ibf.targets())
        )
        # production layout switch (DeviceFilter): u32 word view for
        # tables past the VMEM staging budget; "h:u8"/"h:u32" argv
        # overrides force a layout to locate the real staging cliff
        wide = tbl8_np.nbytes > VMEM_STAGED_TABLE_BYTES
        if layout:
            wide = layout == "u32"
        tbl8 = jnp.asarray(table_as_u32(tbl8_np) if wide else tbl8_np)
        bs, be = jnp.asarray(bs_np), jnp.asarray(be_np)
        print(
            f"h={h}: table {tbl8_np.nbytes/2**20:.1f} MB "
            f"({'u32/HBM' if wide else 'u8/VMEM'}), "
            f"bin_size={cfg.bin_size_bits}, built in {time.time()-t0:.0f}s",
            file=sys.stderr,
        )

        @jax.jit
        def run_all(tbl8, bs, be, j1, j2, jl):
            def body(carry, xs):
                b1, b2, bl = xs
                c, n, _ = classify_counts_fused(
                    tbl8, bs, be, b1, bl, b2, bl,
                    k=K, w=W, m1=m, m2=m,
                    bin_size=cfg.bin_size_bits,
                    hash_functions=cfg.hash_functions,
                )
                return carry + c.sum() + n.sum(), None

            total, _ = jax.lax.scan(body, jnp.int64(0), (j1, j2, jl))
            return total

        int(run_all(tbl8, bs, be, j1, j2, jl))  # compile + fence
        elapsed = float("inf")
        for _ in range(3):
            t0 = time.time()
            int(run_all(tbl8, bs, be, j1, j2, jl))
            elapsed = min(elapsed, time.time() - t0)
        print(
            f"h={h} {'u32' if wide else 'u8'}: {B*NB} paired reads in "
            f"{elapsed:.3f}s ({B*NB/elapsed:,.0f} reads/s)"
        )


if __name__ == "__main__":
    main()
