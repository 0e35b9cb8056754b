"""Classification throughput benchmark on one TPU chip — honest regimes.

Two databases (cached under .bench_cache/):
  * T32: 32 targets x 1 Mbp — the table fits the VMEM-staged regime.
  * T1024: 1024 targets x 100 kbp — wide-table HBM/u32 regime (the
    realistic RefSeq-subset shape; BASELINE.md north star).

Two measurements each:
  * kernel: the fused device classify step alone (extract + bulk count
    + aggregation), batched through one lax.scan dispatch.
  * e2e: the FULL run_classify — fastq parse, dispatch pipeline,
    thresholds with the reference's Python-tier defaults (rel-cutoff
    0.75, rel-filter 0.1, fpr-query 1e-5), LCA, .one/.all/.unc output
    writing.

Baseline: the reference publishes no reads/s figure; its only in-tree
classify throughput is the documented toy log of 372.3 Mbp/m
(docs/classification.md:44). vs_baseline is the HEADLINE (end-to-end,
T32) Mbp/m over that number; the kernel and wide-table numbers ride in
"extra".

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N,
   "extra": {...}}
"""

import json
import os
import sys
import time

import numpy as np

K, W = 19, 31
READ_LEN = 150
BATCH = 8192
N_BATCHES = 16
CHUNK = 1 << 18
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

BASELINE_MBP_PER_MIN = 372.3  # reference docs/classification.md:44

REGIMES = {
    # name: (n_targets, genome_len)
    "T32": (32, 1_000_000),
    "T1024": (1024, 100_000),
}


def _cache_current(ibf) -> bool:
    """Does the cached db match what today's sizing policy would build?

    Sizing is cheap (the expensive part is minimizer extraction), so
    re-derive the expected IBFConfig from the cached per-target counts
    and compare — a stale cache after a sizing-policy change would
    otherwise silently bench the old configuration.
    """
    from ganon_tpu.index import sizing

    cfg = sizing.size_filter(
        ibf.hashes_count, kmer_size=K, window_size=W, max_fp=0.05
    )
    got = ibf.ibf_config
    return (
        got.kmer_size == cfg.kmer_size
        and got.window_size == cfg.window_size
        and got.hash_functions == cfg.hash_functions
        and got.bin_size_bits == cfg.bin_size_bits
        and got.n_bins == cfg.n_bins
        and got.max_hashes_bin == cfg.max_hashes_bin
    )


def _genomes(name, n_targets, genome_len):
    rng = np.random.default_rng(42)
    if name != "T32":
        rng = np.random.default_rng(43)
    return rng.integers(0, 4, size=(n_targets, genome_len), dtype=np.uint8)


def build_database(name):
    from ganon_tpu.index.ibf import IBF, build_ibf
    from ganon_tpu.ops.minimizers import window_mins_jax

    n_targets, genome_len = REGIMES[name]
    genomes = _genomes(name, n_targets, genome_len)
    db_path = os.path.join(CACHE_DIR, f"db_{name}.ibf")
    if os.path.exists(db_path):
        try:
            ibf = IBF.load(db_path)
            if _cache_current(ibf):
                return genomes, ibf, db_path
            print(f"cached {name} db stale (sizing changed), rebuilding",
                  file=sys.stderr)
        except Exception:
            pass

    # batch pieces from MANY targets per device call (a per-target loop
    # pays one tunnel round trip per target — minutes at T=1024)
    step = CHUNK - (W - 1)
    pieces = [
        (t, s)
        for t in range(n_targets)
        for s in range(0, genome_len - W + 1, step)
    ]
    width = min(CHUNK, genome_len)
    group = max(1, (16 << 20) // width)
    parts: dict[int, list] = {t: [] for t in range(n_targets)}
    for i in range(0, len(pieces), group):
        grp = pieces[i : i + group]
        chunks = np.zeros((group, width), dtype=np.uint8)  # fixed shape
        lens = np.zeros(group, dtype=np.int32)
        for j, (t, s) in enumerate(grp):
            piece = genomes[t, s : s + CHUNK]
            chunks[j, : len(piece)] = piece
            lens[j] = len(piece)
        mv, valid = window_mins_jax(chunks, lens, k=K, w=W)
        mv, valid = np.asarray(mv), np.asarray(valid)
        for j, (t, s) in enumerate(grp):
            parts[t].append(mv[j][valid[j]])
    target_hashes = {
        f"T{t}": np.unique(np.concatenate(v)) for t, v in parts.items() if v
    }
    ibf = build_ibf(target_hashes, kmer_size=K, window_size=W, max_fp=0.05)
    os.makedirs(CACHE_DIR, exist_ok=True)
    ibf.save(db_path)
    return genomes, ibf, db_path


def sample_paired_reads(rng, genomes, n):
    n_targets, genome_len = genomes.shape
    tgt = rng.integers(0, n_targets, size=n)
    pos1 = rng.integers(0, genome_len - READ_LEN, size=n)
    pos2 = rng.integers(0, genome_len - READ_LEN, size=n)
    idx = np.arange(READ_LEN)
    r1 = genomes[tgt[:, None], pos1[:, None] + idx]
    r2 = 3 - genomes[tgt[:, None], pos2[:, None] + idx][:, ::-1]  # revcomp mate
    lengths = np.full(n, READ_LEN, dtype=np.int32)
    return r1.astype(np.uint8), r2.astype(np.uint8), lengths


def bench_kernel(name, genomes, ibf):
    """Fused device kernel throughput (reads/s).

    Dispatches N_BATCHES fused batches asynchronously (each folds its
    outputs to one scalar on device) and blocks once at the end — the
    same device work as a lax.scan mega-program, but each program stays
    the production per-batch dispatch, so the compile is the same one
    the engine uses and the (tunneled) runtime never has to execute a
    single monolithic multi-hundred-MB-input program.
    """
    import jax
    import jax.numpy as jnp

    from ganon_tpu.classify.device import classify_counts_fused
    from ganon_tpu.ops.ibf_query import commit_device_table, pack_table_u8

    cfg = ibf.ibf_config
    tbl8_np, bstarts_np, bends_np = pack_table_u8(
        ibf.bits, ibf.bin_to_target_ids(), len(ibf.targets())
    )
    # the production layout policy, shared with DeviceFilter
    tbl8 = commit_device_table(tbl8_np)
    bstarts, bends = jnp.asarray(bstarts_np), jnp.asarray(bends_np)
    m = READ_LEN - W + 1

    @jax.jit
    def step(tbl8, bstarts, bends, b1, b2, bl):
        c, n, _ = classify_counts_fused(
            tbl8, bstarts, bends, b1, bl, b2, bl,
            k=K, w=W, m1=m, m2=m,
            bin_size=cfg.bin_size_bits,
            hash_functions=cfg.hash_functions,
        )
        # fold outputs so nothing large leaves the device
        return c.sum(dtype=jnp.int64) + n.sum(dtype=jnp.int64)

    rng = np.random.default_rng(7)
    print(f"[{name}] staging reads on device...", file=sys.stderr)
    batches = []
    for i in range(N_BATCHES):
        r1, r2, ln = sample_paired_reads(rng, genomes, BATCH)
        batches.append(
            (jnp.asarray(r1), jnp.asarray(r2), jnp.asarray(ln))
        )
    jax.block_until_ready(batches)
    print(f"[{name}] staged; compiling kernel...", file=sys.stderr)
    b1, b2, bl = batches[0]
    int(step(tbl8, bstarts, bends, b1, b2, bl))  # compile + fence
    print(f"[{name}] kernel compiled; timing...", file=sys.stderr)
    # tunnel throughput varies run to run; report the best of 3 passes
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.time()
        totals = [
            step(tbl8, bstarts, bends, b1, b2, bl)
            for b1, b2, bl in batches
        ]
        jax.block_until_ready(totals)
        int(totals[-1])  # fence through the tunnel
        elapsed = min(elapsed, time.time() - t0)
    total_reads = BATCH * N_BATCHES
    return total_reads / elapsed


def _reads_fastq(name, genomes, n):
    """Paired fastq on disk for the e2e run (cached)."""
    base = np.frombuffer(b"ACGT", dtype=np.uint8)
    qual = b"I" * READ_LEN
    paths = [os.path.join(CACHE_DIR, f"reads_{name}.{m}.fq") for m in (1, 2)]
    if all(
        os.path.exists(p)
        and os.path.getsize(p) >= n * (READ_LEN + 8) for p in paths
    ):
        return paths
    rng = np.random.default_rng(7)
    r1, r2, _ = sample_paired_reads(rng, genomes, n)
    for p, r in zip(paths, (r1, r2)):
        chars = base[r]
        with open(p, "wb") as f:
            for i in range(n):
                f.write(b"@q%d\n%s\n+\n%s\n" % (i, chars[i].tobytes(), qual))
    return paths


def bench_e2e(name, genomes, db_path, n_reads):
    """Full run_classify throughput (reads/s) with default thresholds
    and .one/.all/.unc writing — the number a user actually gets."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    f1, f2 = _reads_fastq(name, genomes, n_reads)
    out = os.path.join(CACHE_DIR, f"e2e_{name}")
    kw = dict(
        ibf=[db_path], paired_reads=[f1, f2], output_prefix=out,
        rel_cutoff=[0.75], rel_filter=[0.1], fpr_query=[1e-5],
        output_all=True, output_lca=True, output_unclassified=True,
        quiet=True,
    )
    print(f"[{name}] e2e warmup (compiles)...", file=sys.stderr)
    run_classify(ClassifyConfig(**kw))  # warmup (compile)
    print(f"[{name}] e2e timing...", file=sys.stderr)
    elapsed = float("inf")
    for _ in range(2):
        t0 = time.time()
        run_classify(ClassifyConfig(**kw))
        elapsed = min(elapsed, time.time() - t0)
    return n_reads / elapsed


def _emit(extra):
    """Print THE one JSON line from whatever was measured so far.

    Headline: END-TO-END throughput in the easy regime (what a user
    gets, not just the kernel); wide-table and kernel numbers ride in
    extra. Falls back to the kernel number if e2e never completed.
    """
    e2e32 = extra.get("e2e_T32") or extra.get("kernel_T32") or 0.0
    mbp_per_min = e2e32 * 2 * READ_LEN / 1e6 * 60
    print(
        json.dumps(
            {
                "metric": "classify_e2e_reads_per_sec_chip",
                "value": round(e2e32, 1),
                "unit": "reads/s",
                "vs_baseline": round(mbp_per_min / BASELINE_MBP_PER_MIN, 3),
                "extra": extra,
            }
        ),
        flush=True,
    )


def main():
    import threading

    import jax

    from ganon_tpu.index.device_build import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    extra = {}

    # the tunneled device intermittently stalls whole programs for many
    # minutes; emit whatever has been measured rather than hanging the
    # driver (GANON_BENCH_DEADLINE seconds, 0 disables)
    deadline = float(os.environ.get("GANON_BENCH_DEADLINE", "480"))
    if deadline:
        def _watchdog():
            print(f"bench watchdog fired after {deadline:.0f}s; emitting "
                  f"partial results {sorted(extra)}", file=sys.stderr)
            if not extra:
                # a zero-value "success" would be worse than a failure
                print("no metric completed (device stall?)", file=sys.stderr)
                os._exit(3)
            _emit(extra)
            os._exit(0)

        t = threading.Timer(deadline, _watchdog)
        t.daemon = True
        t.start()

    t0 = time.time()
    genomes32, ibf32, db32 = build_database("T32")
    print(f"T32 db ready in {time.time() - t0:.1f}s: {ibf32.ibf_config}",
          file=sys.stderr)
    # e2e first: its programs are the engine's own (most likely cached)
    e2e32 = bench_e2e("T32", genomes32, db32, 131072)
    extra["e2e_T32"] = round(e2e32, 1)
    print(f"e2e T32: {e2e32:,.0f} reads/s", file=sys.stderr)
    extra["kernel_T32"] = round(bench_kernel("T32", genomes32, ibf32), 1)
    print(f"kernel T32: {extra['kernel_T32']:,.0f} reads/s", file=sys.stderr)

    try:
        t0 = time.time()
        genomes1k, ibf1k, db1k = build_database("T1024")
        print(
            f"T1024 db ready in {time.time() - t0:.1f}s: {ibf1k.ibf_config}",
            file=sys.stderr,
        )
        extra["e2e_T1024"] = round(
            bench_e2e("T1024", genomes1k, db1k, 65536), 1
        )
        print(f"e2e T1024: {extra['e2e_T1024']:,.0f} reads/s",
              file=sys.stderr)
        extra["kernel_T1024"] = round(
            bench_kernel("T1024", genomes1k, ibf1k), 1
        )
        print(f"kernel T1024: {extra['kernel_T1024']:,.0f} reads/s",
              file=sys.stderr)
    except Exception as e:  # wide regime must not sink the whole bench
        print(f"wide-table bench failed: {e!r}", file=sys.stderr)

    _emit(extra)
    os._exit(0)  # bypass slow teardown of tunneled device state


if __name__ == "__main__":
    main()
