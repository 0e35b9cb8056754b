"""End-to-end run_classify throughput + host-tail profile.

Measures the FULL flagship path — fastq parse, device dispatch,
thresholds, fpr-query, LCA, and .one/.all/.unc/.rep writing — on the
bench database (.bench_cache/db.ibf), with the reference's Python-tier
default thresholds (rel-cutoff 0.75, rel-filter 0.1, fpr-query 1e-5;
reference config.py:604,613,711). Compares against the kernel-only
number so the host tail is visible. Not part of the test suite.

Usage: python scripts/e2e_profile.py [n_reads] [--profile]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

K, W = 19, 31
N_TARGETS = 32
GENOME_LEN = 1_000_000
READ_LEN = 150


def write_paired_fastq(tmp, rng, genomes, n):
    base = np.frombuffer(b"ACGT", dtype=np.uint8)
    qual = b"I" * READ_LEN
    paths = []
    for mate in (1, 2):
        tgt = rng.integers(0, N_TARGETS, size=n)
        pos = rng.integers(0, GENOME_LEN - READ_LEN, size=n)
        idx = np.arange(READ_LEN)
        r = genomes[tgt[:, None], pos[:, None] + idx]
        if mate == 2:
            r = 3 - r[:, ::-1]
        chars = base[r]
        p = os.path.join(tmp, f"r{mate}.fq")
        with open(p, "wb") as f:
            for i in range(n):
                f.write(b"@q%d\n%s\n+\n%s\n" % (i, chars[i].tobytes(), qual))
        paths.append(p)
    return paths


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    do_profile = "--profile" in sys.argv

    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    db = os.path.join(os.path.dirname(__file__), "..", ".bench_cache", "db.ibf")
    if not os.path.exists(db):
        sys.exit("run `python bench.py` once to build .bench_cache/db.ibf")

    rng = np.random.default_rng(42)
    genomes = rng.integers(0, 4, size=(N_TARGETS, GENOME_LEN), dtype=np.uint8)

    tmp = "/tmp/e2e_profile"
    os.makedirs(tmp, exist_ok=True)
    f1 = os.path.join(tmp, "r1.fq")
    if not (os.path.exists(f1) and os.path.getsize(f1) // (4 * (READ_LEN + 6))
            >= n_reads * 0.9):
        t0 = time.time()
        write_paired_fastq(tmp, np.random.default_rng(7), genomes, n_reads)
        print(f"fastq written in {time.time()-t0:.1f}s", file=sys.stderr)

    n_batch = int(os.environ.get("E2E_N_READS", "8192"))
    cfgkw = dict(
        ibf=[db],
        paired_reads=[os.path.join(tmp, "r1.fq"), os.path.join(tmp, "r2.fq")],
        output_prefix=os.path.join(tmp, "res"),
        rel_cutoff=[0.75], rel_filter=[0.1], fpr_query=[1e-5],
        output_all=True, output_lca=True, output_unclassified=True,
        n_reads=n_batch,
        quiet=True,
    )

    # warmup (compile)
    run_classify(ClassifyConfig(**cfgkw))

    if do_profile:
        pr = cProfile.Profile()
        pr.enable()
    t0 = time.time()
    run_classify(ClassifyConfig(**cfgkw))
    dt = time.time() - t0
    if do_profile:
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
        print(s.getvalue())

    print(f"e2e: {n_reads} paired reads in {dt:.2f}s "
          f"({n_reads/dt:,.0f} reads/s)")


if __name__ == "__main__":
    main()
