"""Generate the frozen byte-level codec fixtures under tests/fixtures/.

The committed fixtures freeze (a) the cereal `.ibf`/`.hibf` layouts
(reference write: GanonBuild.cpp:251-288, HIBF serialize:
hierarchical_interleaved_bloom_filter.hpp:163-168), (b) the seqan3 hash
family / seed constants (ops/ibf_query.py), and (c) the minimizer
emission semantics — any drift in reader, writer, hashing, or extraction
breaks tests/test_golden_fixtures.py loudly against bytes and counts
recorded at generation time.

Run ONCE (JAX_PLATFORMS=cpu python scripts/make_golden_fixtures.py) and
commit the outputs; re-running must be a deliberate act that re-freezes
the contract.
"""

import hashlib
import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
K, W = 19, 31


def make_seq(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("ACGT") for _ in range(n))


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def make_reads(rng: random.Random, refs: dict[str, str]) -> dict[str, str]:
    reads = {}
    for i, (t, s) in enumerate(sorted(refs.items())):
        reads[f"r{i}_full"] = s[10:150]
        reads[f"r{i}_mid"] = s[100:180]
    reads["r_junk"] = make_seq(rng, 120)
    reads["r_short"] = make_seq(rng, W - 1)  # below window: skipped
    return reads


def classify_counts(db: str, reads: dict[str, str], tmp: str):
    """Production-path counts: run the real engine, parse .all."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    os.makedirs(tmp, exist_ok=True)
    fq = os.path.join(tmp, "reads.fq")
    with open(fq, "w") as f:
        for rid, s in reads.items():
            f.write(f"@{rid}\n{s}\n+\n{'I' * len(s)}\n")
    out = os.path.join(tmp, "res")
    run_classify(ClassifyConfig(
        ibf=[db], single_reads=[fq], output_prefix=out,
        rel_cutoff=[0.001], rel_filter=[1.0], fpr_query=[1.0],
        output_all=True, quiet=True,
    ))
    counts: dict[str, dict[str, int]] = {}
    with open(out + ".all") as f:
        for line in f:
            rid, t, c = line.rstrip("\n").split("\t")
            counts.setdefault(rid, {})[t] = int(c)
    return counts


def build_ibf_fixture(name: str, hash_functions: int, meta: dict):
    from ganon_tpu.index.ibf import build_ibf
    from ganon_tpu.index.builder import sequence_hashes
    from ganon_tpu.index import serialize

    rng = random.Random(2026)
    refs = {f"tgt{i}": make_seq(rng, 400) for i in range(4)}
    target_hashes = {
        t: np.unique(sequence_hashes(s, K, W)) for t, s in refs.items()
    }
    ibf = build_ibf(
        target_hashes, kmer_size=K, window_size=W, max_fp=0.05,
        hash_functions=hash_functions,
    )
    path = os.path.join(FIXDIR, name)
    serialize.write_ibf(ibf, path)
    with open(path, "rb") as f:
        raw = f.read()
    reads = make_reads(rng, refs)
    counts = classify_counts(path, reads, "/tmp/golden_gen")
    cfg = ibf.ibf_config
    meta[name] = {
        "file_sha256": sha(raw),
        "bits_sha256": sha(np.ascontiguousarray(ibf.bits).tobytes()),
        "config": {
            "n_bins": cfg.n_bins, "max_hashes_bin": cfg.max_hashes_bin,
            "hash_functions": cfg.hash_functions, "kmer_size": cfg.kmer_size,
            "window_size": cfg.window_size,
            "bin_size_bits": cfg.bin_size_bits, "max_fp": cfg.max_fp,
            "true_max_fp": cfg.true_max_fp, "true_avg_fp": cfg.true_avg_fp,
        },
        "hashes_count": ibf.hashes_count,
        "bin_map": [[b, t] for b, t in ibf.bin_map],
        "refs": refs,
        "reads": reads,
        "counts": counts,
    }
    print(f"{name}: {len(raw)} bytes, h={cfg.hash_functions}, "
          f"bins={cfg.n_bins}")


def build_hibf_fixture(name: str, meta: dict):
    from ganon_tpu.index.ibf import build_ibf
    from ganon_tpu.index.builder import sequence_hashes
    from ganon_tpu.index.serialize import write_raptor_hibf

    rng = random.Random(77)
    groups = {
        0: {"tgtA.minimiser": make_seq(rng, 350),
            "tgt---B|||x.minimiser": make_seq(rng, 300)},
        1: {"tgtC.minimiser": make_seq(rng, 420)},
    }
    hashes = {
        g: {f: np.unique(sequence_hashes(s, K, W)) for f, s in fs.items()}
        for g, fs in groups.items()
    }
    child_ibfs = {g: build_ibf(h, kmer_size=K, window_size=W, max_fp=0.05)
                  for g, h in hashes.items()}
    root = build_ibf(
        {f"merged{g}": np.unique(np.concatenate(list(h.values())))
         for g, h in hashes.items()},
        kmer_size=K, window_size=W, max_fp=0.05,
    )
    filenames = [f for g in hashes.values() for f in g]
    fidx = {f: i for i, f in enumerate(filenames)}
    ibfs = [(root.bits, root.ibf_config.n_bins,
             root.ibf_config.hash_functions)]
    next_ibf_id = [np.zeros(root.bits.shape[1] * 32, dtype=np.int64)]
    bin_to_filename = [np.full(root.bits.shape[1] * 32, -1, dtype=np.int64)]
    root_bins = {t: [b for b, tt in root.bin_map if tt == t]
                 for t in root.targets()}
    for gi, g in enumerate(hashes):
        child = child_ibfs[g]
        tb = child.bits.shape[1] * 32
        ibfs.append((child.bits, child.ibf_config.n_bins,
                     child.ibf_config.hash_functions))
        nid = np.full(tb, gi + 1, dtype=np.int64)
        b2f = np.full(tb, -1, dtype=np.int64)
        for b, t in child.bin_map:
            b2f[b] = fidx[t]
        next_ibf_id.append(nid)
        bin_to_filename.append(b2f)
        for b in root_bins[f"merged{g}"]:
            next_ibf_id[0][b] = gi + 1
    path = os.path.join(FIXDIR, name)
    write_raptor_hibf(
        path, window_size=W, kmer_size=K, fpr=0.05,
        filenames=filenames, ibfs=ibfs, next_ibf_id=next_ibf_id,
        bin_to_filename=bin_to_filename,
    )
    with open(path, "rb") as f:
        raw = f.read()
    # reads over the unmangled target names
    refs = {}
    for g, fs in groups.items():
        for f, s in fs.items():
            t = f[: f.find(".minimiser")].replace("|||", ".").replace(
                "---", " ")
            refs[t] = s
    reads = make_reads(rng, refs)
    counts = classify_counts(path, reads, "/tmp/golden_gen_hibf")
    meta[name] = {
        "file_sha256": sha(raw),
        "targets": sorted(refs),
        "refs": refs,
        "reads": reads,
        "counts": counts,
    }
    print(f"{name}: {len(raw)} bytes, {len(filenames)} user bins")


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    meta: dict = {"kmer_size": K, "window_size": W}
    build_ibf_fixture("golden_h1.ibf", 1, meta)
    build_ibf_fixture("golden_h4.ibf", 4, meta)
    build_hibf_fixture("golden.hibf", meta)
    with open(os.path.join(FIXDIR, "golden.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print("fixtures written to", os.path.abspath(FIXDIR))


if __name__ == "__main__":
    main()
