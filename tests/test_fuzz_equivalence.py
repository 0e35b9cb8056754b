"""Randomized differential testing of the classify paths.

For seeded random (db, reads, thresholds) configurations, the
device-thresholded single-dispatch fast path must match the host
slow path line for line, and both must match an independent numpy
oracle that recomputes counts from per-read minimizer sets and the
built bit-matrix (reference semantics GanonClassify.cpp:630-832).
"""

import math
import random

import numpy as np
import pytest

from ganon_tpu.classify.engine import ClassifyConfig, run_classify
from tests.test_classify import build_db, write_fastq, read_tsv


def _mk_case(rng, n_targets, ref_len, n_reads, paired):
    refs = {
        f"T{i:02d}": "".join(rng.choice("ACGT") for _ in range(ref_len))
        for i in range(n_targets)
    }
    reads1, reads2 = {}, {}
    names = sorted(refs)
    for i in range(n_reads):
        t = names[rng.randrange(len(names))]
        s = rng.randrange(max(ref_len - 80, 1))
        ln = rng.randint(18, 70)
        reads1[f"q{i}"] = refs[t][s : s + ln]
        if paired:
            s2 = rng.randrange(max(ref_len - 80, 1))
            reads2[f"q{i}"] = refs[t][s2 : s2 + rng.randint(18, 70)]
    # junk reads (unclassified + short-skip coverage)
    for i in range(6):
        reads1[f"j{i}"] = "".join(
            rng.choice("ACGT") for _ in range(rng.randint(4, 60)))
        if paired:
            reads2[f"j{i}"] = "".join(
                rng.choice("ACGT") for _ in range(rng.randint(4, 60)))
    return refs, reads1, (reads2 if paired else None)


def _oracle_counts(db_path, refs, reads1, reads2, k, w):
    """Independent per-read per-target counts from the built filter."""
    from ganon_tpu.index.ibf import IBF
    from ganon_tpu.ops.ibf_query import ibf_row_indices_np
    from ganon_tpu.ops.minimizers import minimizers_golden

    def read_hashes(seq):
        # classify semantics: the EMITTED minimizer stream (consecutive
        # duplicates collapsed, later repeats kept) — not the distinct
        # set the builder uses
        vals = minimizers_golden(seq, k=k, w=w)
        return np.asarray(vals, dtype=np.uint64) if len(vals) else \
            np.empty(0, np.uint64)

    ibf = IBF.load(db_path)
    bits = ibf.bits
    b2t = ibf.bin_to_target_ids()
    tnames = ibf.targets()
    out = {}
    for rid in reads1:
        hs = [read_hashes(reads1[rid])]
        if reads2 is not None:
            hs.append(read_hashes(reads2.get(rid, "")))
        h = np.concatenate([x for x in hs if len(x)]) if any(
            len(x) for x in hs) else np.empty(0, np.uint64)
        if len(reads1[rid]) < w:  # mate1 shorter than window: skip read
            out[rid] = (0, {})
            continue
        n = len(h)
        counts = {}
        if n:
            rows = ibf_row_indices_np(
                h, bin_size=ibf.ibf_config.bin_size_bits,
                hash_functions=ibf.ibf_config.hash_functions)
            member = np.ones((n, bits.shape[1] * 32), dtype=bool)
            for s in range(rows.shape[1]):
                r = bits[rows[:, s]]
                bitsrow = (
                    (r[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1
                ).astype(bool).reshape(n, -1)
                member &= bitsrow
            per_bin = member.sum(axis=0)
            for b, t in enumerate(b2t):
                if t < len(tnames):
                    counts[tnames[t]] = counts.get(tnames[t], 0) + int(
                        per_bin[b])
        counts = {t: min(c, n) for t, c in counts.items() if c}
        out[rid] = (n, counts)
    return out


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505, 606])
def test_fuzz_fast_slow_oracle(tmp_path, seed):
    rng = random.Random(seed)
    k = rng.choice([8, 10, 12])
    w = k + rng.choice([0, 2, 4])
    paired = rng.random() < 0.5
    rel_cutoff = rng.choice([0.1, 0.3, 0.6])
    rel_filter = rng.choice([0.0, 0.5, 1.0])
    fpr_query = rng.choice([1.0, 1e-2])
    refs, reads1, reads2 = _mk_case(
        rng, n_targets=rng.randint(3, 9), ref_len=400,
        n_reads=40, paired=paired)
    db = build_db(tmp_path, refs, k=k, w=w, max_fp=0.05)
    f1 = tmp_path / "r1.fq"
    write_fastq(f1, reads1)
    files = {}
    if paired:
        f2 = tmp_path / "r2.fq"
        write_fastq(f2, reads2)
        files = dict(paired_reads=[str(f1), str(f2)])
    else:
        files = dict(single_reads=[str(f1)])

    outs = {}
    for mode in (True, False):
        out = str(tmp_path / f"m{mode}")
        run_classify(ClassifyConfig(
            ibf=[db], output_prefix=out,
            rel_cutoff=[rel_cutoff], rel_filter=[rel_filter],
            fpr_query=[fpr_query],
            output_all=True, output_unclassified=True, output_stats=True,
            device_thresholding=mode, **files,
        ))
        outs[mode] = out
    for ext in (".one", ".unc", ".rep", ".all", ".sta"):
        a = sorted(map(tuple, read_tsv(outs[True] + ext)))
        b = sorted(map(tuple, read_tsv(outs[False] + ext)))
        assert a == b, (ext, seed, k, w, paired, rel_cutoff, rel_filter)

    # oracle: recompute every .all line's count independently
    oracle = _oracle_counts(db, refs, reads1, reads2, k, w)
    allm = read_tsv(outs[True] + ".all")
    for rid, target, cnt in ((r[0], r[1], int(r[2])) for r in allm):
        n, counts = oracle[rid]
        assert counts.get(target) == cnt, (rid, target, seed)
        cutoff = max(math.ceil(n * rel_cutoff), 1)
        assert cnt >= cutoff
    # the .all match set must EQUAL the oracle's: cutoff, then
    # rel-filter, then the per-match binomial-tail fpr-query (the
    # vectorized engine path must decide identically to binom_tail_q)
    from ganon_tpu.classify.thresholds import binom_tail_q
    from ganon_tpu.index.ibf import IBF

    tfpr = IBF.load(db).target_fpr()
    have = {(r[0], r[1]) for r in allm}
    expect = set()
    for rid, (n, counts) in oracle.items():
        if not counts or n == 0:
            continue
        kept = {t: c for t, c in counts.items()
                if c >= max(math.ceil(n * rel_cutoff), 1)}
        if not kept:
            continue
        mx = max(kept.values())
        mn = min(n, min(kept.values()))
        thr = mx - math.ceil((mx - mn) * rel_filter)
        for t, c in kept.items():
            if c < thr:
                continue
            if fpr_query < 1.0 and binom_tail_q(c, n, tfpr[t]) > fpr_query:
                continue
            expect.add((rid, t))
    assert have == expect, (seed, k, w, paired, rel_cutoff, rel_filter,
                            fpr_query)


def _oracle_counts_hibf(db_path, reads1, reads2, k, w):
    """Forest oracle: per-read counts summed over every sub-IBF
    (classes hold disjoint targets; class-local bit matrices)."""
    from ganon_tpu.index.hibf import HIBF
    from ganon_tpu.ops.ibf_query import ibf_row_indices_np
    from ganon_tpu.ops.minimizers import minimizers_golden

    def read_hashes(seq):
        vals = minimizers_golden(seq, k=k, w=w)
        return np.asarray(vals, dtype=np.uint64) if len(vals) else \
            np.empty(0, np.uint64)

    hibf = HIBF.load(db_path)
    out = {}
    for rid in reads1:
        hs = [read_hashes(reads1[rid])]
        if reads2 is not None:
            hs.append(read_hashes(reads2.get(rid, "")))
        h = np.concatenate([x for x in hs if len(x)]) if any(
            len(x) for x in hs) else np.empty(0, np.uint64)
        if len(reads1[rid]) < w:
            out[rid] = (0, {})
            continue
        n = len(h)
        counts = {}
        if n:
            for sub in hibf.subs:
                bits = sub.bits
                b2t = sub.bin_to_target_ids()
                tnames = sub.targets()
                rows = ibf_row_indices_np(
                    h, bin_size=sub.ibf_config.bin_size_bits,
                    hash_functions=sub.ibf_config.hash_functions)
                member = np.ones((n, bits.shape[1] * 32), dtype=bool)
                for s in range(rows.shape[1]):
                    r = bits[rows[:, s]]
                    bitsrow = (
                        (r[:, :, None] >> np.arange(32, dtype=np.uint32))
                        & 1
                    ).astype(bool).reshape(n, -1)
                    member &= bitsrow
                per_bin = member.sum(axis=0)
                for b, t in enumerate(b2t):
                    if t < len(tnames):
                        counts[tnames[t]] = counts.get(
                            tnames[t], 0) + int(per_bin[b])
        counts = {t: min(c, n) for t, c in counts.items() if c}
        out[rid] = (n, counts)
    return out


@pytest.mark.parametrize("seed", [111, 222, 333])
def test_fuzz_forest_fast_slow_oracle(tmp_path, seed):
    """Same differential rig through the HIBF forest path (the
    reference's default filter type): device fast path == host slow
    path == an independent per-sub-IBF numpy oracle."""
    from ganon_tpu.index.hibf import build_hibf
    from ganon_tpu.index.builder import sequence_hashes

    rng = random.Random(seed)
    k = rng.choice([8, 10])
    w = k + rng.choice([0, 2])
    rel_cutoff = rng.choice([0.2, 0.5])
    # skewed ref lengths so the geometric class split actually splits
    refs = {
        f"T{i:02d}": "".join(
            rng.choice("ACGT") for _ in range(120 * (i + 1))
        )
        for i in range(6)
    }
    target_hashes = {
        t: np.unique(sequence_hashes(s, k, w)) for t, s in refs.items()
    }
    hibf = build_hibf(target_hashes, kmer_size=k, window_size=w,
                      max_fp=0.05, num_classes=3)
    assert len(hibf.subs) >= 2  # a real forest, not one class
    db = str(tmp_path / "f.hibf")
    hibf.save(db)

    reads1 = {}
    for i in range(30):
        t = list(refs)[i % len(refs)]
        s = rng.randint(0, max(len(refs[t]) - 40, 1))
        reads1[f"q{i}"] = refs[t][s : s + 40]
    for i in range(6):
        reads1[f"j{i}"] = "".join(rng.choice("ACGT") for _ in range(40))
    f1 = tmp_path / "r1.fq"
    write_fastq(f1, reads1)

    outs = {}
    for mode in (True, False):
        out = str(tmp_path / f"fm{mode}")
        run_classify(ClassifyConfig(
            ibf=[db], single_reads=[str(f1)], output_prefix=out,
            rel_cutoff=[rel_cutoff], rel_filter=[1.0], fpr_query=[1.0],
            output_all=True, output_unclassified=True,
            device_thresholding=mode,
        ))
        outs[mode] = out
    for ext in (".one", ".unc", ".rep", ".all"):
        a = sorted(map(tuple, read_tsv(outs[True] + ext)))
        b = sorted(map(tuple, read_tsv(outs[False] + ext)))
        assert a == b, (ext, seed, k, w)

    oracle = _oracle_counts_hibf(db, reads1, None, k, w)
    allm = read_tsv(outs[True] + ".all")
    have = {(r[0], r[1]) for r in allm}
    expect = set()
    for rid, target, cnt in ((r[0], r[1], int(r[2])) for r in allm):
        n, counts = oracle[rid]
        assert counts.get(target) == cnt, (rid, target, seed)
        assert cnt >= max(math.ceil(n * rel_cutoff), 1)
    for rid, (n, counts) in oracle.items():
        for t, c in counts.items():
            if n and c >= max(math.ceil(n * rel_cutoff), 1):
                expect.add((rid, t))
    assert have == expect, (seed, k, w, rel_cutoff)
