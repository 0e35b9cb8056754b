"""End-to-end classify tests with exact hand-computable k-mer counts.

Mirrors the reference's Catch2 scenario strategy
(tests/ganon-classify/GanonClassify.test.cpp): build tiny filters from
synthetic sequences, classify reads, and assert exact `.all` counts under
every rel-cutoff/rel-filter combination, plus LCA/.one/.unc/.rep semantics
and the consistency oracle.
"""

import math
import os
import random

import numpy as np
import pytest

from ganon_tpu.classify.engine import ClassifyConfig, run_classify
from ganon_tpu.index.builder import BuildConfig, run_build
from ganon_tpu.ops.minimizers import minimizers_golden


K, W = 4, 4  # k == w: minimizers == all canonical k-mers (exact counting)


def write_fasta(path, entries):
    with open(path, "w") as f:
        for name, seq in entries.items():
            f.write(f">{name}\n{seq}\n")


def write_fastq(path, entries):
    with open(path, "w") as f:
        for name, seq in entries.items():
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def build_db(tmp_path, refs, name="db", k=K, w=W, max_fp=0.001, **kw):
    fa = tmp_path / f"{name}.fasta"
    write_fasta(fa, refs)
    info = tmp_path / f"{name}_info.tsv"
    with open(info, "w") as f:
        for t in refs:
            f.write(f"{fa}\t{t}\n")
    # one target per ref: write one file per target for per-target hashing
    with open(info, "w") as f:
        for t, seq in refs.items():
            p = tmp_path / f"{name}_{t}.fa"
            write_fasta(p, {t: seq})
            f.write(f"{p}\t{t}\n")
    out = str(tmp_path / f"{name}.ibf")
    cfg = BuildConfig(
        input_file=str(info), output_file=out, kmer_size=k, window_size=w,
        max_fp=max_fp, **kw,
    )
    run_build(cfg)
    return out


def write_tax(path, rows):
    with open(path, "w") as f:
        for row in rows:
            f.write("\t".join(row) + "\n")
    return str(path)


def read_tsv(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [line.rstrip("\n").split("\t") for line in f if line.strip()]


def expected_counts(read_seqs, refs, k=K, w=W):
    """Oracle: per-target count = #read minimizer occurrences in ref set."""
    read_mins = []
    for s in read_seqs:
        read_mins.extend(minimizers_golden(s, k=k, w=w))
    out = {}
    for t, rs in refs.items():
        ref_set = set(minimizers_golden(rs, k=k, w=w))
        out[t] = sum(1 for m in read_mins if m in ref_set)
    return out, len(read_mins)


def apply_thresholds(counts, n_hashes, rel_cutoff, rel_filter):
    """Oracle for cutoff+filter semantics (GanonClassify.cpp:719-758)."""
    cutoff = max(1, math.ceil(n_hashes * rel_cutoff))
    kept = {t: c for t, c in counts.items() if c >= cutoff}
    if not kept:
        return {}
    mx = max(kept.values())
    mn = min(n_hashes, min(kept.values()))
    thr = mx - math.ceil((mx - mn) * rel_filter)
    return {t: c for t, c in kept.items() if c >= thr}


@pytest.fixture(scope="module")
def ladder(tmp_path_factory):
    """Reference ladder: reads against refs with varying overlap."""
    tmp = tmp_path_factory.mktemp("ladder")
    rng = random.Random(42)
    base = "".join(rng.choice("ACGT") for _ in range(12))

    def mutate(s, pos):
        alt = {"A": "C", "C": "G", "G": "T", "T": "A"}
        return s[:pos] + alt[s[pos]] + s[pos + 1 :]

    refs = {
        "E0": base,                    # identical
        "E1": mutate(base, 6),         # one error
        "E2": mutate(mutate(base, 3), 8),  # two errors
        "XX": "".join(rng.choice("ACGT") for _ in range(40)),  # unrelated
    }
    db = build_db(tmp, refs)
    reads = {"read0": base}
    fq = tmp / "reads.fq"
    write_fastq(fq, reads)
    return tmp, refs, db, reads, str(fq)


@pytest.mark.parametrize("rel_cutoff", [0, 0.2, 0.5, 0.9])
@pytest.mark.parametrize("rel_filter", [0, 0.5, 1.0])
def test_exact_count_ladder(ladder, rel_cutoff, rel_filter, tmp_path):
    tmp, refs, db, reads, fq = ladder
    out_prefix = str(tmp_path / f"res_{rel_cutoff}_{rel_filter}")
    cfg = ClassifyConfig(
        ibf=[db],
        single_reads=[fq],
        output_prefix=out_prefix,
        rel_cutoff=[rel_cutoff],
        rel_filter=[rel_filter],
        output_all=True,
        output_unclassified=True,
    )
    run_classify(cfg)

    counts, n_hashes = expected_counts([reads["read0"]], refs)
    want = apply_thresholds(counts, n_hashes, rel_cutoff, rel_filter)

    got = {}
    for rid, target, c in read_tsv(out_prefix + ".all"):
        assert rid == "read0"
        got[target] = int(c)
    assert got == want


def test_paired_and_rep(tmp_path):
    rng = random.Random(1)
    refs = {
        "G1": "".join(rng.choice("ACGT") for _ in range(80)),
        "G2": "".join(rng.choice("ACGT") for _ in range(80)),
    }
    db = build_db(tmp_path, refs)
    r1 = {"p1": refs["G1"][:30], "p2": refs["G2"][10:40]}
    r2 = {"p1": refs["G1"][40:70], "p2": refs["G2"][50:80]}
    f1, f2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(f1, r1)
    write_fastq(f2, r2)

    out_prefix = str(tmp_path / "paired")
    cfg = ClassifyConfig(
        ibf=[db],
        paired_reads=[str(f1), str(f2)],
        output_prefix=out_prefix,
        rel_cutoff=[0.25],
        output_all=True,
        output_stats=True,
    )
    run_classify(cfg)

    for rid, (m1, m2) in zip(["p1", "p2"], [(r1["p1"], r2["p1"]), (r1["p2"], r2["p2"])]):
        counts, n_hashes = expected_counts([m1, m2], refs)
        want = apply_thresholds(counts, n_hashes, 0.25, 0.0)
        got = {t: int(c) for r, t, c in read_tsv(out_prefix + ".all") if r == rid}
        assert got == want, rid

    rep = read_tsv(out_prefix + ".rep")
    trailer = {r[0]: int(r[1]) for r in rep if r[0].startswith("#")}
    assert trailer["#total_classified"] == 2
    assert trailer["#total_unclassified"] == 0
    rows = [r for r in rep if not r[0].startswith("#")]
    for r in rows:
        assert r[0] == "H1"
    assert os.path.exists(out_prefix + ".sta")


def test_lca_one_output_homopolymers(tmp_path):
    # reference fixture: polyA read matches refs A and T (revcomp), LCA=AT
    k = w = 10
    refs = {"A": "A" * 40, "C": "C" * 40, "T": "T" * 40, "G": "G" * 40}
    db = build_db(tmp_path, refs, k=k, w=w)
    tax = write_tax(
        tmp_path / "db.tax",
        [
            ("1", "0", "no rank", "root"),
            ("AT", "1", "genus", "AT"),
            ("CG", "1", "genus", "CG"),
            ("A", "AT", "species", "A"),
            ("T", "AT", "species", "T"),
            ("C", "CG", "species", "C"),
            ("G", "CG", "species", "G"),
        ],
    )
    reads = {"readA": "A" * 20, "readC": "C" * 20}
    fq = tmp_path / "reads.fq"
    write_fastq(fq, reads)
    out_prefix = str(tmp_path / "lca")
    cfg = ClassifyConfig(
        ibf=[db],
        tax=[tax],
        single_reads=[str(fq)],
        output_prefix=out_prefix,
        rel_cutoff=[0.2],
        output_lca=True,
        output_all=True,
    )
    run_classify(cfg)

    one = {r[0]: (r[1], int(r[2])) for r in read_tsv(out_prefix + ".one")}
    assert one["readA"][0] == "AT"
    assert one["readC"][0] == "CG"
    assert one["readA"][1] == 11  # 20 - 10 + 1 windows, k == w

    allm = read_tsv(out_prefix + ".all")
    a_targets = sorted(t for r, t, c in allm if r == "readA")
    assert a_targets == ["A", "T"]

    rep = {r[1]: r for r in read_tsv(out_prefix + ".rep") if not r[0].startswith("#")}
    assert int(rep["AT"][4]) == 1  # seqs_lca for AT
    assert rep["AT"][5] == "genus" and rep["AT"][6] == "AT"


def test_skip_lca_root_accounting(tmp_path):
    k = w = 10
    refs = {"A": "A" * 40, "T": "T" * 40}
    db = build_db(tmp_path, refs, k=k, w=w)
    reads = {"readA": "A" * 20}
    fq = tmp_path / "r.fq"
    write_fastq(fq, reads)
    out_prefix = str(tmp_path / "skip")
    cfg = ClassifyConfig(
        ibf=[db],
        single_reads=[str(fq)],
        output_prefix=out_prefix,
        rel_cutoff=[0.2],
        skip_lca=True,
    )
    run_classify(cfg)
    rep = {r[1]: r for r in read_tsv(out_prefix + ".rep") if not r[0].startswith("#")}
    # multi-match with skip-lca counts toward the root node "1"
    assert int(rep["1"][4]) == 1


def test_two_level_hierarchy(tmp_path):
    rng = random.Random(3)
    refs1 = {"L1": "".join(rng.choice("ACGT") for _ in range(60))}
    refs2 = {"L2": "".join(rng.choice("ACGT") for _ in range(60))}
    db1 = build_db(tmp_path, refs1, name="db1", k=10, w=10)
    db2 = build_db(tmp_path, refs2, name="db2", k=10, w=10)
    reads = {
        "hit1": refs1["L1"][:20],
        "hit2": refs2["L2"][:20],
        "miss": "A" * 20,
    }
    fq = tmp_path / "reads.fq"
    write_fastq(fq, reads)
    out_prefix = str(tmp_path / "hier")
    cfg = ClassifyConfig(
        ibf=[db1, db2],
        hierarchy_labels=["1_first", "2_second"],
        single_reads=[str(fq)],
        output_prefix=out_prefix,
        rel_cutoff=[0.6],
        output_all=True,
        output_unclassified=True,
    )
    run_classify(cfg)

    all1 = read_tsv(out_prefix + ".1_first.all")
    all2 = read_tsv(out_prefix + ".2_second.all")
    assert {r[0] for r in all1} == {"hit1"}
    assert {r[0] for r in all2} == {"hit2"}  # hit1 NOT re-classified
    unc = [r[0] for r in read_tsv(out_prefix + ".unc")]
    assert unc == ["miss"]
    rep = read_tsv(out_prefix + ".rep")
    labels = {r[0] for r in rep if not r[0].startswith("#")}
    assert labels == {"1_first", "2_second"}


def test_consistency_oracle(tmp_path):
    # sanity_check analogue: #classified == distinct .all reads == .one
    # lines; .unc == unclassified (GanonClassify.test.cpp:147-168)
    rng = random.Random(9)
    refs = {f"R{i}": "".join(rng.choice("ACGT") for _ in range(100)) for i in range(5)}
    db = build_db(tmp_path, refs)
    tax_rows = [("1", "0", "no rank", "root")] + [
        (t, "1", "species", t) for t in refs
    ]
    tax = write_tax(tmp_path / "db.tax", tax_rows)
    reads = {}
    for i in range(30):
        t = f"R{i % 5}"
        s = rng.randint(0, 70)
        reads[f"q{i}"] = refs[t][s : s + 30]
    for i in range(5):
        reads[f"junk{i}"] = "".join(rng.choice("ACGT") for _ in range(30))
    fq = tmp_path / "reads.fq"
    write_fastq(fq, reads)
    out_prefix = str(tmp_path / "cons")
    cfg = ClassifyConfig(
        ibf=[db],
        tax=[tax],
        single_reads=[str(fq)],
        output_prefix=out_prefix,
        rel_cutoff=[0.25],
        output_lca=True,
        output_all=True,
        output_unclassified=True,
        output_stats=True,
    )
    stats = run_classify(cfg)

    tot = stats["totals"][""]
    all_reads = {r[0] for r in read_tsv(out_prefix + ".all")}
    one_lines = read_tsv(out_prefix + ".one")
    unc = read_tsv(out_prefix + ".unc")
    assert len(all_reads) == tot.seqs_classified
    assert len(one_lines) == tot.seqs_classified
    assert len(unc) == len(reads) - tot.seqs_classified
    # .rep trailer consistent
    rep = read_tsv(out_prefix + ".rep")
    trailer = {r[0]: int(r[1]) for r in rep if r[0].startswith("#")}
    assert trailer["#total_classified"] == tot.seqs_classified
    assert trailer["#total_unclassified"] == len(reads) - tot.seqs_classified
    # unique + lca sums match classified
    rows = [r for r in rep if not r[0].startswith("#")]
    uniq = sum(int(r[3]) for r in rows)
    lca = sum(int(r[4]) for r in rows)
    assert uniq + lca == tot.seqs_classified


def test_short_reads_skipped(tmp_path):
    refs = {"A": "A" * 40}
    db = build_db(tmp_path, refs, k=10, w=20)
    reads = {"tiny": "A" * 10}  # shorter than window
    fq = tmp_path / "r.fq"
    write_fastq(fq, reads)
    out_prefix = str(tmp_path / "short")
    cfg = ClassifyConfig(
        ibf=[db], single_reads=[str(fq)], output_prefix=out_prefix,
        output_unclassified=True,
    )
    stats = run_classify(cfg)
    assert stats["totals"][""].seqs_skipped_small == 1
    assert [r[0] for r in read_tsv(out_prefix + ".unc")] == ["tiny"]


def _mk_db(tmp_path, name, targets, rng, glen=8000):
    import numpy as np

    from ganon_tpu.index.ibf import build_ibf
    from ganon_tpu.ops.minimizers import window_mins_jax

    genomes, th = {}, {}
    for t in targets:
        g = rng.integers(0, 4, size=glen, dtype=np.uint8)
        genomes[t] = g
        mv, valid = window_mins_jax(
            g[None, :], np.asarray([glen], dtype=np.int32), k=19, w=31
        )
        th[t] = np.unique(np.asarray(mv)[np.asarray(valid)])
    ibf = build_ibf(th, kmer_size=19, window_size=31, max_fp=0.05)
    path = tmp_path / f"{name}.ibf"
    ibf.save(str(path))
    return str(path), genomes


def _mk_reads(tmp_path, name, genomes, rng, n=120, L=150):
    reads = tmp_path / f"{name}.fq"
    keys = list(genomes)
    with open(reads, "w") as f:
        for i in range(n):
            g = genomes[keys[i % len(keys)]]
            s = rng.integers(0, len(g) - L)
            seq = "".join("ACGT"[c] for c in g[s : s + L])
            f.write(f"@r{name}{i}\n{seq}\n+\n{'I' * L}\n")
    return str(reads)


def test_multi_db_single_level(tmp_path):
    """Two databases on one hierarchy level: per-read max across filters."""
    import numpy as np

    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    rng = np.random.default_rng(11)
    db1, g1 = _mk_db(tmp_path, "db1", ["A", "B"], rng)
    db2, g2 = _mk_db(tmp_path, "db2", ["C", "D"], rng)
    reads = _mk_reads(tmp_path, "r", {**g1, **g2}, rng)
    prefix = str(tmp_path / "out")
    cfg = ClassifyConfig(
        ibf=[db1, db2],
        single_reads=[reads],
        output_prefix=prefix,
        output_all=True,
        rel_cutoff=[0.25],
    )
    run_classify(cfg)
    rep = [ln.split("\t") for ln in open(prefix + ".rep") if not
           ln.startswith("#")]
    matched = {r[1] for r in rep}
    # reads drawn from all four targets must match in both databases
    assert {"A", "B", "C", "D"} <= matched
    allm = [ln.split("\t") for ln in open(prefix + ".all")]
    assert len({r[0] for r in allm}) > 100  # most reads classified


def test_batch_reads_matches_single(tmp_path):
    """--batch-reads == the same files classified as --single-reads."""
    import numpy as np

    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    rng = np.random.default_rng(12)
    db, genomes = _mk_db(tmp_path, "db", ["A", "B", "C"], rng)
    r1 = _mk_reads(tmp_path, "s1", genomes, rng, n=80)
    r2 = _mk_reads(tmp_path, "s2", genomes, rng, n=60)

    single_all = []
    for i, r in enumerate((r1, r2)):
        pref_single = str(tmp_path / f"single{i}_")
        cfg = ClassifyConfig(
            ibf=[db], single_reads=[r], output_prefix=pref_single,
            output_all=True, rel_cutoff=[0.25],
        )
        run_classify(cfg)
        single_all.extend(open(pref_single + ".all"))

    batch_tsv = tmp_path / "batch.tsv"
    with open(batch_tsv, "w") as f:
        f.write(f"b1\t{r1}\nb2\t{r2}\n")
    pref_batch = str(tmp_path / "batch_")
    cfg = ClassifyConfig(
        ibf=[db], batch_reads=[str(batch_tsv)], output_prefix=pref_batch,
        output_all=True, rel_cutoff=[0.25],
    )
    run_classify(cfg)

    # batch mode emits per-prefix outputs; their union must equal the
    # single-file runs' outputs (reference asserts the same equivalence,
    # GanonClassify.test.cpp:399-424)
    batch_all = sorted(
        ln for p in ("b1", "b2") for ln in open(pref_batch + p + ".all")
    )
    assert batch_all == sorted(single_all)


def test_hashes_limit_skips_big_reads(tmp_path):
    """Reads with more minimizers than hashes_limit are skipped as 'big'
    (reference LONGREADS semantics: GanonClassify.cpp:705,739-741) and
    classified when the limit is raised."""
    import numpy as np

    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    rng = np.random.default_rng(13)
    db, genomes = _mk_db(tmp_path, "db", ["A"], rng, glen=30000)
    g = genomes["A"]
    long_read = "".join("ACGT"[c] for c in g[:20000])
    reads = tmp_path / "long.fq"
    with open(reads, "w") as f:
        f.write(f"@long\n{long_read}\n+\n{'I' * len(long_read)}\n")

    outs = {}
    for tag, limit in (("small", 500), ("big", 65535)):
        prefix = str(tmp_path / tag)
        cfg = ClassifyConfig(
            ibf=[db], single_reads=[str(reads)], output_prefix=prefix,
            output_all=True, rel_cutoff=[0.25], hashes_limit=limit,
            output_unclassified=True,
        )
        res = run_classify(cfg)
        outs[tag] = res["totals"][""]

    # a 20kb read emits ~2800 minimizers: over the 500 limit, under 65535
    assert outs["small"].seqs_skipped_big == 1
    assert outs["small"].seqs_classified == 0
    assert outs["big"].seqs_skipped_big == 0
    assert outs["big"].seqs_classified == 1


def test_hibf_forest_fast_path_matches_full(tmp_path):
    """Native HIBF packed dispatch == the full-matrix path."""
    import numpy as np

    from ganon_tpu.index.hibf import build_hibf
    from ganon_tpu.index.builder import BuildStats
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify
    from ganon_tpu.ops.minimizers import window_mins_jax

    rng = np.random.default_rng(21)
    genomes, th = {}, {}
    # skewed sizes so the forest stratifies into >1 sub-IBF
    for i, glen in enumerate([3000, 3500, 4000, 30000, 36000]):
        t = f"T{i}"
        g = rng.integers(0, 4, size=glen, dtype=np.uint8)
        genomes[t] = g
        mv, valid = window_mins_jax(
            g[None, :], np.asarray([glen], dtype=np.int32), k=19, w=31
        )
        th[t] = np.unique(np.asarray(mv)[np.asarray(valid)])
    hibf = build_hibf(th, kmer_size=19, window_size=31, max_fp=0.05)
    db = tmp_path / "db.hibf"
    hibf.save(str(db))
    assert len(hibf.subs) > 1

    reads = _mk_reads(tmp_path, "r", genomes, rng, n=150)
    outs = {}
    for tag, fast in (("fast", True), ("full", False)):
        prefix = str(tmp_path / tag)
        cfg = ClassifyConfig(
            ibf=[str(db)], single_reads=[reads], output_prefix=prefix,
            output_all=True, output_unclassified=True, rel_cutoff=[0.25],
            device_thresholding=fast,
        )
        run_classify(cfg)
        outs[tag] = {
            ext: sorted(open(prefix + ext).read().splitlines())
            for ext in (".rep", ".all", ".unc")
        }
    assert outs["fast"] == outs["full"]


def test_hierarchy_leftover_coalescing_identical(tmp_path):
    """Level-2 leftovers are coalesced into full batches (fixed
    per-dispatch cost); outputs must equal the uncoalesced stream.
    Small n_reads forces many ragged leftover sub-batches."""
    rng = random.Random(21)
    refs1 = {f"A{i}": "".join(rng.choice("ACGT") for _ in range(200))
             for i in range(3)}
    refs2 = {f"B{i}": "".join(rng.choice("ACGT") for _ in range(200))
             for i in range(3)}
    db1 = build_db(tmp_path, refs1, name="c1", k=10, w=10)
    db2 = build_db(tmp_path, refs2, name="c2", k=10, w=10)
    refs = {**refs1, **refs2}
    reads = {}
    for i in range(64):
        t = list(refs)[i % len(refs)]
        s = rng.randint(0, 150)
        reads[f"q{i}"] = refs[t][s : s + 40]
    for i in range(8):
        reads[f"junk{i}"] = "".join(rng.choice("ACGT") for _ in range(40))
    fq = tmp_path / "reads.fq"
    write_fastq(fq, reads)

    def run(tag, bucketing):
        out = str(tmp_path / tag)
        run_classify(ClassifyConfig(
            ibf=[db1, db2],
            hierarchy_labels=["1_first", "2_second"],
            single_reads=[str(fq)],
            output_prefix=out,
            rel_cutoff=[0.5],
            n_reads=8,  # many small batches -> many ragged leftovers
            length_bucketing=bucketing,
            output_all=True,
            output_unclassified=True,
        ))
        res = {}
        for ext in (".1_first.all", ".2_second.all", ".unc", ".rep"):
            res[ext] = sorted(
                "\t".join(r) for r in read_tsv(str(tmp_path / tag) + ext)
            )
        return res

    coalesced = run("co", True)
    plain = run("pl", False)
    assert coalesced == plain
