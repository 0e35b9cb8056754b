"""Length-bucketed batching: grouping behavior + end-to-end invariance."""

import random

import numpy as np
import pytest

from ganon_tpu.classify.device import bucket_len
from ganon_tpu.io.pipeline import EncodedBatch, bucketed_batches
from ganon_tpu.ops.minimizers import encode_seqs


def _mk_batch(seqs, ids=None, prefix="p"):
    b = EncodedBatch(prefix=prefix, paired=False,
                     ids=ids or [f"r{i}" for i in range(len(seqs))])
    b.codes1, b.len1 = encode_seqs(seqs)
    return b


def test_uniform_batch_passes_through():
    seqs = ["ACGT" * 40] * 10  # all one bucket
    b = _mk_batch(seqs)
    out = list(bucketed_batches(iter([b]), n_reads=100))
    assert len(out) == 1 and out[0] is b


def test_mixed_lengths_split_by_bucket():
    rng = random.Random(3)
    seqs = ["".join(rng.choice("ACGT") for _ in range(n))
            for n in (100, 150, 2000, 120, 1900, 90)]
    b = _mk_batch(seqs)
    out = list(bucketed_batches(iter([b]), n_reads=100))
    # every emitted batch spans exactly one bucket
    assert len(out) > 1
    got_ids = []
    for o in out:
        bks = {bucket_len(max(int(x), 1)) for x in o.len1}
        assert len(bks) == 1
        # width is trimmed/padded consistently with the rows it carries
        assert o.codes1.shape[0] == len(o.ids)
        got_ids.extend(o.ids)
    assert sorted(got_ids) == sorted(b.ids)  # nothing lost or duplicated


def test_accumulates_across_batches_and_flushes():
    rng = random.Random(4)

    def gen():
        for _ in range(5):
            seqs = ["".join(rng.choice("ACGT") for _ in range(n))
                    for n in (100, 3000)]
            yield _mk_batch(seqs)

    out = list(bucketed_batches(gen(), n_reads=4))
    assert sum(len(o) for o in out) == 10
    # short reads accumulate to n_reads before emitting
    assert any(len(o) >= 4 for o in out)


def test_rows_match_original_content():
    rng = random.Random(5)
    seqs = ["".join(rng.choice("ACGT") for _ in range(n))
            for n in (64, 64, 5000, 64)]
    b = _mk_batch(seqs)
    orig = {rid: (b.codes1[i, : b.len1[i]].copy(), int(b.len1[i]))
            for i, rid in enumerate(b.ids)}
    for o in bucketed_batches(iter([b]), n_reads=2):
        for i, rid in enumerate(o.ids):
            codes, ln = orig[rid]
            assert int(o.len1[i]) == ln
            assert np.array_equal(o.codes1[i, :ln], codes)


def test_classify_invariant_under_bucketing(tmp_path):
    """End-to-end: mixed-length fastq classifies to the same sorted
    outputs whether or not batches get regrouped (n_reads forces both
    multi-bucket splits and accumulation)."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify
    from tests.test_classify import build_db, read_tsv

    rng = random.Random(9)
    refs = {f"T{i}": "".join(rng.choice("ACGT") for _ in range(3000))
            for i in range(3)}
    db = build_db(tmp_path, refs, k=19, w=31, max_fp=0.05)
    reads = {}
    for i in range(60):
        t = f"T{rng.randrange(3)}"
        ln = rng.choice([80, 150, 700, 1500])
        s = rng.randrange(3000 - ln)
        reads[f"q{i}"] = refs[t][s : s + ln]
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for rid, s in reads.items():
            f.write(f"@{rid}\n{s}\n+\n{'I' * len(s)}\n")

    outs = {}
    for n_reads in (8, 4096):  # small => heavy regrouping; big => 1 batch
        prefix = str(tmp_path / f"n{n_reads}")
        run_classify(ClassifyConfig(
            ibf=[db], single_reads=[str(fq)], output_prefix=prefix,
            rel_cutoff=[0.25], output_all=True, output_unclassified=True,
            n_reads=n_reads,
        ))
        outs[n_reads] = {
            ext: sorted(map(tuple, read_tsv(prefix + ext)))
            for ext in (".all", ".rep", ".unc")
        }
    assert outs[8] == outs[4096]


def test_paired_mixed_lengths_bucketed_by_max(tmp_path):
    """Paired reads bucket on max(len1, len2) so mates stay aligned;
    classification invariant under regrouping."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify
    from tests.test_classify import build_db, read_tsv, write_fastq

    rng = random.Random(13)
    refs = {f"T{i}": "".join(rng.choice("ACGT") for _ in range(4000))
            for i in range(3)}
    db = build_db(tmp_path, refs, k=19, w=31, max_fp=0.05)
    r1, r2 = {}, {}
    for i in range(40):
        t = f"T{rng.randrange(3)}"
        l1 = rng.choice([80, 150, 1200])
        l2 = rng.choice([80, 150, 1200])
        s1 = rng.randrange(4000 - l1)
        s2 = rng.randrange(4000 - l2)
        r1[f"q{i}"] = refs[t][s1 : s1 + l1]
        r2[f"q{i}"] = refs[t][s2 : s2 + l2]
    f1, f2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(f1, r1)
    write_fastq(f2, r2)

    outs = {}
    for n_reads in (6, 4096):
        prefix = str(tmp_path / f"p{n_reads}")
        run_classify(ClassifyConfig(
            ibf=[db], paired_reads=[str(f1), str(f2)],
            output_prefix=prefix, rel_cutoff=[0.25],
            output_all=True, output_unclassified=True, n_reads=n_reads,
        ))
        outs[n_reads] = {
            ext: sorted(map(tuple, read_tsv(prefix + ext)))
            for ext in (".all", ".rep", ".unc")
        }
    assert outs[6] == outs[4096]
    # the mate concat semantics must hold: at least one read classified
    assert len(outs[6][".all"]) > 0


def test_pack_batch_direct_byte_identical():
    """The fused pad+pack must produce byte-identical input buffers to
    batch_to_device + pack_batch_input (single-end and paired)."""
    import numpy as np

    from ganon_tpu.classify import device as dev
    from ganon_tpu.io.pipeline import EncodedBatch

    rng = np.random.default_rng(3)
    for paired, B, L in ((False, 5, 150), (True, 7, 301), (True, 64, 97)):
        codes1 = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
        len1 = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
        codes2 = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
        len2 = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
        b = EncodedBatch(
            prefix="", paired=paired, ids=[f"q{i}" for i in range(B)],
            codes1=codes1, len1=len1,
            codes2=codes2 if paired else None,
            len2=len2 if paired else None,
        )
        batch_pad = dev.bucket_len(B, minimum=64)
        c1, l1, c2, l2, m1, m2 = dev.batch_to_device(b, 31, batch_pad)
        ref = dev.pack_batch_input(c1, l1, c2, l2)
        got, L1, L2 = dev.pack_batch_direct(b, batch_pad)
        assert L1 == c1.shape[1]
        assert L2 == (c2.shape[1] if paired else 0)
        assert np.array_equal(got, ref), (paired, B, L)
