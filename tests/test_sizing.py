"""Sizing math invariants (mirroring GanonBuild.test.cpp perf invariants)."""

import numpy as np

from ganon_tpu.index.config import IBFConfig
from ganon_tpu.index import sizing


def _skewed_counts(rng, n=24):
    # skewed target sizes like the reference mode_input fixture
    return {f"T{i}": int(v) for i, v in enumerate(rng.integers(100, 8000, n))}


def _filter_size_bits(cfg):
    return sizing.optimal_bins(cfg.n_bins) * cfg.bin_size_bits


def _run(max_fp=0.05, filter_size=0.0, mode="avg", hash_functions=0, counts=None):
    cfg = IBFConfig(kmer_size=19, window_size=31)
    sizing.optimal_hashes(
        max_fp, filter_size, cfg, counts, hash_functions=hash_functions, mode=mode
    )
    cfg.true_max_fp, cfg.true_avg_fp = sizing.true_false_positive(
        counts, cfg.max_hashes_bin, cfg.bin_size_bits, cfg.hash_functions
    )
    return cfg


def test_bin_size_formulas():
    # classic bloom formulas sanity
    assert sizing.bin_size_fp(0.01, 1000) > sizing.bin_size_fp(0.05, 1000)
    assert sizing.bin_size_fp_hf(0.01, 1000, 3) > sizing.bin_size_fp_hf(0.05, 1000, 3)
    assert 1 <= sizing.get_optimal_hash_functions(9600, 1000) <= 5


def test_higher_fp_smaller_filter():
    rng = np.random.default_rng(0)
    counts = _skewed_counts(rng)
    sizes = [
        _filter_size_bits(_run(max_fp=fp, counts=counts)) for fp in (0.01, 0.05, 0.2)
    ]
    assert sizes[0] > sizes[1] > sizes[2]


def test_fp_respected():
    rng = np.random.default_rng(1)
    counts = _skewed_counts(rng)
    # ceil-rounding on split bins can overshoot marginally (reference
    # formulas have the same property); a ~10% relative tolerance holds.
    for fp in (0.01, 0.05, 0.2):
        cfg = _run(max_fp=fp, counts=counts)
        assert cfg.true_max_fp <= fp * 1.12


def test_modes_ordering():
    rng = np.random.default_rng(2)
    counts = _skewed_counts(rng)
    avg = _run(mode="avg", counts=counts)
    smallest = _run(mode="smallest", counts=counts)
    fastest = _run(mode="fastest", counts=counts)
    assert _filter_size_bits(smallest) <= _filter_size_bits(avg)
    assert fastest.n_bins <= avg.n_bins


def test_filter_size_fixed():
    rng = np.random.default_rng(3)
    counts = _skewed_counts(rng)
    cfg = _run(max_fp=0.0, filter_size=2.0, counts=counts)  # 2 MB
    total_mb = _filter_size_bits(cfg) / 8388608
    assert abs(total_mb - 2.0) < 0.05
    bigger = _run(max_fp=0.0, filter_size=8.0, counts=counts)
    assert _filter_size_bits(bigger) > _filter_size_bits(cfg)


def test_split_target_bins_cover_all_hashes():
    rng = np.random.default_rng(4)
    counts = _skewed_counts(rng)
    cfg = _run(counts=counts)
    splits = sizing.split_target_bins(cfg, counts)
    assert len(splits) == cfg.n_bins
    covered = {t: 0 for t in counts}
    for binno, target, st, en in splits:
        assert 0 <= st <= en < counts[target]
        covered[target] += en - st + 1
    for t, c in counts.items():
        assert covered[t] == c  # every hash index in exactly one bin

    binnos = [b for b, *_ in splits]
    assert binnos == list(range(len(splits)))  # consecutive


def test_fixed_hash_functions():
    rng = np.random.default_rng(5)
    counts = _skewed_counts(rng)
    cfg = _run(hash_functions=2, counts=counts)
    assert cfg.hash_functions == 2


# -- TPU throughput-aware hash tuning ---------------------------------------


def _tune(counts, max_fp=0.05, filter_size=0.0, hash_functions=0, mode="avg"):
    cfg = IBFConfig(kmer_size=19, window_size=31)
    sizing.optimal_hashes(
        max_fp if not filter_size else 0.0, filter_size, cfg, counts,
        hash_functions=hash_functions, mode=mode,
    )
    before = (cfg.hash_functions, cfg.bin_size_bits, cfg.n_bins,
              cfg.max_hashes_bin)
    changed = sizing.auto_tune_hash_functions(
        max_fp if not filter_size else 0.0, filter_size, cfg, counts,
        hash_functions=hash_functions, mode=mode,
    )
    return cfg, before, changed


def test_tpu_tuning_lowers_h_for_small_tables_too():
    # VMEM regime: per-probe cost is flat, so the fp-equivalent h=1
    # re-size (3.1x the bits, 1/4 the probes) wins as long as the table
    # stays in a cheap gather band (measured 1.43x, vmem_h_probe.py)
    counts = {f"T{i}": 5_000 for i in range(16)}
    cfg, before, changed = _tune(counts)
    assert changed
    assert cfg.hash_functions == 1
    tmax, _ = sizing.true_false_positive(
        counts, cfg.max_hashes_bin, cfg.bin_size_bits, cfg.hash_functions
    )
    assert tmax <= 0.05 * 1.01


def test_tpu_tuning_lowers_h_for_hbm_tables():
    counts = {f"T{i}": 140_000 for i in range(1024)}
    cfg, before, changed = _tune(counts)
    assert changed
    assert cfg.hash_functions < before[0]
    # fp bound still honored by the re-size
    tmax, tavg = sizing.true_false_positive(
        counts, cfg.max_hashes_bin, cfg.bin_size_bits, cfg.hash_functions
    )
    assert tmax <= 0.05 * 1.01
    # memory growth bounded
    table = cfg.bin_size_bits * sizing.optimal_bins(cfg.n_bins) // 8
    assert table <= sizing.MAX_TUNED_TABLE_BYTES
    # and the model says it is faster
    def cost(h, bs, mhb):
        rb = sizing.packed_row_bytes(mhb, counts)
        return h * sizing.probe_cost_ns(bs * rb, rb)
    assert cost(cfg.hash_functions, cfg.bin_size_bits, cfg.max_hashes_bin) < cost(
        before[0], before[1], before[3]
    )


def test_tpu_tuning_respects_explicit_h_and_filter_size():
    counts = {f"T{i}": 140_000 for i in range(1024)}
    cfg, before, changed = _tune(counts, hash_functions=4)
    assert not changed and cfg.hash_functions == 4
    cfg, before, changed = _tune(counts, filter_size=512.0)
    assert not changed
