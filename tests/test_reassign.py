"""EM reassignment tests (reference reassign.py semantics)."""

import os

from ganon_tpu.reassign import ReassignConfig, reassign


def write(path, lines):
    with open(path, "w") as f:
        for ln in lines:
            f.write("\t".join(str(v) for v in ln) + "\n")
    return str(path)


def read(path):
    with open(path) as f:
        return [line.rstrip("\n").split("\t") for line in f]


def test_em_reassigns_to_dominant_target(tmp_path):
    # 3 unique reads to A, 1 to B; 4 multi reads A|B -> all go to A
    all_rows = [
        ("u1", "A", 10), ("u2", "A", 10), ("u3", "A", 10), ("u4", "B", 9),
        ("m1", "A", 8), ("m1", "B", 8),
        ("m2", "A", 7), ("m2", "B", 7),
        ("m3", "A", 6), ("m3", "B", 6),
    ]
    write(tmp_path / "res.all", all_rows)
    rep_rows = [
        ("H1", "A", 6, 3, 0),
        ("H1", "B", 4, 1, 0),
        ("H1", "AB", 0, 0, 3),  # lca entries get dropped from new rep
    ]
    with open(tmp_path / "res.rep", "w") as f:
        for r in rep_rows:
            f.write("\t".join(str(v) for v in r) + "\n")
        f.write("#total_classified\t7\n#total_unclassified\t0\n")

    cfg = ReassignConfig(input_prefix=[str(tmp_path / "res")])
    assert reassign(cfg)

    one = read(tmp_path / "res.one")
    by_read = {r[0]: r[1] for r in one}
    assert by_read["u1"] == "A" and by_read["u4"] == "B"
    assert by_read["m1"] == "A" and by_read["m2"] == "A" and by_read["m3"] == "A"

    rep = read(tmp_path / "res.rep")
    rows = {r[1]: r for r in rep if not r[0].startswith("#")}
    # A: reassigned = 3 unique + 3 wins -> lca col = 6 - 3 = 3
    assert int(rows["A"][4]) == 3
    assert int(rows["B"][4]) == 0
    assert "AB" not in rows  # lca-only target dropped
    trailer = [r for r in rep if r[0].startswith("#")]
    assert len(trailer) == 2


def test_no_unique_matches_first_wins(tmp_path):
    # no unique matches at all: prob stays 0 -> first match of each read wins
    all_rows = [
        ("m1", "X", 5), ("m1", "Y", 5),
        ("m2", "Y", 4), ("m2", "X", 4),
    ]
    write(tmp_path / "r2.all", all_rows)
    with open(tmp_path / "r2.rep", "w") as f:
        f.write("H1\tX\t2\t0\t1\nH1\tY\t2\t0\t1\n")
        f.write("#total_classified\t2\n#total_unclassified\t0\n")
    cfg = ReassignConfig(input_prefix=[str(tmp_path / "r2")], max_iter=3)
    assert reassign(cfg)
    one = {r[0]: r[1] for r in read(tmp_path / "r2.one")}
    # EM seeds with uniform zero, first iteration ties -> first listed match;
    # after reassignment X gets m1, so m2's top becomes X as well (or stays
    # per prob evolution). Both reads must be assigned to exactly one target.
    assert set(one.keys()) == {"m1", "m2"}
    assert all(t in ("X", "Y") for t in one.values())


def _naive_em(all_rows, max_iter, threshold):
    """Reference-faithful naive EM (reassign.py:75-142 semantics):
    per-read dicts, strict-> tie-break, reassigned from pre-update
    probabilities. Differential oracle for the vectorized core."""
    targets, read_matches, initial_weight = {}, {}, {}
    for readid, target, kcount in all_rows:
        tid = targets.setdefault(target, len(targets))
        read_matches.setdefault(readid, []).append((tid, int(kcount)))
        initial_weight.setdefault(tid, 0)
    total_weight = len(read_matches)
    total_initial = 0
    for m in read_matches.values():
        if len(m) == 1:
            total_initial += 1
            initial_weight[m[0][0]] += 1
    denom = total_initial if total_initial else 1
    prob = {t: u / denom for t, u in initial_weight.items()}

    def top(matches):
        t, k = matches[0]
        mp = 0.0
        for m, kk in matches:
            if prob[m] > mp:
                mp = prob[m]
                t, k = m, kk
        return t, k

    em_ite = 0
    reassigned = dict(initial_weight)
    while True:
        reassigned = dict(initial_weight)
        for m in read_matches.values():
            if len(m) > 1:
                reassigned[top(m)[0]] += 1
        diff = 0.0
        for t, c in reassigned.items():
            np_ = c / total_weight if total_weight else 0
            diff += abs(prob[t] - np_)
            prob[t] = np_
        if diff <= threshold:
            break
        if max_iter > 0 and em_ite == max_iter - 1:
            break
        em_ite += 1
    ones = {}
    for readid, m in read_matches.items():
        t, k = m[0] if len(m) == 1 else top(m)
        ones[readid] = (t, k)
    tnames = {v: k for k, v in targets.items()}
    return (
        {tnames[t]: c for t, c in reassigned.items()},
        {r: (tnames[t], k) for r, (t, k) in ones.items()},
    )


def test_vectorized_em_matches_naive_oracle(tmp_path):
    import random

    rng = random.Random(7)
    for trial in range(8):
        n_targets = rng.randint(1, 12)
        n_reads = rng.randint(1, 120)
        rows = []
        for r in range(n_reads):
            nm = rng.choice([1, 1, 1, 2, 2, 3, 4])
            ts = rng.sample(range(n_targets), min(nm, n_targets))
            for t in ts:
                rows.append((f"r{r}", f"T{t}", rng.randint(1, 30)))
        rng.shuffle(rows)  # interleaved reads, arbitrary file order
        max_iter = rng.choice([1, 3, 10])

        exp_reassigned, exp_ones = _naive_em(rows, max_iter, 0.0)

        d = tmp_path / f"t{trial}"
        d.mkdir()
        write(d / "x.all", rows)
        seen_targets = sorted({t for _, t, _ in rows})
        with open(d / "x.rep", "w") as f:
            for t in seen_targets:
                f.write(f"H1\t{t}\t0\t0\t0\n")
            f.write("#total_classified\t0\n#total_unclassified\t0\n")
        cfg = ReassignConfig(
            input_prefix=[str(d / "x")], max_iter=max_iter
        )
        assert reassign(cfg)

        ones = {r[0]: (r[1], int(r[2])) for r in read(d / "x.one")}
        assert ones == exp_ones, f"trial {trial}: .one mismatch"
        rep = {
            r[1]: int(r[4])
            for r in read(d / "x.rep")
            if not r[0].startswith("#")
        }
        for t in seen_targets:
            assert rep[t] == exp_reassigned[t], f"trial {trial}: rep {t}"


def test_empty_all_file(tmp_path):
    write(tmp_path / "e.all", [])
    with open(tmp_path / "e.rep", "w") as f:
        f.write("H1\tA\t1\t1\t0\n#total_classified\t1\n#total_unclassified\t0\n")
    cfg = ReassignConfig(input_prefix=[str(tmp_path / "e")])
    assert reassign(cfg)
    assert read(tmp_path / "e.one") == []
    rep = read(tmp_path / "e.rep")
    # target A never appears in .all -> dropped from rewritten rep
    assert all(r[0].startswith("#") for r in rep)


def test_remove_all_and_output_prefix(tmp_path):
    write(tmp_path / "r3.all", [("u1", "A", 5)])
    with open(tmp_path / "r3.rep", "w") as f:
        f.write("H1\tA\t1\t1\t0\n#total_classified\t1\n#total_unclassified\t0\n")
    out = str(tmp_path / "out")
    cfg = ReassignConfig(
        input_prefix=[str(tmp_path / "r3")], output_prefix=out, remove_all=True
    )
    assert reassign(cfg)
    assert os.path.exists(out + ".one")
    assert os.path.exists(out + ".rep")
    assert not os.path.exists(tmp_path / "r3.all")  # removed
