"""LCA: native C++ backend vs pure-Python, reference tree fixtures.

Mirrors the reference's LCA scenario tests
(tests/utils/LCA.test.cpp: pairwise/multi on synthetic + real NCBI
fixtures, order-invariance) and adds a native/python differential check.
"""

import os
import random

import numpy as np
import pytest

from ganon_tpu.classify.lca import LCA

LCA_DATA = "/root/reference/tests/utils/data/lca"


def _py_lca(edges, root):
    l = LCA()
    for p, c in edges:
        l.add_edge(p, c)
    l._build_py(root)  # force python path
    return l


def _any_lca(edges, root):
    l = LCA()
    for p, c in edges:
        l.add_edge(p, c)
    l.build(root)
    return l


def _random_tree(rng, n):
    edges = [("n0", f"n{i}") for i in range(1, min(n, 4))]
    for i in range(4, n):
        edges.append((f"n{rng.randrange(i)}", f"n{i}"))
    return edges


def test_simple_tree():
    edges = [("1", "2"), ("1", "3"), ("2", "4"), ("2", "5"), ("3", "6")]
    l = _any_lca(edges, "1")
    assert l.lca(["4", "5"]) == "2"
    assert l.lca(["4", "6"]) == "1"
    assert l.lca(["4"]) == "4"
    assert l.lca(["2", "4"]) == "2"
    # order invariance
    assert l.lca(["6", "5", "4"]) == l.lca(["4", "5", "6"]) == "1"


def test_native_matches_python():
    rng = random.Random(42)
    edges = _random_tree(rng, 500)
    ln = _any_lca(edges, "n0")
    lp = _py_lca(edges, "n0")
    if ln._native is None:
        pytest.skip("native lca unavailable")
    names = [f"n{i}" for i in range(500)]
    for _ in range(300):
        k = rng.randrange(2, 6)
        q = rng.sample(names, k)
        assert ln.lca(q) == lp.lca(q)
    # containment agrees
    for nm in names[:50]:
        assert (nm in ln) == (nm in lp)


@pytest.mark.skipif(not os.path.isdir(LCA_DATA),
                    reason="reference fixtures not available")
@pytest.mark.parametrize("fixture", ["tree.tax", "ncbi.tax"])
def test_reference_fixtures(fixture):
    """Real tree fixtures: LCA of (a, b) must be a common ancestor of
    both and the deepest such node; native == python."""
    edges = []
    parent = {}
    with open(os.path.join(LCA_DATA, fixture)) as f:
        for line in f:
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 2:
                continue
            node, par = fields[0], fields[1]
            parent[node] = par
            edges.append((par, node))
    root = "1"
    ln = _any_lca(edges, root)
    lp = _py_lca(edges, root)

    def lineage(n):
        out = [n]
        while n in parent and parent[n] != n and n != root:
            n = parent[n]
            out.append(n)
        return out

    rng = random.Random(7)
    nodes = [n for n in parent if n in lp]
    for _ in range(100):
        a, b = rng.sample(nodes, 2)
        got = lp.lca([a, b])
        assert got == ln.lca([a, b])
        la, lb = lineage(a), lineage(b)
        common = [x for x in la if x in set(lb)]
        assert got == common[0]  # deepest common ancestor


def test_lca_rows_matches_fold():
    """Batched per-row LCA (single range query) == per-row pairwise fold,
    on both the native and python backends."""
    rng = random.Random(7)
    edges = _random_tree(rng, 400)
    ln = _any_lca(edges, "n0")
    lp = _py_lca(edges, "n0")
    names = [f"n{i}" for i in range(400)]
    R, K = 64, 5
    rows, lens = [], []
    for r in range(R):
        k = rng.randrange(1, K + 1)
        q = rng.sample(names, k)
        ids = [lp._encode[n] for n in q] + [0] * (K - k)
        rows.append(ids)
        lens.append(k)
    ids_mat = np.asarray(rows, dtype=np.int32)
    lens = np.asarray(lens, dtype=np.int32)
    for impl in (ln, lp):
        got = impl.lca_rows(ids_mat, lens)
        for r in range(R):
            q = [impl._decode[i] for i in ids_mat[r, :lens[r]]]
            assert impl._decode[got[r]] == impl.lca(q), (r, q)
    # zero-length rows come back as -1
    lens2 = lens.copy()
    lens2[0] = 0
    assert lp.lca_rows(ids_mat, lens2)[0] == -1
    if ln._native is not None:
        assert ln.lca_rows(ids_mat, lens2)[0] == -1


def test_lca_rows_outside_tree_raises():
    edges = [("1", "2"), ("1", "3")]
    l = _any_lca(edges, "1")
    l.add_edge("orphanp", "orphan")  # encoded but not reachable from root
    ids = np.asarray([[l._encode["orphan"], l._encode["2"]]], dtype=np.int32)
    with pytest.raises(KeyError):
        _ = l.lca_rows(ids, np.asarray([2], dtype=np.int32))
