"""Lowest common ancestor over a string-keyed taxonomy DAG.

Euler tour + depth array + sparse-table RMQ, O(1) pairwise queries folded
over match lists — functional equivalent of the reference LCA
(``/root/reference/src/utils/include/utils/LCA.hpp:11-174``). The core
runs in C++ (ganon_tpu/native/lca.cpp, the reference's LCA is native
too); this module keeps the string<->id encoding and falls back to a
numpy + iterative-DFS implementation when no compiler is available.
"""

from __future__ import annotations

import numpy as np


class LCA:
    def __init__(self):
        self._children: dict[str, list[str]] = {}
        self._edges: list[tuple[str, str]] = []
        self._encode: dict[str, int] = {}
        self._decode: list[str] = []
        self._euler: np.ndarray | None = None
        self._first: np.ndarray | None = None
        self._sparse: np.ndarray | None = None
        self._depth: np.ndarray | None = None
        self._native = None
        self._reachable: np.ndarray | None = None

    def add_edge(self, parent: str, child: str) -> None:
        for node in (parent, child):
            if node not in self._encode:
                self._encode[node] = len(self._decode)
                self._decode.append(node)
        if parent != child:  # guard self-loops (root listing itself)
            self._children.setdefault(parent, []).append(child)
            self._edges.append((parent, child))

    def build(self, root: str) -> None:
        """Euler walk from ``root`` + sparse-table RMQ preprocessing."""
        try:
            from ganon_tpu.native import NativeLCA

            if NativeLCA.available():
                enc = self._encode
                parents = np.fromiter(
                    (enc[p] for p, _ in self._edges), dtype=np.int32,
                    count=len(self._edges),
                )
                children = np.fromiter(
                    (enc[c] for _, c in self._edges), dtype=np.int32,
                    count=len(self._edges),
                )
                self._native = NativeLCA(
                    parents, children, len(self._decode), enc[root]
                )
                self._reachable = self._native.reachable()
                return
        except Exception:
            self._native = None
        self._build_py(root)

    def _build_py(self, root: str) -> None:
        n = len(self._decode)
        first = np.full(n, -1, dtype=np.int64)
        euler: list[int] = []
        depth: list[int] = []
        # iterative DFS preserving child order (reference does recursive DFS
        # appending the parent again after each child subtree)
        stack: list[tuple[str, int, int]] = [(root, 0, 0)]  # node, depth, child_idx
        while stack:
            node, d, ci = stack.pop()
            enc = self._encode[node]
            if ci == 0 and first[enc] == -1:
                first[enc] = len(euler)
            # initial visit (ci == 0) or re-append after finishing child ci-1
            euler.append(enc)
            depth.append(d)
            children = self._children.get(node, ())
            if ci < len(children):
                stack.append((node, d, ci + 1))
                stack.append((children[ci], d + 1, 0))

        self._euler = np.asarray(euler, dtype=np.int64)
        self._depth = np.asarray(depth, dtype=np.int64)
        self._first = first

        m = len(euler)
        log = max(1, int(np.ceil(np.log2(max(m, 2)))))
        sparse = np.empty((log + 1, m), dtype=np.int64)
        sparse[0] = np.arange(m)
        dep = self._depth
        for j in range(1, log + 1):
            span = 1 << j
            half = 1 << (j - 1)
            if half >= m:
                sparse[j] = sparse[j - 1]
                continue
            prev = sparse[j - 1]
            a = prev[: m - half]
            b = prev[half:]
            sparse[j, : m - half] = np.where(dep[a] < dep[b], a, b)
            sparse[j, m - half :] = prev[m - half :]
        self._sparse = sparse

    def _rmq(self, i: int, j: int) -> int:
        i, j = int(i), int(j)
        if i > j:
            i, j = j, i
        k = (j - i + 1).bit_length() - 1
        a = self._sparse[k, i]
        b = self._sparse[k, j - (1 << k) + 1]
        return a if self._depth[a] <= self._depth[b] else b

    def lca_pair(self, u: int, v: int) -> int:
        if self._native is not None:
            return self._native.pair(u, v)
        if u == v:
            return u
        fu, fv = self._first[u], self._first[v]
        if fu > fv:
            fu, fv = fv, fu
        return self._euler[self._rmq(fu, fv)]

    def __contains__(self, node: str) -> bool:
        if node not in self._encode:
            return False
        if self._native is not None:
            return bool(self._reachable[self._encode[node]])
        return self._first is None or self._first[self._encode[node]] != -1

    def lca(self, nodes: list[str]) -> str:
        """LCA of a list of node names (folds pairwise, order-invariant)."""
        assert len(nodes) >= 1
        if len(nodes) == 1:
            return nodes[0]
        enc = self._encode
        if self._native is not None:
            ids = np.fromiter(
                (enc[n] for n in nodes), dtype=np.int32, count=len(nodes)
            )
            cur = self._native.lca_list(ids)
            if cur < 0:
                raise KeyError(f"LCA query outside the tree: {nodes}")
            return self._decode[cur]
        cur = self.lca_pair(enc[nodes[0]], enc[nodes[1]])
        for name in nodes[2:]:
            cur = self.lca_pair(cur, enc[name])
        return self._decode[cur]


def build_lca(tax: dict[str, tuple[str, str, str]], root: str) -> LCA:
    """LCA from a {target: (parent, rank, name)} tax table (reference
    pre_process_lca, GanonClassify.cpp:1364-1371)."""
    lca = LCA()
    for target, (parent, _rank, _name) in tax.items():
        lca.add_edge(parent, target)
    lca.build(root)
    return lca
