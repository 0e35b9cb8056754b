"""Lowest common ancestor over a string-keyed taxonomy DAG.

Euler tour + depth array + sparse-table RMQ, O(1) pairwise queries folded
over match lists — functional equivalent of the reference LCA
(``/root/reference/src/utils/include/utils/LCA.hpp:11-174``), built with
numpy and an iterative DFS (no recursion limit).
"""

from __future__ import annotations

import numpy as np


class LCA:
    def __init__(self):
        self._children: dict[str, list[str]] = {}
        self._encode: dict[str, int] = {}
        self._decode: list[str] = []
        self._euler: np.ndarray | None = None
        self._first: np.ndarray | None = None
        self._sparse: np.ndarray | None = None
        self._depth: np.ndarray | None = None

    def add_edge(self, parent: str, child: str) -> None:
        for node in (parent, child):
            if node not in self._encode:
                self._encode[node] = len(self._decode)
                self._decode.append(node)
        if parent != child:  # guard self-loops (root listing itself)
            self._children.setdefault(parent, []).append(child)

    def build(self, root: str) -> None:
        """Euler walk from ``root`` + sparse-table RMQ preprocessing."""
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
        if u == v:
            return u
        fu, fv = self._first[u], self._first[v]
        if fu > fv:
            fu, fv = fv, fu
        return self._euler[self._rmq(fu, fv)]

    def __contains__(self, node: str) -> bool:
        return node in self._encode and (
            self._first is None or self._first[self._encode[node]] != -1
        )

    def lca(self, nodes: list[str]) -> str:
        """LCA of a list of node names (folds pairwise, order-invariant)."""
        assert len(nodes) >= 1
        if len(nodes) == 1:
            return nodes[0]
        cur = self.lca_pair(self._encode[nodes[0]], self._encode[nodes[1]])
        for name in nodes[2:]:
            cur = self.lca_pair(cur, self._encode[name])
        return self._decode[cur]


def build_lca(tax: dict[str, tuple[str, str, str]], root: str) -> LCA:
    """LCA from a {target: (parent, rank, name)} tax table (reference
    pre_process_lca, GanonClassify.cpp:1364-1371)."""
    lca = LCA()
    for target, (parent, _rank, _name) in tax.items():
        lca.add_edge(parent, target)
    lca.build(root)
    return lca
