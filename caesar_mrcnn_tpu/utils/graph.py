"""Connected components over small undirected graphs.

Replaces the reference's recursive-DFS ``Graph`` (reference:
mrcnn/graph.py:4-43) with an iterative union-find (no recursion limit —
the reference's recursive DFS overflowed on large merge graphs).
"""

from __future__ import annotations

from typing import Dict, List


class UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))
        self.rank = [0] * n

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1


class Graph:
    """API-compatible with the reference's Graph: addEdge + connectedComponents."""

    def __init__(self, num_vertices: int):
        self.V = num_vertices
        self._uf = UnionFind(num_vertices)

    def addEdge(self, v: int, w: int) -> None:  # noqa: N802 (reference API)
        self._uf.union(v, w)

    add_edge = addEdge

    def connectedComponents(self) -> List[List[int]]:  # noqa: N802
        """Components as lists of vertex ids, in first-seen order
        (reference: mrcnn/graph.py:33-43)."""
        groups: Dict[int, List[int]] = {}
        for v in range(self.V):
            groups.setdefault(self._uf.find(v), []).append(v)
        return list(groups.values())

    connected_components = connectedComponents
