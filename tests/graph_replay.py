"""Transparent python replays of the X10 iterative semantics, shared by
the sf0.001 pins (tests/test_kernels.py) and the sf1 unroll-slack guard
(tests/test_contract.py) — one copy, so a semantics change cannot update
one replay and leave the other silently asserting the old algorithm."""

from __future__ import annotations

import hashlib


def h60(key: str) -> int:
    """The engine-neutral 60-bit md5 (graph._h60_sql's python form)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def build_adjacency(edges) -> dict[int, set[int]]:
    """Undirected adjacency from (cust, sup) purchase edges."""
    adj: dict[int, set[int]] = {}
    for c, s in edges:
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)
    return adj


def python_bfs(adj: dict[int, set[int]], seeds: set[int]):
    """Multi-source BFS to TRUE exhaustion: returns (levels, depth) where
    depth is the number of waves run (eccentricity = depth - 1)."""
    lvl = dict.fromkeys(seeds, 0)
    frontier, depth = set(seeds), 0
    while frontier:
        depth += 1
        nxt = {v for u in frontier for v in adj[u] if v not in lvl}
        for v in nxt:
            lvl[v] = depth
        frontier = nxt
    return lvl, depth


def python_lpa_fixpoint(
    adj: dict[int, set[int]],
    seeds: set[int],
    shift: int,
    sent_base: int,
    max_rounds: int | None = None,
):
    """Seeded min-propagation to TRUE fixpoint (or a fixed round count
    when ``max_rounds`` is given): returns (packed_state, rounds)."""
    p = {n: (n if n in seeds else sent_base + n) for n in adj}
    rounds = 0
    while True:
        new = dict(p)
        for u, pu in p.items():
            if pu >= sent_base:
                continue
            cand = pu + shift
            for v in adj[u]:
                if cand < new[v]:
                    new[v] = cand
        if new == p:
            break
        p, rounds = new, rounds + 1
        if max_rounds is not None and rounds >= max_rounds:
            break
    return p, rounds
