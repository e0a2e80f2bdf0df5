"""Second-opinion pseudoalignment oracle: a literal colored de Bruijn graph.

This is an INDEPENDENT derivation of `map_read_with_mismatch` semantics
(VERDICT r2 item 1), written from the colored-DBG pseudoalignment model of
the kallisto paper (PAPERS.md: "Near-optimal RNA-Seq quantification",
arXiv:1505.02710) and the architecture of 10XGenomics/rust-pseudoaligner
(the crate the reference's `debruijn_mapping` fork derives from,
`/root/reference/Cargo.toml:23`), NOT from `nimble_tpu/core/walk.py`.

Model
-----
Nodes are the k-mers (k=30) of the doubled library.  Each k-mer carries a
COLOR SET: the set of library row ids whose sequence contains that k-mer at
any position (kallisto's T(s); rust-pseudoaligner's per-node eq class —
compacted unitigs carry the color set shared by all their k-mers, so a
k-mer-granular walk that intersects colors at every visited k-mer is
exactly equivalent to the unitig walk that intersects at node entry).
Edges are the observed (k+1)-mers of the library.

map_read (kallisto-style, with the fork's mismatch extension):

  1. ANCHOR: first read k-mer present in the graph (left→right scan).
     eq := colors(anchor); score := k.
  2. FORWARD WALK over graph edges, one read base per step.  The walk
     state is a FRONTIER of graph k-mers (normally a single k-mer; it can
     fan out after an ambiguous substitution):
       matched := { v = u[1:]+b : u in frontier, edge (u+b) observed,
                    colors(v) ∩ eq ≠ ∅ }           (b = the read base)
       if matched:   frontier := matched; eq ∩= ∪ colors(v); score += 1
       else:         substituted edges — same set over all c ≠ b; if none,
                     the walk ends (graph exhausted for these colors);
                     otherwise frontier := that set, eq ∩= ∪ colors(v),
                     mismatches += 1
  3. LEFT WALK mirrored over predecessor edges (v = c+u[:-1], edge c+u),
     continuing with the same eq/score/mismatch accumulators.
  4. Return (sorted eq, score, mismatches); None when no anchor exists.

The intersection-of-visited-colors is the defining kallisto semantic; the
per-base edge following with deterministic-within-unitig substitution is
the fork's observed extension (pinned by `tests/mismatch.rs`: one
substituted base ⇒ mismatches=1, score = matched bases).

Where this model can disagree with the positional candidate-list model in
`core/walk.py` is exactly the class `docs/SEMANTICS.md` documents: a row
containing a visited k-mer at a NON-CONTIGUOUS locus stays in the color
intersection here but leaves the positional live set there.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

K = 30


class ColoredDbg:
    """k-mer-granular colored de Bruijn graph of a (doubled) library."""

    def __init__(self, sequences: List[str], k: int = K):
        self.k = k
        colors: Dict[str, Set[int]] = {}
        edges: Set[str] = set()
        for row, seq in enumerate(sequences):
            s = seq.upper()
            for i in range(len(s) - k + 1):
                colors.setdefault(s[i : i + k], set()).add(row)
            for i in range(len(s) - k):
                edges.add(s[i : i + k + 1])
        self.colors = colors
        self.edges = edges


def cdbg_map_read(
    read: str, graph: ColoredDbg
) -> Optional[Tuple[List[int], int, int]]:
    """Colored-DBG pseudoalignment of one read (see module docstring)."""
    k = graph.k
    read = read.upper()
    L = len(read)
    if L < k:
        return None

    anchor = None
    for a in range(L - k + 1):
        if read[a : a + k] in graph.colors:
            anchor = a
            break
    if anchor is None:
        return None

    start = read[anchor : anchor + k]
    eq: Set[int] = set(graph.colors[start])
    frontier: Set[str] = {start}
    score = k
    mismatches = 0

    def step(candidates: List[Tuple[str, str]]) -> Optional[Set[str]]:
        """Edge-follow: keep (edge, node) pairs whose edge is observed and
        whose node's colors meet the running intersection."""
        out = {
            v
            for e, v in candidates
            if e in graph.edges and graph.colors.get(v, set()) & eq
        }
        return out or None

    # Forward walk over successor edges.
    for p in range(anchor + k, L):
        b = read[p]
        matched = step([(u + b, u[1:] + b) for u in frontier])
        if matched is not None:
            frontier = matched
            score += 1
        else:
            subst = step(
                [
                    (u + c, u[1:] + c)
                    for u in frontier
                    for c in "ACGT"
                    if c != b
                ]
            )
            if subst is None:
                break
            frontier = subst
            mismatches += 1
        eq &= set.union(*(graph.colors[v] for v in frontier))

    # Left walk over predecessor edges from the ANCHOR k-mer, carrying the
    # accumulated eq/score/mismatch state (the color intersection is the
    # graph analog of the linear model's carried live set).
    frontier = {start}
    for p in range(anchor - 1, -1, -1):
        b = read[p]
        matched = step([(b + u, (b + u)[:k]) for u in frontier])
        if matched is not None:
            frontier = matched
            score += 1
        else:
            subst = step(
                [
                    (c + u, (c + u)[:k])
                    for u in frontier
                    for c in "ACGT"
                    if c != b
                ]
            )
            if subst is None:
                break
            frontier = subst
            mismatches += 1
        eq &= set.union(*(graph.colors[v] for v in frontier))

    return sorted(eq), score, mismatches
