"""Natural-lexical string comparison.

The reference sorts feature lists with the `lexical-sort` crate's
``natural_lexical_cmp`` (`src/align.rs:15,846`): case-insensitive character
comparison with maximal ASCII-digit runs compared as integers.  Feature-list
determinism in the output TSVs depends on reproducing this ordering.

Semantics implemented here:
  * Walk both strings left to right.
  * When both cursors sit on an ASCII digit, consume the maximal digit runs
    and compare them numerically (leading zeros ignored for the value
    comparison). Unequal values decide the ordering; equal values continue.
  * Otherwise compare the two characters case-insensitively (lowercased);
    unequal characters decide the ordering.
  * If one string is a prefix of the other, the shorter sorts first.
  * Full case-insensitive/numeric ties are broken by a final case-sensitive
    comparison so the ordering is total and deterministic (the reference uses
    an unstable sort, so ties there have unspecified order; any deterministic
    tiebreak is parity-safe).
"""

from __future__ import annotations

import functools
from typing import Iterable, List


def natural_lexical_cmp(lhs: str, rhs: str) -> int:
    i = j = 0
    nl, nr = len(lhs), len(rhs)
    while i < nl and j < nr:
        a, b = lhs[i], rhs[j]
        if a.isdigit() and b.isdigit() and a.isascii() and b.isascii():
            # consume maximal digit runs
            i0, j0 = i, j
            while i < nl and lhs[i].isascii() and lhs[i].isdigit():
                i += 1
            while j < nr and rhs[j].isascii() and rhs[j].isdigit():
                j += 1
            va, vb = int(lhs[i0:i]), int(rhs[j0:j])
            if va != vb:
                return -1 if va < vb else 1
        else:
            la, lb = a.lower(), b.lower()
            if la != lb:
                return -1 if la < lb else 1
            i += 1
            j += 1
    if i < nl:
        return 1
    if j < nr:
        return -1
    # case-insensitive/numeric tie: deterministic case-sensitive tiebreak
    if lhs < rhs:
        return -1
    if lhs > rhs:
        return 1
    return 0


_KEY = functools.cmp_to_key(natural_lexical_cmp)


def natural_lexical_sort(items: Iterable[str]) -> List[str]:
    """Sort strings with :func:`natural_lexical_cmp` (parity: `src/align.rs:846`)."""
    return sorted(items, key=_KEY)
