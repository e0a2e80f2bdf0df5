"""Report-filter helpers.

Parity port of `src/filter/report.rs` — NB: in the reference this function is
dead code (only referenced by its own tests); it is kept for API completeness.
"""

from __future__ import annotations

from typing import List, Tuple


def threshold_percentage(
    scores: List[Tuple[str, float]], threshold: float
) -> List[Tuple[str, float]]:
    """All (name, score) entries with score >= threshold
    (`src/filter/report.rs:2-12`)."""
    return [(name, score) for name, score in scores if score >= threshold]
