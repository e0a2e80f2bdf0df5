"""Equivalence-class ↔ feature-name mapping and group rollup.

Parity ports of:
  * `process_equivalence_class_to_feature_list` — `src/align.rs:802-849`
  * `unmap` — `src/align.rs:851-864`
"""

from __future__ import annotations

from typing import List, Sequence

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.library import Reference
from nimble_tpu.utils.natsort import natural_lexical_sort


def process_equivalence_class_to_feature_list(
    equivalence_class: Sequence[int],
    reference: Reference,
    config: AlignFilterConfig,
    ignore_group_rollup: bool,
) -> List[str]:
    """Map row ids to feature names, optionally rolled up by the group_on
    column (`src/align.rs:802-849`).

    * group_on == sequence_name column (header "nt_sequence" check in the
      reference compares the group_on HEADER string): 1:1 name mapping, NO
      dedup — duplicate ids yield duplicate names;
    * otherwise: group_on column values, empty value falls back to the
      feature name, deduped preserving first-occurrence order;
    * if discard_multi_hits > 0 and the list is larger: returns [] (the whole
      alignment is dropped);
    * result is natural-lexically sorted for determinism.
    """
    if ignore_group_rollup or reference.headers[reference.group_on] == "nt_sequence":
        results = [
            reference.columns[reference.sequence_name_idx][idx]
            for idx in equivalence_class
        ]
    else:
        results = []
        for idx in equivalence_class:
            group = reference.columns[reference.group_on][idx]
            if group == "":
                group = reference.columns[reference.sequence_name_idx][idx]
            if group not in results:
                results.append(group)

    if (
        not ignore_group_rollup
        and config.discard_multi_hits > 0
        and len(results) > config.discard_multi_hits
    ):
        return []
    return natural_lexical_sort(results)


def unmap(feature_list: Sequence[str], reference: Reference) -> List[int]:
    """Feature names back to row ids (first occurrence), `src/align.rs:851-864`."""
    names = reference.columns[reference.sequence_name_idx]
    out = []
    for feature in feature_list:
        try:
            out.append(names.index(feature))
        except ValueError:
            raise ValueError("Feature not found in reference columns") from None
    return out
