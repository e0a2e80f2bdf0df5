"""Reference library JSON loader.

Parity port of `src/reference_library.rs`:
  * 2-element JSON array: [0] = aligner config object, [1] = columnar table.
  * Required columns: ``sequence_name`` and ``sequence``; ``group_on`` names a
    column (empty string falls back to sequence_name) — `reference_library.rs:85-100`.
  * RNA U/u -> T/t normalization of the sequence column (`:141`).
  * The library is DOUBLED: every feature row is followed by a
    reverse-complemented row whose sequence_name gets the suffix ``§rev``
    (`SPECIAL_REVCOMP_FEATURE_NAME_SEPARATOR`, `:8,128-153`), so rows are
    interleaved [feat0, feat0§rev, feat1, feat1§rev, ...] and
    even id = forward hit, odd id = revcomp hit of feature id//2.
  * ``discard_nonzero_mismatch`` is hardcoded False (`:116`).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import List

from nimble_tpu.config import AlignFilterConfig, IntersectLevel, LibraryChemistry
from nimble_tpu.utils.dna import revcomp

# `src/reference_library.rs:8`
SPECIAL_REVCOMP_FEATURE_NAME_SEPARATOR = "§"  # '§'
REV_SUFFIX = SPECIAL_REVCOMP_FEATURE_NAME_SEPARATOR + "rev"


@dataclass
class Reference:
    """Loaded (doubled) reference library table (`src/reference_library.rs:10-17`)."""

    group_on: int = 0                 # column index defining feature families
    headers: List[str] = field(default_factory=list)
    columns: List[List[str]] = field(default_factory=list)
    sequence_name_idx: int = 0
    sequence_idx: int = 0

    @property
    def names(self) -> List[str]:
        return self.columns[self.sequence_name_idx]

    @property
    def sequences(self) -> List[str]:
        return self.columns[self.sequence_idx]


def _get_column_index(headers: List[str], search: str) -> int | None:
    """First matching header index (`src/reference_library.rs:177-185`)."""
    for i, h in enumerate(headers):
        if h == search:
            return i
    return None


def _to_string_vec(value, array_name: str) -> List[str]:
    """Strict string-array conversion (`src/reference_library.rs:188-207`)."""
    if not isinstance(value, list):
        raise ValueError(f"Error -- could not parse {array_name} as array")
    out = []
    for item in value:
        if not isinstance(item, str):
            raise ValueError(
                f'Error -- could not parse {array_name} element "{item}" as a string'
            )
        out.append(item)
    return out


def _require_number(obj, key: str, kind: str):
    v = obj.get(key) if isinstance(obj, dict) else None
    if kind == "f64":
        # serde_json as_f64 accepts ints and floats
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise ValueError(f"Error -- could not parse {key} as f64")
        return float(v)
    if kind == "i64":
        if not isinstance(v, int) or isinstance(v, bool):
            raise ValueError(f"Error -- could not parse {key} as int64")
        return int(v)
    if kind == "bool":
        if not isinstance(v, bool):
            raise ValueError(f"Error -- could not parse {key} as boolean")
        return v
    if kind == "str":
        if not isinstance(v, str):
            raise ValueError(f"Error -- could not parse {key} as string")
        return v
    raise AssertionError(kind)


def load_reference_library(
    path: str, strand_filter: LibraryChemistry
) -> tuple[AlignFilterConfig, Reference]:
    """Load a nimble reference library JSON (`src/reference_library.rs:20-174`).

    Returns the aligner config and the doubled Reference table.
    """
    try:
        with open(path, "r", encoding="utf-8") as f:
            raw = f.read()
    except OSError as e:
        raise ValueError("Error -- could not read reference library") from e

    try:
        v = json.loads(raw)
    except json.JSONDecodeError as e:
        raise ValueError("Error -- could not parse reference library JSON") from e

    cfg_obj = v[0] if isinstance(v, list) and len(v) > 0 else {}
    ref_obj = v[1] if isinstance(v, list) and len(v) > 1 else {}

    score_percent = _require_number(cfg_obj, "score_percent", "f64")
    score_filter = _require_number(cfg_obj, "score_filter", "i64")
    score_threshold = _require_number(cfg_obj, "score_threshold", "i64")
    num_mismatches = _require_number(cfg_obj, "num_mismatches", "i64")
    discard_multiple_matches = _require_number(cfg_obj, "discard_multiple_matches", "bool")
    require_valid_pair = _require_number(cfg_obj, "require_valid_pair", "bool")
    discard_multi_hits = _require_number(cfg_obj, "discard_multi_hits", "i64")
    intersect_level_raw = _require_number(cfg_obj, "intersect_level", "i64")
    max_hits_to_report = _require_number(cfg_obj, "max_hits_to_report", "i64")
    group_on_name = _require_number(cfg_obj, "group_on", "str")
    trim_target_length = _require_number(cfg_obj, "trim_target_length", "i64")
    trim_strictness = _require_number(cfg_obj, "trim_strictness", "f64")

    if intersect_level_raw not in (0, 1, 2):
        raise ValueError(
            "Error -- invalid intersect level in config file. "
            "Please choose intersect level 0, 1, or 2."
        )
    intersect_level = IntersectLevel(intersect_level_raw)

    headers = _to_string_vec(ref_obj.get("headers") if isinstance(ref_obj, dict) else None,
                             "headers")
    sequence_name_idx = _get_column_index(headers, "sequence_name")
    if sequence_name_idx is None:
        raise ValueError("Could not find header sequence_name")

    if group_on_name == "":
        group_on = sequence_name_idx
    else:
        group_on = _get_column_index(headers, group_on_name)
        if group_on is None:
            raise ValueError(
                f"Error -- could not find column for group_on {group_on_name}"
            )

    sequence_idx = _get_column_index(headers, "sequence")
    if sequence_idx is None:
        raise ValueError("Error -- could not find sequences column")

    raw_columns = ref_obj.get("columns") if isinstance(ref_obj, dict) else None
    if not isinstance(raw_columns, list):
        raise ValueError("Error -- could not parse columns as array")
    columns = [_to_string_vec(col, "column") for col in raw_columns]

    align_config = AlignFilterConfig(
        reference_genome_size=len(columns[sequence_name_idx]),
        score_percent=score_percent,
        score_threshold=score_threshold,
        num_mismatches=num_mismatches,
        discard_nonzero_mismatch=False,  # hardcoded, `reference_library.rs:116`
        discard_multiple_matches=discard_multiple_matches,
        score_filter=score_filter,
        require_valid_pair=require_valid_pair,
        discard_multi_hits=discard_multi_hits,
        intersect_level=intersect_level,
        max_hits_to_report=max_hits_to_report,
        strand_filter=strand_filter,
        trim_target_length=trim_target_length,
        trim_strictness=trim_strictness,
    )

    # Double the library: forward row followed by its revcomp "§rev" twin
    # (`src/reference_library.rs:128-161`).
    num_rows = len(columns[0]) if columns else 0
    new_rows: List[List[str]] = []
    for row_idx in range(num_rows):
        row = []
        for col_idx, col in enumerate(columns):
            value = col[row_idx]
            if col_idx == sequence_idx:
                value = value.replace("U", "T").replace("u", "t")
            row.append(value)
        rc_row = list(row)
        rc_row[sequence_name_idx] = rc_row[sequence_name_idx] + REV_SUFFIX
        rc_row[sequence_idx] = revcomp(rc_row[sequence_idx])
        new_rows.append(row)
        new_rows.append(rc_row)

    final_columns: List[List[str]] = [[] for _ in columns]
    for row in new_rows:
        for i, val in enumerate(row):
            final_columns[i].append(val)

    reference = Reference(
        group_on=group_on,
        headers=headers,
        columns=final_columns,
        sequence_name_idx=sequence_name_idx,
        sequence_idx=sequence_idx,
    )

    align_config.sanity_check()
    return align_config, reference


def get_reference_sequence_data(reference: Reference) -> tuple[List[str], List[str]]:
    """(sequences, names) of the doubled library, for index construction.

    Parity with `src/utils.rs:7-24` (there DnaStrings; here raw strings —
    encoding happens in the index builder).
    """
    seqs = reference.columns[reference.sequence_idx]
    names = reference.columns[reference.sequence_name_idx]
    if len(names) < len(seqs):
        raise ValueError(
            "Error -- could not read library name after JSON parse, "
            "corrupted internal state."
        )
    return list(seqs), list(names[: len(seqs)])
