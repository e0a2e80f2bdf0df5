"""Aligner configuration surface and enums.

Parity targets in the reference implementation:
  * ``AlignFilterConfig``      — `src/align.rs:79-95`
  * ``IntersectLevel``         — `src/align.rs:26-30`
  * ``FilterReason``           — `src/align.rs:33-77` (incl. display strings)
  * ``LibraryChemistry``       — `src/align.rs:97-103`
  * ``AlignmentOrientation``   — `src/align.rs:105-134`
  * ``PairState``              — `src/align.rs:378-384`
  * ``sanity_check``           — `src/reference_library.rs:209-226`
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

# Minimum post-trim read length accepted by the aligner (`src/align.rs:18`).
MIN_READ_LENGTH = 40
# Minimum Shannon entropy (bits) of a read's base composition (`src/align.rs:19`).
MIN_ENTROPY_SCORE = 1.75
# k-mer size used by the pseudoalignment index (`src/bin/main.rs:122`, Kmer30).
KMER_SIZE = 30


class IntersectLevel(enum.IntEnum):
    """How R1/R2 feature calls are merged into one callset (`src/align.rs:26-30`).

    JSON config encodes these as 0/1/2 (`src/reference_library.rs:61-66`).
    """

    NO_INTERSECT = 0
    INTERSECT_WITH_FALLBACK = 1
    FORCE_INTERSECT = 2


class LibraryChemistry(enum.Enum):
    """Library strandedness, driving orientation filters (`src/align.rs:97-103`).

    CLI values: unstranded (default) / fiveprime / threeprime / none
    (`src/bin/main.rs:40-47`).
    """

    UNSTRANDED = "unstranded"
    FIVE_PRIME = "fiveprime"
    THREE_PRIME = "threeprime"
    NONE = "none"

    @staticmethod
    def from_cli(value: str) -> "LibraryChemistry":
        try:
            return LibraryChemistry(value)
        except ValueError:
            raise ValueError("Could not parse strand_filter option.") from None


class FilterReason(enum.Enum):
    """Per-read filtration outcome (`src/align.rs:33-51`).

    ``str()`` yields the display strings used in the BAM forensic TSV,
    including the reference's quirks ("Low Entropy" for HIGH_ENTROPY and the
    "SKipped" typo) — `src/align.rs:53-77`.
    """

    SCORE_BELOW_THRESHOLD = "Score Below Threshold"
    DISCARDED_MULTIPLE_MATCH = "Discarded Multiple Match"
    DISCARDED_NONZERO_MISMATCH = "Discarded Nonzero Mismatch"
    NO_MATCH = "No Match"
    NO_MATCH_AND_SCORE_BELOW_THRESHOLD = "No Match and Score Below Threshold"
    DIFFERENT_FILTER_REASONS = "Different Filter Reasons"
    NOT_MATCHING_PAIR = "Required Valid Pair Not Matching"
    FORCE_INTERSECT_FAILURE = "Force Intersect Failure"
    SHORT_READ = "Short Read"
    MAX_HITS_EXCEEDED = "Max Hits Exceeded"
    # NB: the reference's variant is misnamed; it filters LOW-complexity reads
    # and displays "Low Entropy" (`src/align.rs:44,68`).
    HIGH_ENTROPY = "Low Entropy"
    SUCCESSFUL_MATCH = "Successful Match"
    STRAND_WAS_WRONG = "Strandedness Filtered"
    TRIAGE_EMPTY_EQUIVALENCE_CLASS = "Equivalence Class Empty After Filters"
    ABOVE_MISMATCH_THRESHOLD = "Above Mismatch Threshold"
    SKIPPED_ALIGN_DUE_TO_UNPAIRED_DUMMY = "SKipped Align Due To Unpaired Dummy Read"
    NONE = "None"

    def __str__(self) -> str:  # display parity with `src/align.rs:53-77`
        return self.value


# stable integer codes for FilterReason (columnar device/host interchange)
FILTER_REASONS = tuple(FilterReason)
FILTER_REASON_CODE = {r: i for i, r in enumerate(FILTER_REASONS)}


class AlignmentOrientation(enum.Enum):
    """Combined read-pair/feature orientation label (`src/align.rs:105-134`)."""

    FF = "FF"
    RR = "RR"
    UU = "UU"
    FR = "FR"
    FU = "FU"
    RF = "RF"
    RU = "RU"
    UF = "UF"
    UR = "UR"
    NONE = "None"

    def __str__(self) -> str:
        return self.value


class PairState(enum.Enum):
    """Which mates of a read pair produced a passing alignment (`src/align.rs:378-384`)."""

    FIRST = "First"
    SECOND = "Second"
    BOTH = "Both"
    NONE = "None"


@dataclass
class AlignFilterConfig:
    """The aligner's full configuration surface (`src/align.rs:79-95`).

    Field semantics (JSON keys parsed in `src/reference_library.rs:28-78`):
      reference_genome_size     — number of (doubled) library rows
      score_percent             — min normalized score (score/len) to keep a hit
      score_threshold           — min raw coverage score to keep a hit
      num_mismatches            — max tolerated mismatching bases per read
      discard_nonzero_mismatch  — hardcoded False from JSON (`reference_library.rs:116`)
      discard_multiple_matches  — drop hits whose equivalence class has >1 row
      score_filter              — parsed + validated but never used by the align
                                  path (dead knob, `reference_library.rs:33-35,118`)
      intersect_level           — R1/R2 callset merge strategy
      require_valid_pair        — drop pairs whose mates' eq classes differ
      discard_multi_hits        — post-rollup: drop callsets larger than this (0=off)
      max_hits_to_report        — drop read-pairs calling more features than this
      strand_filter             — library chemistry for orientation filtering
      trim_strictness / trim_target_length — MAXINFO quality-trimmer params
    """

    reference_genome_size: int = 0
    score_percent: float = 0.0
    score_threshold: int = 0
    num_mismatches: int = 0
    discard_nonzero_mismatch: bool = False
    discard_multiple_matches: bool = False
    score_filter: int = 0
    intersect_level: IntersectLevel = IntersectLevel.NO_INTERSECT
    require_valid_pair: bool = False
    discard_multi_hits: int = 0
    max_hits_to_report: int = 0
    strand_filter: LibraryChemistry = LibraryChemistry.NONE
    trim_strictness: float = 0.0
    trim_target_length: int = 0

    def sanity_check(self) -> None:
        """Range validation, parity with `src/reference_library.rs:209-226`."""
        if not (0.0 <= self.score_percent <= 1.0):
            raise ValueError("Error -- score_percent must be between 0 and 1")
        if self.score_filter < 0:
            raise ValueError("Error -- score_filter must be positive")
        if not (0.0 <= self.trim_strictness <= 1.0):
            raise ValueError("Error -- trim_strictness must be between 0 and 1")
