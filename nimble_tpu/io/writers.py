"""Output writers.

Parity target: `write_to_tsv` (`src/utils.rs:27-51`) — append mode, header
"feature\\tscore" only when the file is empty, features joined by TABs
(multi-feature callsets produce extra columns; reference quirk kept).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple


def write_to_tsv(results: Sequence[Tuple[List[str], int]], output_path: str) -> None:
    write_header = not (
        os.path.exists(output_path) and os.path.getsize(output_path) > 0
    )
    with open(output_path, "a", encoding="utf-8") as f:
        if write_header:
            f.write("feature\tscore\n")
        for features, score in results:
            f.write("\t".join(features) + f"\t{score}\n")
