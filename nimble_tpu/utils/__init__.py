from nimble_tpu.utils.dna import (  # noqa: F401
    encode_bases,
    decode_bases,
    revcomp,
    revcomp_codes,
    shannon_entropy,
    shannon_entropy_from_counts,
)
from nimble_tpu.utils.natsort import natural_lexical_cmp, natural_lexical_sort  # noqa: F401
