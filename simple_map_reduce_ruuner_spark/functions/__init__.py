from simple_map_reduce_ruuner_spark.functions.hashing import (
    HASH60_SQL,
    MINHASH_PRIME,
    hash60,
    minhash_perm,
)
from simple_map_reduce_ruuner_spark.functions.text import (
    chars,
    norm_text,
    tokens,
    word_shingles,
)
from simple_map_reduce_ruuner_spark.functions.vectors import cosine, dot, l2_norm

__all__ = [
    "HASH60_SQL",
    "MINHASH_PRIME",
    "hash60",
    "minhash_perm",
    "chars",
    "norm_text",
    "tokens",
    "word_shingles",
    "cosine",
    "dot",
    "l2_norm",
]
