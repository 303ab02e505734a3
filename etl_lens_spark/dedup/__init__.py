from etl_lens_spark.dedup.exact import exact_dedup, fingerprint_dedup
from etl_lens_spark.dedup.minhash import (
    add_minhash_signature,
    add_shingles,
    minhash_lsh_candidates,
)
from etl_lens_spark.dedup.simhash import add_simhash, simhash_candidates

__all__ = [
    "exact_dedup",
    "fingerprint_dedup",
    "add_shingles",
    "add_minhash_signature",
    "minhash_lsh_candidates",
    "add_simhash",
    "simhash_candidates",
]
