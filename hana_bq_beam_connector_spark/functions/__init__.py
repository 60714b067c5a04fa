from hana_bq_beam_connector_spark.functions.hashing import (
    BAND_COMBINE,
    MINHASH_COEFFS,
    PRIME,
    duck_polyhash,
    spark_polyhash,
)

__all__ = [
    "BAND_COMBINE",
    "MINHASH_COEFFS",
    "PRIME",
    "duck_polyhash",
    "spark_polyhash",
]
