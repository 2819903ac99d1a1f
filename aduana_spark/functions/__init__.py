"""Scalar-function surface of the engine (SURVEY.md §2.8)."""

from aduana_spark.functions.urls import (  # noqa: F401
    domain_col,
    ref_same_domain,
    ref_url_domain,
    same_domain_col,
    url_hash_col,
)
