from .tables import (
    TABLES,
    load_stream_table,
    load_table,
    load_tables,
    normalize_scan_types,
)
from .synthetic import generate_transactions
from .profiler import (
    check_expectations,
    fd_check,
    freshness_lag,
    kfold_assign,
    null_profile,
    pattern_profile,
    pk_candidates,
    profile,
    referential_integrity,
    schema_diff,
)

__all__ = [
    "TABLES",
    "load_stream_table",
    "load_table",
    "load_tables",
    "normalize_scan_types",
    "generate_transactions",
    "check_expectations",
    "fd_check",
    "kfold_assign",
    "null_profile",
    "schema_diff",
    "profile",
    "referential_integrity",
    "pk_candidates",
    "freshness_lag",
    "pattern_profile",
]
