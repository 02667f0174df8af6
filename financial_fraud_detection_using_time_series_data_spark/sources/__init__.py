from .tables import TABLES, load_table, load_tables
from .synthetic import generate_transactions
from .profiler import null_profile, profile

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "generate_transactions",
    "null_profile",
    "profile",
]
