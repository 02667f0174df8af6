from .tables import TABLES, load_table, load_tables
from .synthetic import generate_transactions
from .profiler import check_expectations, kfold_assign, null_profile, profile

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "generate_transactions",
    "check_expectations",
    "kfold_assign",
    "null_profile",
    "profile",
]
