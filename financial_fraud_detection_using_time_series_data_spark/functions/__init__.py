from . import exprs

__all__ = ["exprs"]
