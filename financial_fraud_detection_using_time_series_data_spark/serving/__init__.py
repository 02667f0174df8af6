from .http_api import FraudScoringService, serve

__all__ = ["FraudScoringService", "serve"]
