from .trifecta import TrifectaBuilder, TrifectaResult

__all__ = ["TrifectaBuilder", "TrifectaResult"]
