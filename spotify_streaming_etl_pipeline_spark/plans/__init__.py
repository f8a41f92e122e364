from . import analytics, dims, facts, mapping, marts

__all__ = ["analytics", "dims", "facts", "mapping", "marts"]
