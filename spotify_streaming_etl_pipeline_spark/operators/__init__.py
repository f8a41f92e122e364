from .asof import asof_join
from .surrogate import with_surrogate_key
from .writer import idempotent_append, upsert

__all__ = ["asof_join", "with_surrogate_key", "idempotent_append", "upsert"]
