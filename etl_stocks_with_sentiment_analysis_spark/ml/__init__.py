"""MLlib pipeline: feature engineering (native window exprs), chrono
split, RandomForest training with balanced weights, evaluation, and
next-day inference ending in an upsert sink."""

from . import features  # noqa: F401
from . import predict  # noqa: F401
