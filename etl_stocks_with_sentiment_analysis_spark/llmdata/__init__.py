"""LLM-training-data pipeline operators (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal column
plumbing, and the Arrow-batched enrichment stage.
"""

from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import text  # noqa: F401
from . import multimodal  # noqa: F401
from . import enrich  # noqa: F401
