"""Operator families from SURVEY.md §2. Importing this package
registers every query key in :mod:`..registry`."""

from . import windows  # noqa: F401
from . import joins  # noqa: F401
from . import aggregations  # noqa: F401
from . import filters  # noqa: F401
from . import scalars  # noqa: F401
from . import sorts  # noqa: F401
from . import reshape  # noqa: F401
from . import sinks  # noqa: F401
from . import sources_ops  # noqa: F401
from . import analytics  # noqa: F401
from . import sqldml  # noqa: F401
