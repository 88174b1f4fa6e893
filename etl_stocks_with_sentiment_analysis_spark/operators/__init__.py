"""Operator families from SURVEY.md §2. Importing this package
registers every query key in :mod:`..registry`."""

from . import windows  # noqa: F401
from . import joins  # noqa: F401
from . import aggregations  # noqa: F401
