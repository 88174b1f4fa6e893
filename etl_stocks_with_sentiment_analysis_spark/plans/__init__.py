from . import panel  # noqa: F401
from . import quality  # noqa: F401  (registers quality_dbt_tests)
