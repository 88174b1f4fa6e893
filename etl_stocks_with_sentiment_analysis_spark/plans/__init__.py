from . import panel  # noqa: F401
from . import quality  # noqa: F401  (registers quality_dbt_tests)
from . import dbt_runner  # noqa: F401  (registers pipeline_dbt_models, sink_manifest_ctas)
