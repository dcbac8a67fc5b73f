"""Import every query-registering module and re-export the registry.

Import THIS (not svoe_spark.queries) anywhere the full registry is
needed — decorator registration only happens on module import.
"""

import svoe_spark.queries  # noqa: F401
import svoe_spark.queries_llm  # noqa: F401
from svoe_spark.queries import QUERIES  # noqa: F401
