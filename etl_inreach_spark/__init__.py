"""etl_inreach_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of the
reference ETL task (dfpc-coe/etl-inreach, surveyed in SURVEY.md) as a
library of reusable, scale-conscious DataFrame operators, plus the
extended LLM-data-pipeline surface (dedup, similarity search, text
analysis, multimodal columns).

Design rules (see SURVEY.md §4.3):
  * DataFrame/SQL everywhere; no RDDs.
  * Built-in Column expressions in hot paths (JVM-side, whole-stage
    codegen); Arrow pandas UDFs only where built-ins cannot express the
    semantics.
  * Every operator is a pure ``DataFrame -> DataFrame`` function so
    Catalyst sees one logical plan and can push filters / prune columns
    across operator boundaries.
  * Aggregations prefer partial-agg-friendly forms (``max_by`` over
    window sorts) so map-side combine keeps shuffles small at 100 TB.
"""

__version__ = "0.1.0"

from etl_inreach_spark.session import get_spark  # noqa: F401
from etl_inreach_spark.catalog import TABLES, load_tables  # noqa: F401
