"""affinity-spark: a PySpark-native engine with the query and data-processing
capabilities of amient/affinity (see SURVEY.md), rebuilt Spark-first.

Everything is expressed as DataFrame/SQL logical plans so Catalyst owns
pushdown, pruning, join strategy and whole-stage codegen; Python touches data
only through Arrow-batched pandas UDFs on the few operators Spark lacks.
"""

from affinity_spark.session import get_spark
from affinity_spark.timerange import TimeRange

__all__ = ["get_spark", "TimeRange"]
__version__ = "0.1.0"
