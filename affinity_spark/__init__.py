"""affinity-spark: a PySpark-native engine with the query and data-processing
capabilities of amient/affinity (see SURVEY.md), rebuilt Spark-first.

Everything is expressed as DataFrame/SQL logical plans so Catalyst owns
pushdown, pruning, join strategy and whole-stage codegen; Python touches data
only through Arrow-batched pandas UDFs on the few operators Spark lacks.
"""

from affinity_spark import zipcache_patch as _zipcache_patch
from affinity_spark.session import get_spark
from affinity_spark.timerange import TimeRange

# Stat-guard zipimporter.invalidate_caches (CPython 3.11 re-parses every
# sys.path zip's central directory on each call, and pyspark workers call
# it per task — ~150 ms of worker CPU per python-boundary task; see
# zipcache_patch for the measurement). Applied here so both the driver
# and every reused python worker (which imports this package to unpickle
# our module-level UDFs) get it.
_zipcache_patch.apply()

__all__ = ["get_spark", "TimeRange"]
__version__ = "0.1.0"
