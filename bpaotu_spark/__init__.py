"""bpaotu_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of muccg/bpaotu (the Australian Microbiome
OTU query portal), rebuilt Spark-first.

The reference (public repo muccg/bpaotu) is a Django + SQLAlchemy +
PostgreSQL query portal over an OTU abundance star schema:

- ``SampleContext``  (contextual / environmental sample attributes)
- ``OTU``            (taxonomy hierarchy kingdom..species)
- ``SampleOTU``      (the big (sample, otu, count) abundance fact)

Here the same roles are played by the driver test tables
(``customer``/``orders`` = SampleContext, ``region→nation→mktsegment``
and ``part.(type, brand)`` = taxonomy hierarchies, ``lineitem`` =
SampleOTU), and every operator is written as a *generic* PySpark
DataFrame composition designed for 100 TB / multi-executor scale:
declarative plans (Catalyst does pushdown + pruning + join selection),
broadcast dim joins, blocked pairwise operators, no driver-side
collects in any operator path.
"""

from bpaotu_spark.session import get_session
from bpaotu_spark.catalog import load_tables, TABLE_NAMES

__all__ = ["get_session", "load_tables", "TABLE_NAMES"]
__version__ = "0.2.0"
