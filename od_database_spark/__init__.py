"""oddb-spark: a PySpark-native rebuild of simon987/od-database's
data-processing capabilities (URL frontier, fetch scheduler, seen set,
search/stats query layer) plus large-scale training-data operators.

Not a port: the reference (Python + Postgres + Elasticsearch) tells us WHAT to
compute; everything here is expressed as Spark DataFrame plans so Catalyst and
Tungsten pick the physical strategy. See SURVEY.md for the full blueprint with
file:line citations into /root/reference.
"""

__version__ = "0.1.0"
