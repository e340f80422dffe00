"""mycenae_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the uol/mycenae time-series database.

Design stance (see SURVEY.md §7): mycenae is a stateless OpenTSDB-compatible
query/ingest layer whose computation is per-series in-memory math (merge,
downsample, rate, fill) over points fetched from Cassandra, with a Solr-backed
metadata index.  This engine re-expresses that surface Spark-first:

* points live in a partitioned Parquet lake (``sources/``),
* the series-metadata index is a small ``series_catalog`` DataFrame
  (``catalog.py``) used as a broadcast semi-join — the moral equivalent of
  mycenae's Solr-resolution-before-Cassandra-read,
* every TSDB operator (tag filters, aggregators, downsample + fill policies,
  rate/counter-rate, operation ordering) is a composition of built-in
  DataFrame operations (``operators/``) so Catalyst keeps predicate pushdown,
  column pruning and whole-stage codegen,
* the OpenTSDB query dict and the functional expression language both parse
  to one ``TsdbQuery`` IR (``plans/``) planned into a DataFrame program,
* large-scale training-data-pipeline extensions (dedup, similarity search,
  text analysis, multimodal plumbing) live in ``functions/``.

Everything here derives from public knowledge only: the Apache Spark API and
the publicly documented OpenTSDB/mycenae HTTP semantics.  The reference
checkout at /root/reference was empty at build time (SURVEY.md §0), so
docstrings cite upstream *package* loci from SURVEY.md rather than file:line.
"""

from mycenae_spark.session import get_spark
from mycenae_spark.sources.tables import load_table, events_as_points
from mycenae_spark.catalog import build_catalog, lookup, suggest
from mycenae_spark.operators.downsample import downsample, fill_linear
from mycenae_spark.operators.merge import merge
from mycenae_spark.operators.rate import rate
from mycenae_spark.operators.asof import asof_join
from mycenae_spark.plans.tsdb import TsdbQuery, plan
from mycenae_spark.plans.expression import (
    check_expression,
    parse_expression,
    render_expression,
)

__all__ = [
    "get_spark",
    "load_table",
    "events_as_points",
    "build_catalog",
    "lookup",
    "suggest",
    "downsample",
    "fill_linear",
    "merge",
    "rate",
    "asof_join",
    "TsdbQuery",
    "plan",
    "parse_expression",
    "render_expression",
    "check_expression",
]

__version__ = "0.1.0"
