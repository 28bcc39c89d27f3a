"""netcdf4_variable_streamer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference library ``david-salac/NetCDF4-variable-streamer`` (a chunked
NetCDF4 streaming-I/O wrapper; see SURVEY.md §1/§2 Table A), re-expressed
Spark-first:

- the reference's chunked scan / buffered streaming write / tail-follow
  surface becomes a custom Python DataSource (``sources/``);
- everything the reference leaves to "apply NumPy after reading" becomes a
  declarative DataFrame/SQL operator catalog (``operators/``), optimized by
  Catalyst (predicate pushdown, broadcast joins, whole-stage codegen);
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) are first-class (``operators/dedup.py`` etc.).

Every operator is registered in ``registry.REGISTRY`` with an optional
DuckDB oracle SQL string; ``__spark_entry__.py`` exposes the driver
contract from that registry.
"""

from netcdf4_variable_streamer_spark.registry import REGISTRY, register

__all__ = ["REGISTRY", "register"]
__version__ = "0.1.0"
