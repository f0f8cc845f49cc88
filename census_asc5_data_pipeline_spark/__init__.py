"""PySpark-native analytics engine with the query and data-processing
capabilities of brandonltran/census-asc5-data-pipeline, generalized to
arbitrary tabular data and extended with large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is expressed through the DataFrame/SQL API so Catalyst owns
physical planning; Python UDFs appear only where built-ins cannot express
the semantics, and then always as Arrow-batched pandas UDFs.
"""

from census_asc5_data_pipeline_spark.session import get_spark
from census_asc5_data_pipeline_spark.catalog import Catalog, load_tables

__all__ = ["get_spark", "Catalog", "load_tables"]
