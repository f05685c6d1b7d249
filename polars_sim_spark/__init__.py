"""polars_sim_spark — a PySpark-native analytics engine with the query
capabilities of ``schemaitat/polars_sim`` (approximate string-similarity
join), generalized for large-scale training-data pipelines.

Built from scratch on the Spark DataFrame API: the reference's Rust sparse
matrix kernel (reference ``src/cossim.rs``) is re-expressed as a declarative
tokenize → explode → equi-join → hash-aggregate → window-top-k pipeline so
Catalyst/Tungsten pick the physical strategy (broadcast vs shuffle, AQE skew
handling, whole-stage codegen).

Public API:
    join_sim            — approximate string-similarity join (reference P1)
    normalize_string_col — strip non-alphanumerics + lowercase (reference P2)
"""

from polars_sim_spark.cache import unpersist_all
from polars_sim_spark.functions.text import normalize_string_col, trigram_tokens
from polars_sim_spark.operators.join_sim import join_sim
from polars_sim_spark.session import get_spark

__all__ = [
    "join_sim",
    "unpersist_all",
    "normalize_string_col",
    "trigram_tokens",
    "get_spark",
]

__version__ = "0.1.0"
