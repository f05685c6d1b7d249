"""Operator surface.

``join_sim``/``similarity_mapping`` are the reference-parity core
(reference ``python/polars_sim/dataframe/join.py:15-149``); the rest are
the large-scale training-data extensions. Submodules (``dedup``,
``similarity``, ``curation``, ``multimodal``, ``asof_join``) hold the
full per-family APIs; the names re-exported here are the entry points a
pipeline typically composes.
"""

from polars_sim_spark.operators.asof_join import asof_join
from polars_sim_spark.operators.curation import hash_split, sessionize
from polars_sim_spark.operators.dedup import remove_near_dups
from polars_sim_spark.operators.join_sim import join_sim, similarity_mapping
from polars_sim_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
)

__all__ = [
    "join_sim",
    "similarity_mapping",
    "asof_join",
    "hash_split",
    "sessionize",
    "remove_near_dups",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_lsh",
]
