from polars_sim_spark.operators.join_sim import join_sim, similarity_mapping

__all__ = ["join_sim", "similarity_mapping"]
