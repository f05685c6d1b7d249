from polars_sim_spark.plans.explain import formatted_plan, assert_broadcast_join, assert_pushed_filters

__all__ = ["formatted_plan", "assert_broadcast_join", "assert_pushed_filters"]
