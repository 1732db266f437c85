from smart_energy_consumption_analytics_using_big_data_spark.plans.registry import (
    ORACLE,
    QUERIES,
    flagship,
)

__all__ = ["ORACLE", "QUERIES", "flagship"]
