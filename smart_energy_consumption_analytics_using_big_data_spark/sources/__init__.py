from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import (
    TESTDATA_TABLES,
    configure_runtime,
    load_table,
    register_views,
)

__all__ = ["TESTDATA_TABLES", "configure_runtime", "load_table", "register_views"]
