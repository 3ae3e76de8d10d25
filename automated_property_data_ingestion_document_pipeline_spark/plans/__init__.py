"""Query plan registry — the bridge between operators and the driver.

``registry.py`` holds the decorator + dicts; ``queries_*.py`` modules
register every SURVEY §2 key. Importing this package populates the
registry.
"""

from automated_property_data_ingestion_document_pipeline_spark.plans.registry import (
    ORACLES,
    QUERIES,
    query,
)

# Import for registration side effects — order mirrors SURVEY §7 stages.
from automated_property_data_ingestion_document_pipeline_spark.plans import (  # noqa: E402,F401
    queries_scalar,
    queries_relational,
    queries_window,
    queries_time,
    queries_text,
    queries_vector,
    queries_pipeline,
    queries_analytic,
    queries_advanced,
    queries_scale,
    queries_sql,
    queries_misc,
    queries_reference,
    queries_training,
    queries_layout,
    queries_geo,
    queries_cdc,
    queries_graph,
    queries_intervals,
    queries_sqlx,
    queries_sketches,
    queries_formats,
    queries_stats,
    queries_timeseries,
    queries_search,
    queries_quality,
    queries_features,
    queries_product,
    queries_mleval,
    queries_paths,
    queries_neardup,
)

__all__ = ["QUERIES", "ORACLES", "query"]
