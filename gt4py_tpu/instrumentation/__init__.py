from .metrics import (  # noqa: F401
    MetricLevel,
    Metric,
    MetricsCollection,
    collection,
    collect_sample,
    dump_metrics,
    profile_range,
)
