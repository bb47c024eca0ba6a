from crawler_service_spark.streaming.jobs import (
    host_budget_state,
    sessionize_events,
    windowed_event_counts,
)

__all__ = ["windowed_event_counts", "host_budget_state", "sessionize_events"]
