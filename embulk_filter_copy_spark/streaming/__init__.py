from embulk_filter_copy_spark.streaming.metrics import ProgressRecorder, with_observed_metrics

__all__ = ["ProgressRecorder", "with_observed_metrics"]
