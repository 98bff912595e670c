from sensor_data_pipeline_spark.operators.joins import asof_join  # noqa: F401
from sensor_data_pipeline_spark.operators.sessionize import sessionize_by_sign_flip, session_rates  # noqa: F401
from sensor_data_pipeline_spark.operators.staleness import apply_staleness  # noqa: F401
from sensor_data_pipeline_spark.operators.topk import topk_per_group  # noqa: F401
