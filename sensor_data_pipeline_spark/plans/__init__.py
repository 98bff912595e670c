from sensor_data_pipeline_spark.plans.registry import REGISTRY, QuerySpec, all_oracle_sql, all_queries  # noqa: F401

# importing the modules populates REGISTRY
from sensor_data_pipeline_spark.plans import relational  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import sensor  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import northstar  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import multimodal  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import advanced  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import streaming_queries  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import storage  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import warehouse  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import tpch_shapes  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import corpus_quality  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import sql_interface  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import api_surface  # noqa: F401,E402
