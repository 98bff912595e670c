from sensor_data_pipeline_spark.functions.scalar import (  # noqa: F401
    clamp,
    linear_derive,
    pack_bytes,
    rescale,
    sentinel_default,
    twos_complement,
)
from sensor_data_pipeline_spark.functions.timefn import (  # noqa: F401
    iso8601_format,
    iso8601_parse,
)
from sensor_data_pipeline_spark.functions.json_wire import (  # noqa: F401
    parse_wire,
    to_wire_json,
)
