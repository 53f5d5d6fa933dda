from moisturizer_spark.streaming.ingest_stream import (  # noqa: F401
    file_envelope_stream,
    kafka_envelope_stream,
    start_ingest_stream,
)
from moisturizer_spark.streaming.rollup import (  # noqa: F401
    continuous_rollup,
    read_rollup,
)
from moisturizer_spark.streaming.stateful import (  # noqa: F401
    running_user_stats,
    stream_dedup_by_id,
    stream_dedup_within_watermark,
)
from moisturizer_spark.streaming.stateful_v2 import (  # noqa: F401
    ROCKSDB_PROVIDER,
    running_user_topk,
)
from moisturizer_spark.streaming.windows import (  # noqa: F401
    session_window_stats,
    sliding_counts,
    tumbling_counts,
)
from moisturizer_spark.streaming.near_dup import (  # noqa: F401
    start_near_dup_stream,
)
from moisturizer_spark.streaming.semantic_dedup import (  # noqa: F401
    start_semantic_dedup_stream,
)
from moisturizer_spark.streaming.joins import (  # noqa: F401
    stream_banded_interval_join,
    stream_interval_join,
)
from moisturizer_spark.streaming.observability import (  # noqa: F401
    StreamMetricsRecorder,
    lag_report,
)
