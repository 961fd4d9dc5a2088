from .micro_batch import stream_extract  # noqa: F401
from .windowed import stream_windowed_counts  # noqa: F401
from .stateful import stream_sessionize  # noqa: F401
from .dedup_stream import read_dedup_output, stream_exact_dedup  # noqa: F401
from .neardup_stream import stream_near_dup  # noqa: F401
from .sketch_stream import (  # noqa: F401
    read_sketch_output,
    stream_heavy_hitters,
)
from .join_stream import stream_click_purchase_join  # noqa: F401
from .upsert_stream import (  # noqa: F401
    current_state,
    stream_upsert,
)
from .kmv_stream import (  # noqa: F401
    read_kmv_output,
    stream_kmv_distinct,
)
from .trending_stream import (  # noqa: F401
    read_trending_output,
    stream_decayed_topk,
)
