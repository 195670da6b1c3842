from lab3_spark.streaming.windowed import (
    streaming_tumbling_counts,
    streaming_word_count,
)

__all__ = ["streaming_word_count", "streaming_tumbling_counts"]
