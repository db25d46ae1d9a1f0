from .events import (sessionized_stream, stream_from_directory,
                     tumbling_stream, windowed_counts)

__all__ = ["stream_from_directory", "tumbling_stream", "windowed_counts",
           "sessionized_stream"]
