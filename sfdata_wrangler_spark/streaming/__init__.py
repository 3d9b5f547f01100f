from .funnel_stream import stateful_funnel
from .sessionize_stream import stream_session_stats

__all__ = ["stateful_funnel", "stream_session_stats"]
