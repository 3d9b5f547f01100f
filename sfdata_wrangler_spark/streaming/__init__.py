from .sessionize_stream import stream_session_stats

__all__ = ["stream_session_stats"]
