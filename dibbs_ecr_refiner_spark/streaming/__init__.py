from .apply import stream_replay  # noqa: F401
