from . import jsonio, stream_capture
from .jsonio import dumps, from_jsonable, loads, to_jsonable
from .stream_capture import StreamCapture, WarningCollector

__all__ = [
    "jsonio", "stream_capture",
    "to_jsonable", "from_jsonable", "dumps", "loads",
    "StreamCapture", "WarningCollector",
]
