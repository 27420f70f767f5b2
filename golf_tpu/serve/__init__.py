from .stream import GOLFStream  # noqa: F401
from .enc_stream import StreamingEncoder  # noqa: F401
