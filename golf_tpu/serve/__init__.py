from .stream import GOLFStream  # noqa: F401
