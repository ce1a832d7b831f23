"""The ONE malformed-input contract for every pure-python codec.

Truncated/corrupt payloads hit struct.unpack, indexing, dict lookups, or
zlib deep inside a decoder; without normalization those raise exception
types that ESCAPE the ``except (ValueError, NotImplementedError)``
quarantine in the Spark operators and kill the whole task from a single
poison row (found by fuzzing; a valid-CRC PNG over a truncated deflate
stream raises ``zlib.error``, which is not a ValueError). Every decoder
wraps with this decorator so the tuple can never drift between codecs.
"""

from __future__ import annotations

import functools
import struct
import zlib

MALFORMED_ERRORS = (
    struct.error,
    IndexError,
    KeyError,
    EOFError,
    OverflowError,
    zlib.error,
)


def malformed_raises_valueerror(fn):
    """Normalize low-level parse errors to the documented ValueError at
    the codec boundary."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except MALFORMED_ERRORS as e:
            name = fn.__name__.replace("decode_", "").replace("_inner", "")
            raise ValueError(f"malformed {name} input: {e}") from e

    return wrapped
