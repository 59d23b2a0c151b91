"""Pure-Python/numpy array kernel: slice algebra, slab algebra, chunk
coordinate math, metadata validation.  No Spark dependency — the Spark
layers (store/reader/writer) compose these inside pandas UDFs."""

from . import chunk, metadata, slab, slice  # noqa: F401
from .slab import DTYPES, Slab  # noqa: F401
from .slice import Slice, mk_slice  # noqa: F401
