"""Migrate a legacy (reference-format) mandoline store into this engine.

A legacy backend dump is, per variable, the index map
``chunk coordinate → chunk hash`` joined with the chunk store
``hash → bytes``, where bytes are chain-enveloped
(compressed_store.clj:7-30; stock chain ``["lz4"]``) and the decoded
payload is the chunk's cells as ``ucar.ma2
Array.getDataAsByteBuffer()`` produced them — BIG-endian
(java.nio default order; chunk.clj:36-40, impl.clj:256-264).

:func:`import_legacy_chunks` takes that dump as a DataFrame per
variable and re-commits it here: the chain decode + byteswap runs IN
EXECUTORS (``mapInPandas`` over the chunk rows — the 100 TB shape,
nothing funnels through the driver), and since every legacy chunk is by
definition a full chunk tile, ingest takes the zero-shuffle aligned
fast path.  The legacy metadata map is used as the dataset definition
verbatim — the formats are identical by construction (SURVEY §1.1).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from pyspark.sql import DataFrame

from ..core import metadata as md
from ..store import Connection, Store

# big-endian on-disk element type → numpy source dtype (slab.as_dtype
# gives the little-endian target); 1-byte types need no swap but the
# round trip through ">i1" is a no-op, so one table serves all
_BE_DTYPE = {
    "byte": ">i1",
    "char": ">u2",
    "short": ">i2",
    "int": ">i4",
    "long": ">i8",
    "float": ">f4",
    "double": ">f8",
}


def decode_legacy_blob(blob: bytes, type_name: str) -> bytes:
    """Chain-enveloped big-endian chunk bytes → this engine's canonical
    little-endian cell bytes."""
    from ..filters import chain_reverse

    raw = chain_reverse(blob)
    be = np.frombuffer(raw, dtype=_BE_DTYPE[type_name])
    return be.astype(be.dtype.newbyteorder("<"), copy=False).tobytes()


def import_legacy_chunks(
    store: Store,
    dataset: str,
    spec: Mapping,
    var_chunks: Mapping[str, DataFrame],
) -> Connection:
    """Create ``dataset`` (if absent) and commit one version holding
    every legacy chunk.

    ``spec`` is the legacy dataset metadata map (its user keys pass
    through :meth:`Connection.add_version` validation unchanged).
    ``var_chunks`` maps variable name → DataFrame with columns
    ``coord array<int>`` (the chunk coordinate) and ``blob binary``
    (the chain-enveloped chunk bytes).
    """
    import pandas as pd

    from .. import writer

    conn = store.connect_or_create(dataset)
    token = conn.add_version(spec)
    for var, df in var_chunks.items():
        type_name = md.get_type(token, var)
        ndim = len(md.get_variable_dimensions(token, var))
        step = md.get_chunk_grid_slice(token, var).step

        def decode(batches, _type=type_name, _step=step, _ndim=ndim):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples():
                    coord = [int(c) for c in r.coord]
                    if len(coord) != _ndim:
                        raise ValueError(
                            f"coord {coord} is not {_ndim}-dimensional"
                        )
                    row = {
                        "ckey": "_".join(str(c) for c in coord),
                        "ord": 0,
                        "pstart": [c * s for c, s in zip(coord, _step)],
                        "pstop": [
                            (c + 1) * s for c, s in zip(coord, _step)
                        ],
                        "data": decode_legacy_blob(bytes(r.blob), _type),
                    }
                    row.update(
                        {f"c{i}": c for i, c in enumerate(coord)}
                    )
                    rows.append(row)
                yield pd.DataFrame(
                    rows,
                    columns=[f.name for f in writer.piece_schema(_ndim)],
                )

        pieces = df.mapInPandas(decode, writer.piece_schema(ndim))
        writer.ingest_aligned(conn, token, var, pieces)
    conn.finish_version(token)
    return conn
