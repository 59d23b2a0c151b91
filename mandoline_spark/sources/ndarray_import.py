"""Import n-dimensional arrays into the versioned store.

The reference interops with NetCDF through ucar.ma2 arrays
(/root/reference/project.clj:31, README.md:65-66).  Here the common
core is numpy: any dict of ndarrays becomes a dataset version, and
NetCDF/Zarr files reach that path through xarray (import-gated — the
library is optional; everything after ``to_arrays`` is identical).

Driver-side by design for the import entry point: file-format readers
are not splittable through this API.  For bulk 100 TB ingest, generate
piece rows in executors and call ``writer.write_pieces`` directly (see
bench.py's array workload for the pattern).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..core import slab as sb
from ..core import slice as sl
from ..store import Connection, Store

_NP_TO_TYPE = {
    np.dtype(np.int8): "byte",
    np.dtype(np.uint16): "char",
    np.dtype(np.int16): "short",
    np.dtype(np.int32): "int",
    np.dtype(np.int64): "long",
    np.dtype(np.float32): "float",
    np.dtype(np.float64): "double",
}


def spec_from_arrays(
    arrays: Mapping[str, np.ndarray],
    dim_names: Mapping[str, list[str]],
    chunks: Mapping[str, int],
    fills: Mapping[str, Any] | None = None,
) -> dict:
    """Dataset definition (SURVEY §1.1 token) from ndarrays: dimension
    lengths are taken from the arrays and must agree wherever a name is
    shared."""
    fills = dict(fills or {})
    dims: dict[str, int] = {}
    variables: dict[str, dict] = {}
    for var, arr in arrays.items():
        names = dim_names[var]
        if len(names) != arr.ndim:
            raise ValueError(f"{var}: {len(names)} dim names for {arr.ndim}-d array")
        for name, length in zip(names, arr.shape):
            if dims.setdefault(name, length) != length:
                raise ValueError(
                    f"dimension {name}: conflicting lengths "
                    f"{dims[name]} vs {length}"
                )
        # normalize byte order for the lookup: numpy dtype equality is
        # byte-order-sensitive, and NetCDF/HDF5 engines preserve
        # on-disk big-endian dtypes ('>f8') that are the same element
        # type (legacy_import does the equivalent byteswap)
        native = arr.dtype.newbyteorder("=")
        if native not in _NP_TO_TYPE:
            raise ValueError(f"{var}: unsupported dtype {arr.dtype}")
        type_name = _NP_TO_TYPE[native]
        fill = fills.get(var, float("nan") if type_name in ("float", "double") else 0)
        variables[var] = {
            "type": type_name,
            "shape": list(names),
            "fill-value": fill,
        }
    return {
        "dimensions": dims,
        "chunk-dimensions": {d: min(chunks.get(d, 64), n) for d, n in dims.items()},
        "variables": variables,
    }


def import_arrays(
    store: Store,
    dataset: str,
    arrays: Mapping[str, np.ndarray],
    dim_names: Mapping[str, list[str]],
    chunks: Mapping[str, int],
    fills: Mapping[str, Any] | None = None,
) -> Connection:
    """Create ``dataset`` (if absent) and commit one version holding all
    ``arrays`` at full extent.  Returns the connection."""
    from .. import writer

    # native byte order before slab construction: the writer's dtype
    # check compares against the variable's native dtype
    arrays = {
        k: np.ascontiguousarray(v).astype(
            np.asarray(v).dtype.newbyteorder("="), copy=False
        )
        for k, v in arrays.items()
    }
    spec = spec_from_arrays(arrays, dim_names, chunks, fills)
    conn = store.connect_or_create(dataset)
    token = conn.add_version(spec)
    writes = {
        var: [
            sb.Slab(
                np.ascontiguousarray(arr),
                sl.mk_slice(tuple(0 for _ in arr.shape), arr.shape),
            )
        ]
        for var, arr in arrays.items()
    }
    writer.write(conn, token, writes)
    conn.finish_version(token)
    return conn


def import_xarray(
    store: Store,
    dataset: str,
    xr_dataset: "object",
    chunks: Mapping[str, int] | None = None,
) -> Connection:
    """NetCDF/Zarr → store, via an ``xarray.Dataset`` (open with
    ``xarray.open_dataset`` / ``open_zarr``).  Import-gated: raises
    ImportError with guidance when xarray is unavailable."""
    try:
        import xarray  # noqa: F401
    except ImportError as exc:  # pragma: no cover - xarray absent here
        raise ImportError(
            "xarray is required for NetCDF/Zarr import; install xarray "
            "(and netCDF4/zarr) or use import_arrays with numpy arrays"
        ) from exc
    arrays = {str(k): np.asarray(v.values) for k, v in xr_dataset.data_vars.items()}
    dim_names = {
        str(k): [str(d) for d in v.dims] for k, v in xr_dataset.data_vars.items()
    }
    fills = {
        str(k): v.attrs["_FillValue"]
        for k, v in xr_dataset.data_vars.items()
        if "_FillValue" in v.attrs
    }
    default_chunks = {str(d): 64 for d in xr_dataset.dims}
    return import_arrays(
        store, dataset, arrays, dim_names, chunks or default_chunks, fills
    )


def export_arrays(
    conn: Connection,
    token: Mapping[str, Any] | None = None,
    variables: list[str] | None = None,
) -> dict[str, np.ndarray]:
    """Read variables back at full extent as numpy arrays (the return
    leg of the ndarray interop: import → query/version → export).
    Defaults to the last committed version and every variable.  Each
    array materializes on the driver — this is the interop exit for
    results that fit one machine; stay on the cells/diff DataFrames for
    anything bigger."""
    from .. import reader
    from ..core import metadata as md

    if token is None:
        token = reader.on_last_version(conn)
    names = variables or list(token.get("variables", {}))
    out: dict[str, np.ndarray] = {}
    for var in names:
        extent = md.get_var_slice(token, var)
        out[var] = reader.get_slice(conn, token, var, extent).data
    return out


def export_xarray(
    conn: Connection,
    token: Mapping[str, Any] | None = None,
) -> "object":
    """Store → ``xarray.Dataset`` (write out with ``to_netcdf`` /
    ``to_zarr``).  Import-gated like :func:`import_xarray`; dimension
    names and fill values round-trip from the dataset definition."""
    try:
        import xarray
    except ImportError as exc:  # pragma: no cover - xarray absent here
        raise ImportError(
            "xarray is required for NetCDF/Zarr export; install xarray "
            "or use export_arrays for plain numpy"
        ) from exc
    from .. import reader
    from ..core import metadata as md

    if token is None:
        token = reader.on_last_version(conn)
    data_vars = {}
    for var in token.get("variables", {}):
        arr = export_arrays(conn, token, [var])[var]
        dims = md.get_variable_dimensions(token, var)
        attrs = {"_FillValue": md.get_fill(token, var)}
        data_vars[var] = xarray.DataArray(arr, dims=dims, attrs=attrs)
    return xarray.Dataset(data_vars)
