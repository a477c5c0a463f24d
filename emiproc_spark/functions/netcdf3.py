"""Pure-numpy NetCDF-3 (classic / 64-bit-offset) reader and writer.

The container environment ships no xarray / netCDF4 / scipy, yet NetCDF
is the reference's primary I/O format (readers:
emiproc/inventories/netcdf_raster.py:112-295, tno.py:95-239; writer:
emiproc/exports/rasters.py:14-323).  The NetCDF *classic* file format is
a small, fully public specification (Unidata "NetCDF Classic Format
Spec"; the same layout scipy.io.netcdf implements), so rather than
gating the whole ingest/export surface behind a missing dependency we
implement the codec directly:

- magic ``CDF\\x01`` (classic, 32-bit offsets) and ``CDF\\x02``
  (64-bit offsets) are both read; the writer emits CDF-1 unless an
  offset would overflow, then CDF-2.
- dimensions (incl. one UNLIMITED/record dim), global and per-variable
  attributes, and the six classic types (byte, char, short, int, float,
  double) are supported.  All values big-endian, 4-byte aligned, per
  the spec.
- NetCDF-4 (HDF5 container) is out of scope — files starting with the
  HDF5 magic raise with a clear message.

This module is deliberately dependency-free (numpy + stdlib) so it can
run inside Spark executors (mapInPandas / flatMap over a file list)
without shipping extra packages to the cluster.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6

_TYPEMAP = {
    NC_BYTE: ("b", 1),
    NC_CHAR: ("c", 1),
    NC_SHORT: (">i2", 2),
    NC_INT: (">i4", 4),
    NC_FLOAT: (">f4", 4),
    NC_DOUBLE: (">f8", 8),
}

_DTYPE_TO_NC = {
    "int8": NC_BYTE,
    "int16": NC_SHORT,
    "int32": NC_INT,
    "int64": NC_INT,  # narrowed on write (classic has no 64-bit int)
    "float32": NC_FLOAT,
    "float64": NC_DOUBLE,
}

_ZERO = b"\x00\x00\x00\x00"
_NC_DIMENSION = b"\x00\x00\x00\x0a"
_NC_VARIABLE = b"\x00\x00\x00\x0b"
_NC_ATTRIBUTE = b"\x00\x00\x00\x0c"


@dataclass
class NCVariable:
    name: str
    dims: tuple[str, ...]
    data: np.ndarray
    attrs: dict[str, object] = field(default_factory=dict)


@dataclass
class LazySlab:
    """Variable payload loaded on demand at write time.

    Lets ``write_netcdf`` lay out and stream a file whose per-variable
    arrays were produced executor-side (e.g. ``.npy`` slabs written by an
    ``applyInPandas`` group task): the writer needs only ``shape`` and
    ``dtype`` for the header/layout pass, then calls ``load()`` once per
    variable while streaming the data section, so driver memory stays
    bounded by the single largest variable rather than the whole file.

    ``chunk_loaders``, when given, replaces ``load``: a list of
    callables whose returned arrays concatenate along axis 0 to the
    declared shape; the writer streams them one chunk at a time (e.g. a
    (time, lat, lon) variable as one raster per time step), so even a
    single huge variable never materializes whole.
    """

    shape: tuple[int, ...]
    dtype: str
    load: object = None  # Callable[[], np.ndarray]
    chunk_loaders: object = None  # list[Callable[[], np.ndarray]]

    @property
    def size(self) -> int:
        return int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1


@dataclass
class NCDataset:
    """In-memory image of a classic NetCDF file."""

    dims: dict[str, int] = field(default_factory=dict)  # name -> length
    attrs: dict[str, object] = field(default_factory=dict)
    variables: dict[str, NCVariable] = field(default_factory=dict)
    record_dim: str | None = None


# ---------------------------------------------------------------- read


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated NetCDF file")
        self.pos += n
        return b

    def u32(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack(">Q", self.take(8))[0]

    def name(self) -> str:
        n = self.u32()
        s = self.take(n).decode("utf-8")
        pad = (4 - n % 4) % 4
        self.take(pad)
        return s

    def att_values(self) -> object:
        nc_type = self.u32()
        nelems = self.u32()
        dt, size = _TYPEMAP[nc_type]
        raw = self.take(nelems * size)
        pad = (4 - (nelems * size) % 4) % 4
        self.take(pad)
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt)
        if nelems == 1:
            return arr[0].item()
        return arr.copy()

    def att_list(self) -> dict[str, object]:
        tag = self.take(4)
        nelems = self.u32()
        if tag == _ZERO:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag {tag!r}")
        return {self.name(): self.att_values() for _ in range(nelems)}


def read_netcdf(path_or_bytes, header_only: bool = False) -> NCDataset:
    """Parse a classic NetCDF file into an :class:`NCDataset`.

    Accepts a filesystem path or raw ``bytes`` (the latter suits Spark's
    ``binaryFile`` datasource / ``sc.binaryFiles`` in executors).

    ``header_only=True`` skips materializing variable data (every
    ``NCVariable.data`` is ``None``): dims + attributes only, for
    admission probes (e.g. ``edgar_v8_categories``) that must not pay
    the array decode twice.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    if buf[:8] == b"\x89HDF\r\n\x1a\n":
        raise ValueError(
            "NetCDF-4/HDF5 container — only classic NetCDF-3 is supported "
            "without h5py; convert with `nccopy -k classic` upstream"
        )
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file (bad magic)")
    version = buf[3]
    r = _Reader(buf)
    r.take(4)
    numrecs = r.u32()
    streaming = numrecs == 0xFFFFFFFF

    ds = NCDataset()
    dim_names: list[str] = []
    tag = r.take(4)
    ndims = r.u32()
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            nm = r.name()
            ln = r.u32()
            dim_names.append(nm)
            ds.dims[nm] = ln
            if ln == 0:
                ds.record_dim = nm
    elif tag != _ZERO:
        raise ValueError(f"bad dimension-list tag {tag!r}")

    ds.attrs = r.att_list()

    tag = r.take(4)
    nvars = r.u32()
    var_meta = []
    if tag == _NC_VARIABLE:
        for _ in range(nvars):
            nm = r.name()
            nd = r.u32()
            dimids = [r.u32() for _ in range(nd)]
            vattrs = r.att_list()
            nc_type = r.u32()
            r.u32()  # vsize (may be inexact for >2GB; recompute instead)
            begin = r.u64() if version == 2 else r.u32()
            var_meta.append((nm, dimids, vattrs, nc_type, begin))
    elif tag != _ZERO:
        raise ValueError(f"bad variable-list tag {tag!r}")

    # record count: from header unless streaming, then infer from size
    rec_vars = [m for m in var_meta if m[1] and dim_names[m[1][0]] == ds.record_dim]
    if ds.record_dim is not None and streaming:
        numrecs = 0  # computed below from file length
    # one record's worth of bytes across all record variables (each
    # variable's per-record slab padded to 4, unless there is exactly
    # one record variable — spec special case: no padding then)
    recsize = 0
    per_var_slab = {}
    for nm, dimids, _va, nc_type, _b in rec_vars:
        _dt, size = _TYPEMAP[nc_type]
        n = 1
        for d in dimids[1:]:
            n *= ds.dims[dim_names[d]]
        slab = n * size
        if len(rec_vars) > 1:
            slab += (4 - slab % 4) % 4
        per_var_slab[nm] = slab
        recsize += slab
    if ds.record_dim is not None and streaming and recsize:
        first = min(m[4] for m in rec_vars)
        numrecs = (len(buf) - first) // recsize
    if ds.record_dim is not None:
        ds.dims[ds.record_dim] = numrecs

    for nm, dimids, vattrs, nc_type, begin in var_meta:
        dims = tuple(dim_names[d] for d in dimids)
        shape = tuple(ds.dims[d] for d in dims)
        dt, size = _TYPEMAP[nc_type]
        is_rec = bool(dims) and dims[0] == ds.record_dim
        if header_only:
            ds.variables[nm] = NCVariable(nm, dims, None, vattrs)
            continue
        if not is_rec:
            count = int(np.prod(shape, dtype=np.int64)) if shape else 1
            raw = buf[begin : begin + count * size]
            arr = np.frombuffer(raw, dtype=dt if nc_type != NC_CHAR else "S1")
            arr = arr.reshape(shape).copy()
        else:
            slab = per_var_slab[nm]
            inner = shape[1:]
            n_inner = int(np.prod(inner, dtype=np.int64)) if inner else 1
            out = np.empty((numrecs, n_inner), dtype=dt if nc_type != NC_CHAR else "S1")
            for rec in range(numrecs):
                off = begin + rec * recsize
                raw = buf[off : off + n_inner * size]
                out[rec] = np.frombuffer(raw, dtype=dt if nc_type != NC_CHAR else "S1")
            arr = out.reshape((numrecs,) + inner)
        if nc_type != NC_CHAR:
            arr = arr.astype(arr.dtype.newbyteorder("="))
        ds.variables[nm] = NCVariable(nm, dims, arr, vattrs)
    return ds


# --------------------------------------------------------------- write


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _w_name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _att_bytes(value: object) -> bytes:
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return struct.pack(">II", NC_CHAR, len(raw)) + _pad4(raw)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "f":
        arr = arr.astype(">f8")
        nc_type = NC_DOUBLE
    elif arr.dtype.kind in "iu":
        arr = arr.astype(">i4")
        nc_type = NC_INT
    else:
        raise TypeError(f"unsupported attribute type {arr.dtype}")
    return struct.pack(">II", nc_type, arr.size) + _pad4(arr.tobytes())


def _w_att_list(attrs: dict[str, object]) -> bytes:
    if not attrs:
        return _ZERO + _ZERO
    out = [_NC_ATTRIBUTE, struct.pack(">I", len(attrs))]
    for k, v in attrs.items():
        out.append(_w_name(k))
        out.append(_att_bytes(v))
    return b"".join(out)


def _convert_for_write(name: str, arr: np.ndarray) -> tuple[int, np.ndarray]:
    """Map a numpy array onto a classic NetCDF type, converting in place.

    Shared by the eager prepare pass and the lazy-slab stream pass so
    both enforce identical char/int64 rules.
    """
    if arr.dtype.kind == "S" or arr.dtype == np.dtype("S1"):
        if arr.dtype.itemsize > 1:
            raise TypeError(
                f"variable {name}: bytes dtype {arr.dtype} would be "
                "silently truncated to 1 char — split into an S1 char "
                "matrix along a string-length dimension first"
            )
        return NC_CHAR, arr.astype("S1")
    key = str(arr.dtype)
    if key not in _DTYPE_TO_NC:
        raise TypeError(f"unsupported variable dtype {arr.dtype} for {name}")
    nc_type = _DTYPE_TO_NC[key]
    if key == "int64" and arr.size and (
        arr.max() > 2**31 - 1 or arr.min() < -(2**31)
    ):
        # classic NetCDF has no 64-bit int; astype would wrap
        raise OverflowError(
            f"variable {name}: int64 values exceed NC_INT range "
            "(would wrap on write) — rescale or use float64"
        )
    dt, _ = _TYPEMAP[nc_type]
    return nc_type, arr.astype(dt)


def write_netcdf(path: str | None, ds: NCDataset) -> bytes | None:
    """Serialize an :class:`NCDataset` to classic NetCDF.

    ``path=None`` returns the bytes instead of writing (executor-side
    assembly in export pipelines).  The record dimension, if any, must
    be each record variable's *first* dimension, per the spec.

    Variables whose ``data`` is a :class:`LazySlab` are loaded one at a
    time while the data section streams to the output — the layout pass
    uses only their declared shape/dtype, so peak memory is bounded by
    the largest single variable, not the file.
    """
    dim_names = list(ds.dims)
    dim_index = {n: i for i, n in enumerate(dim_names)}
    var_list = list(ds.variables.values())

    # prepared: (v, nc_type, arr_or_None, shape); arr None = lazy slab
    prepared = []
    for v in var_list:
        d = v.data
        if isinstance(d, LazySlab):
            key = str(np.dtype(d.dtype))
            if key not in _DTYPE_TO_NC:
                raise TypeError(f"unsupported variable dtype {key} for {v.name}")
            prepared.append((v, _DTYPE_TO_NC[key], None, tuple(d.shape)))
            continue
        nc_type, arr = _convert_for_write(v.name, np.asarray(d))
        prepared.append((v, nc_type, arr, arr.shape))

    is_rec = {
        v.name: bool(v.dims) and v.dims[0] == ds.record_dim for v in var_list
    }
    rec_count = 0
    for v, _t, _a, shape in prepared:
        if is_rec[v.name]:
            rec_count = max(rec_count, shape[0])

    # layout pass: fixed vars first, then the record section
    def vsize_of(v, nc_type, shape):
        _, size = _TYPEMAP[nc_type]
        if is_rec[v.name]:
            n = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
        else:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        raw = n * size
        return raw + (4 - raw % 4) % 4, raw

    n_rec_vars = sum(1 for v in var_list if is_rec[v.name])

    # header assembly with placeholder offsets, then fix up
    def header(offsets: dict[str, int], version: int) -> bytes:
        out = [b"CDF", bytes([version]), struct.pack(">I", rec_count)]
        if ds.dims:
            out += [_NC_DIMENSION, struct.pack(">I", len(dim_names))]
            for n in dim_names:
                ln = 0 if n == ds.record_dim else ds.dims[n]
                out += [_w_name(n), struct.pack(">I", ln)]
        else:
            out += [_ZERO, _ZERO]
        out.append(_w_att_list(ds.attrs))
        if var_list:
            out += [_NC_VARIABLE, struct.pack(">I", len(var_list))]
            for v, nc_type, _arr, shape in prepared:
                out.append(_w_name(v.name))
                out.append(struct.pack(">I", len(v.dims)))
                for d in v.dims:
                    out.append(struct.pack(">I", dim_index[d]))
                out.append(_w_att_list(v.attrs))
                padded, _raw = vsize_of(v, nc_type, shape)
                out.append(struct.pack(">II", nc_type, min(padded, 0xFFFFFFFF)))
                if version == 2:
                    out.append(struct.pack(">Q", offsets[v.name]))
                else:
                    out.append(struct.pack(">I", offsets[v.name]))
        else:
            out += [_ZERO, _ZERO]
        return b"".join(out)

    for version in (1, 2):
        offsets = {v.name: 0 for v in var_list}
        hlen = len(header(offsets, version))
        pos = hlen
        for v, nc_type, _arr, shape in prepared:  # fixed vars, header order
            if not is_rec[v.name]:
                offsets[v.name] = pos
                padded, _ = vsize_of(v, nc_type, shape)
                pos += padded
        rec_begin = pos
        recsize = 0
        for v, nc_type, _arr, shape in prepared:
            if is_rec[v.name]:
                offsets[v.name] = rec_begin + recsize
                padded, raw = vsize_of(v, nc_type, shape)
                recsize += padded if n_rec_vars > 1 else raw
        end = rec_begin + recsize * rec_count
        if version == 1 and (end > 0x7FFFFFFF or any(o > 0x7FFFFFFF for o in offsets.values())):
            continue  # fall through to CDF-2
        break

    def materialize(v, nc_type, arr, shape):
        if arr is not None:
            return arr
        if v.data.load is not None:
            loaded = np.asarray(v.data.load())
        else:
            loaded = np.concatenate(
                [np.asarray(ld()) for ld in v.data.chunk_loaders], axis=0
            )
        got_type, conv = _convert_for_write(v.name, loaded)
        if got_type != nc_type or tuple(conv.shape) != tuple(shape):
            raise ValueError(
                f"variable {v.name}: lazy slab loaded as "
                f"{conv.dtype}{conv.shape}, declared "
                f"{np.dtype(v.data.dtype)}{tuple(shape)}"
            )
        return conv

    import io
    import os

    # stream to a temp sibling and rename at the end: a lazy loader
    # failing mid-stream must not leave a truncated file with a
    # valid-looking header at `path` (the pre-streaming writer built
    # the blob in memory and had this property implicitly)
    tmp_path = None
    if path is not None:
        tmp_path = path + ".tmp_write"
        out = open(tmp_path, "wb")
    else:
        out = io.BytesIO()
    ok = False
    try:
        out.write(header(offsets, version))
        # fixed section: vars are laid out sequentially in header order,
        # so a straight stream (data + alignment pad) reproduces the
        # offset layout byte-for-byte while holding one variable at most
        # (one CHUNK at most for chunked lazy slabs)
        for v, nc_type, arr, shape in prepared:
            if is_rec[v.name]:
                continue
            if arr is None and getattr(v.data, "chunk_loaders", None) is not None:
                _padded, raw_len = vsize_of(v, nc_type, shape)
                written = 0
                for ld in v.data.chunk_loaders:
                    got_type, conv = _convert_for_write(v.name, np.asarray(ld()))
                    if got_type != nc_type:
                        raise ValueError(
                            f"variable {v.name}: chunk dtype {conv.dtype} does "
                            f"not match declared {np.dtype(v.data.dtype)}"
                        )
                    raw = conv.tobytes()
                    out.write(raw)
                    written += len(raw)
                if written != raw_len:
                    raise ValueError(
                        f"variable {v.name}: chunks wrote {written} bytes, "
                        f"declared shape needs {raw_len}"
                    )
                out.write(b"\x00" * ((4 - written % 4) % 4))
                continue
            raw = materialize(v, nc_type, arr, shape).tobytes()
            out.write(raw)
            out.write(b"\x00" * ((4 - len(raw) % 4) % 4))
        # record section: interleaved per record; record vars are small
        # by construction (one record's worth each), so materialize them
        if n_rec_vars:
            rec_arrs = [
                (v, nc_type, materialize(v, nc_type, arr, shape), shape)
                for v, nc_type, arr, shape in prepared
                if is_rec[v.name]
            ]
            for rec in range(rec_count):
                for v, nc_type, arr, shape in rec_arrs:
                    padded, raw_len = vsize_of(v, nc_type, shape)
                    slot = padded if n_rec_vars > 1 else raw_len
                    if rec < arr.shape[0]:
                        flat = arr.reshape(arr.shape[0], -1) if arr.ndim > 0 else arr
                        raw = flat[rec].tobytes()
                        out.write(raw)
                        out.write(b"\x00" * (slot - len(raw)))
                    else:
                        # short record var: zero-fill, matching the
                        # previous zero-initialized body semantics
                        out.write(b"\x00" * slot)
        ok = True
        if path is None:
            return out.getvalue()
    finally:
        if path is not None:
            out.close()
            if ok:
                os.replace(tmp_path, path)
            else:
                try:
                    os.remove(tmp_path)
                except OSError:
                    pass
    return None
