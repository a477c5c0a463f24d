"""Minimal pure-numpy HDF5 / NetCDF-4 writer.

The complement of :mod:`emiproc_spark.functions.hdf5`: serializes an
:class:`~emiproc_spark.functions.netcdf3.NCDataset` into the OLD-style
HDF5 layout (superblock v0, v1 object headers, symbol-table root group,
contiguous little-endian datasets) — the format vanilla netcdf-c writes
by default, and deliberately the *other* layout than the reference's
NetCDF-4 samples (superblock v2 + dense links), so a write→read
round-trip exercises both paths of the reader.

NetCDF-4 conventions written:

- every dimension is a dataset tagged ``CLASS=DIMENSION_SCALE`` (pure
  dims get the placeholder ``NAME``);
- every variable carries a ``DIMENSION_LIST`` attribute of vlen object
  references (one global-heap collection), so dimension names resolve
  exactly, not by shape matching;
- variable attributes: scalar/1-D numerics and fixed strings.

Supported data: float32/64, int8/16/32/64, fixed bytes (``S#``).
"""

from __future__ import annotations

import struct

import numpy as np

from emiproc_spark.functions.netcdf3 import NCDataset

UNDEF = 0xFFFFFFFFFFFFFFFF
_DIM_PLACEHOLDER = (
    "This is a netCDF dimension but not a netCDF variable."
)


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _dt_message(arr: np.ndarray) -> bytes:
    dt = arr.dtype
    if dt.kind in ("i", "u"):
        cls_ver = 0x10  # version 1, class 0 fixed point
        bits0 = 0x08 if dt.kind == "i" else 0
        body = struct.pack(
            "<BBBBIHH", cls_ver, bits0, 0, 0, dt.itemsize, 0, dt.itemsize * 8
        )
    elif dt.kind == "f":
        # little-endian IEEE float: version 1 class 1; mantissa
        # normalization "implied MSB" (bits 0x20), sign location in the
        # second bit-field byte; properties = (bit offset, precision,
        # exp loc, exp size, mantissa loc, mantissa size, exp bias)
        if dt.itemsize == 8:
            body = struct.pack("<BBBBI", 0x11, 0x20, 0x3F, 0, 8) + struct.pack(
                "<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023
            )
        else:
            body = struct.pack("<BBBBI", 0x11, 0x20, 0x1F, 0, 4) + struct.pack(
                "<HHBBBBI", 0, 32, 23, 8, 0, 23, 127
            )
    elif dt.kind == "S":
        body = struct.pack("<BBBBI", 0x13, 0, 0, 0, dt.itemsize)
    else:
        raise ValueError(f"hdf5 writer: unsupported dtype {dt}")
    return body


def _dt_reference() -> bytes:
    return struct.pack("<BBBBI", 0x17, 0, 0, 0, 8)


def _dt_vlen_ref() -> bytes:
    # class 9 (vlen), type 0 (sequence); base type = object reference
    return struct.pack("<BBBBI", 0x19, 0, 0, 0, 16) + _dt_reference()


def _dataspace_message(shape: tuple[int, ...]) -> bytes:
    rank = len(shape)
    body = struct.pack("<BBBBI", 1, rank, 0, 0, 0)
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _layout_message(addr: int, size: int) -> bytes:
    return struct.pack("<BBQQ", 3, 1, addr, size)


def _attr_message(name: str, dt_msg: bytes, shape: tuple[int, ...], raw: bytes) -> bytes:
    nameb = name.encode() + b"\x00"
    sp_msg = _dataspace_message(shape)
    body = struct.pack("<BBHHH", 1, 0, len(nameb), len(dt_msg), len(sp_msg))
    body += _pad8(nameb) + _pad8(dt_msg) + _pad8(sp_msg) + raw
    return body


def _encode_attr_value(value) -> tuple[bytes, tuple[int, ...], bytes]:
    """value → (datatype message, shape, raw bytes)."""
    if isinstance(value, str):
        b = value.encode() + b"\x00"
        return struct.pack("<BBBBI", 0x13, 0, 0, 0, len(b)), (), b
    arr = np.asarray(value)
    if arr.dtype.kind == "U":
        ml = max(len(s.encode()) + 1 for s in arr.ravel())
        raw = b"".join(s.encode().ljust(ml, b"\x00") for s in arr.ravel())
        return struct.pack("<BBBBI", 0x13, 0, 0, 0, ml), arr.shape, raw
    if arr.dtype.kind in ("i", "u", "f"):
        arr = arr.astype(arr.dtype.newbyteorder("<"))
        return _dt_message(arr), (() if arr.ndim == 0 else arr.shape), arr.tobytes()
    raise ValueError(f"hdf5 writer: unsupported attribute type {arr.dtype}")


class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def reserve(self, n: int) -> int:
        addr = len(self.buf)
        self.buf += b"\x00" * n
        return addr

    def append(self, b: bytes) -> int:
        addr = len(self.buf)
        self.buf += b
        return addr

    def patch(self, addr: int, b: bytes) -> None:
        self.buf[addr : addr + len(b)] = b


def _object_header_v1(messages: list[tuple[int, bytes]]) -> bytes:
    """Serialize a v1 object header (single block, 8-byte aligned)."""
    body = b""
    for mtype, mbody in messages:
        mbody = _pad8(mbody)
        body += struct.pack("<HHBBBB", mtype, len(mbody), 0, 0, 0, 0) + mbody
    hdr = struct.pack("<BBHII", 1, 0, len(messages), 1, len(body))
    return hdr + b"\x00" * 4 + body


def write_netcdf4(path: str | None, ds: NCDataset) -> bytes | None:
    """Serialize ``ds`` as a NetCDF-4-compatible HDF5 file.

    ``path=None`` returns the bytes (for executor-side assembly).
    """
    w = _Writer()
    # superblock v0: 24 bytes + 4x8 addresses + 40-byte root entry,
    # patched at the end once the root header address is known
    sb_addr = w.reserve(24 + 32 + 40)

    # ---------------------------------------------------------- data
    var_order = list(ds.dims) + [
        n for n in ds.variables if n not in ds.dims
    ]
    # dimension datasets that have no variable data get placeholder zeros
    arrays: dict[str, np.ndarray] = {}
    for name in var_order:
        if name in ds.variables:
            arr = np.asarray(ds.variables[name].data)
            if arr.dtype.kind in ("i", "u", "f"):
                arr = arr.astype(arr.dtype.newbyteorder("<"))
            if arr.ndim:  # ascontiguousarray would promote 0-d to 1-d
                arr = np.ascontiguousarray(arr)
        else:
            arr = np.zeros(ds.dims[name], dtype="<f4")
        arrays[name] = arr
    data_addr = {
        name: w.append(arrays[name].tobytes()) for name in var_order
    }

    # ----------------------------------------------- dimension refs
    # two-pass header emission: pass 1 writes headers with a zeroed
    # DIMENSION_LIST so their addresses are known, the global heap is
    # appended, then pass 2 patches each header in place (same size)
    # with the real heap ids.
    header_addr: dict[str, int] = {}

    # pass 1: build headers WITHOUT DIMENSION_LIST to learn sizes, then
    # rebuild with the real global-heap ids.  Header sizes must not
    # change between passes, so reserve the vlen attr in both.
    gheap_addr_holder = {"addr": 0}

    def build_header(name: str, with_refs: bool) -> bytes:
        arr = arrays[name]
        msgs: list[tuple[int, bytes]] = [
            (0x0001, _dataspace_message(arr.shape)),
            (0x0003, _dt_message(arr)),
            (0x0008, _layout_message(data_addr[name], arr.nbytes)),
        ]
        if name in ds.dims:
            msgs.append(
                (0x000C, _attr_message("CLASS", *_encode_attr_value("DIMENSION_SCALE")))
            )
            if name not in ds.variables:
                msgs.append(
                    (0x000C, _attr_message("NAME", *_encode_attr_value(_DIM_PLACEHOLDER)))
                )
        var = ds.variables.get(name)
        if var is not None:
            for k, v in var.attrs.items():
                dt_msg, shape, raw = _encode_attr_value(v)
                msgs.append((0x000C, _attr_message(k, dt_msg, shape, raw)))
            if var.dims and name not in ds.dims:
                n = len(var.dims)
                if with_refs:
                    raw = b""
                    for i in range(n):
                        raw += struct.pack(
                            "<IQI", 1, gheap_addr_holder["addr"], i + 1 + ref_base[name]
                        )
                else:
                    raw = b"\x00" * (16 * n)
                msgs.append(
                    (0x000C, _attr_message("DIMENSION_LIST", _dt_vlen_ref(), (n,), raw))
                )
        return _object_header_v1(msgs)

    # global-heap object index bookkeeping for DIMENSION_LIST entries
    ref_base: dict[str, int] = {}
    nrefs = 0
    for name in var_order:
        var = ds.variables.get(name)
        if var is not None and var.dims and name not in ds.dims:
            ref_base[name] = nrefs
            nrefs += len(var.dims)

    for name in var_order:
        header_addr[name] = w.append(build_header(name, with_refs=False))

    # ------------------------------------------------- global heap
    if nrefs:
        objs = []
        for name in var_order:
            var = ds.variables.get(name)
            if var is not None and var.dims and name not in ds.dims:
                for d in var.dims:
                    objs.append(struct.pack("<Q", header_addr[d]))
        heap_body = b""
        for i, payload in enumerate(objs, start=1):
            heap_body += struct.pack("<HHIQ", i, 0, 0, len(payload)) + _pad8(payload)
        total = 16 + len(heap_body) + 16
        gaddr = w.append(
            b"GCOL" + struct.pack("<BBH", 1, 0, 0) + struct.pack("<Q", total)
            + heap_body
            + b"\x00" * 16
        )
        gheap_addr_holder["addr"] = gaddr
        # rebuild headers with real refs (same size) and patch in place
        for name in var_order:
            hdr = build_header(name, with_refs=True)
            w.patch(header_addr[name], hdr)

    # ------------------------------------------------- group tree
    # variable names may be "a/b/c" paths (the reader's nested-group
    # prefix convention, e.g. GFED4's emissions/MM/partitioning/...);
    # build each group as a symbol-table (local heap + SNOD + B-tree v1)
    def write_group(links: dict[str, int], attrs: dict | None = None) -> int:
        name_off: dict[str, int] = {}
        heap_data = bytearray(b"\x00" * 8)  # offset 0: empty string slot
        for name in links:
            name_off[name] = len(heap_data)
            heap_data += _pad8(name.encode() + b"\x00")
        heap_data_addr = w.append(bytes(heap_data))
        # free-list head 1 = H5HL_FREE_NULL (no free blocks); 0 would
        # declare a free block at heap offset 0 and break libhdf5 readers
        heap_addr = w.append(
            b"HEAP"
            + struct.pack("<BBH", 0, 0, 0)
            + struct.pack("<QQQ", len(heap_data), 1, heap_data_addr)
        )
        if links:
            sorted_names = sorted(links)
            snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(sorted_names))
            for name in sorted_names:
                snod += struct.pack(
                    "<QQII", name_off[name], links[name], 0, 0
                ) + b"\x00" * 16
            snod_addr = w.append(snod)
            btree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
            btree += struct.pack("<QQ", UNDEF, UNDEF)  # siblings
            btree += struct.pack("<Q", 0)  # key 0: empty-string offset
            btree += struct.pack("<Q", snod_addr)
            btree += struct.pack("<Q", name_off[sorted_names[-1]])  # key 1
            btree_addr = w.append(btree)
        else:
            # empty group (attrs-only dataset): undefined B-tree — the
            # reader's symbol-table walk treats it as "no links"
            btree_addr = UNDEF
        msgs = [(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
        for k, v in (attrs or {}).items():
            dt_msg, shape, raw = _encode_attr_value(v)
            msgs.append((0x000C, _attr_message(k, dt_msg, shape, raw)))
        return w.append(_object_header_v1(msgs))

    # nested dict: leaf name -> dataset addr, subgroup name -> dict
    tree: dict = {}
    for name in var_order:
        parts = name.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"hdf5 writer: {name!r} nests under a dataset")
        if isinstance(node.get(parts[-1]), dict):
            raise ValueError(
                f"hdf5 writer: {name!r} collides with a group of the same "
                "name — a path cannot be both a dataset and a group"
            )
        node[parts[-1]] = header_addr[name]

    def emit(node: dict, attrs: dict | None = None) -> int:
        links = {
            k: (emit(v) if isinstance(v, dict) else v) for k, v in node.items()
        }
        return write_group(links, attrs)

    root_addr = emit(tree, ds.attrs or {})

    # ------------------------------------------------- superblock
    sb = b"\x89HDF\r\n\x1a\n"
    sb += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
    sb += struct.pack("<HHI", 4, 16, 0)  # leaf k, internal k, flags
    sb += struct.pack("<QQQQ", 0, UNDEF, len(w.buf), UNDEF)
    # root symbol table entry: name offset 0, header addr, no cache
    sb += struct.pack("<QQII", 0, root_addr, 0, 0) + b"\x00" * 16
    w.patch(sb_addr, sb)

    out = bytes(w.buf)
    if path is None:
        return out
    with open(path, "wb") as f:
        f.write(out)
    return None
