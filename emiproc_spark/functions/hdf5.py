"""Minimal pure-numpy HDF5 / NetCDF-4 reader.

Implements the subset of the public HDF5 File Format Specification
(v3.0) that netcdf-c and h5py write for ordinary NetCDF-4 data files —
enough to ingest EDGAR/TNO/CAMS/GFED distributions where the optional
``h5py`` is absent (reference reads these via xarray/netCDF4,
emiproc/inventories/netcdf_raster.py:112-295, tno.py, gfed.py):

- superblock v0/v1 (symbol-table root) and v2/v3 (root header address);
- object headers v1 (unsigned) and v2 (``OHDR``/``OCHK`` blocks);
- groups as old-style symbol tables (B-tree v1 + local heap + ``SNOD``)
  and as compact link messages; dense (fractal-heap) links raise;
- dataset layouts: compact, contiguous, chunked v3 (B-tree v1 index)
  with deflate / shuffle / fletcher32 filters;
- datatypes: fixed-point, IEEE float, fixed strings, vlen strings
  (global heap ``GCOL``), object references, vlen sequences of
  references (for ``DIMENSION_LIST``);
- attributes (message v1/v3), including the netCDF-4 dimension-scale
  convention, which is mapped back to named dimensions.

The result is the same :class:`~emiproc_spark.functions.netcdf3.NCDataset`
shape the classic codec produces, so every downstream consumer
(``sources/netcdf.py`` rasters, TNO/GFED scans) works unchanged.

Not implemented (raises with a clear message): fractal-heap dense
groups/attributes, compound/enum/array datatypes, chunked layout v4
indexes, szip/nbit filters, external files.  These do not occur in
ordinary NetCDF-4 data files.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from emiproc_spark.functions.netcdf3 import NCDataset, NCVariable

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEFINED = 0xFFFFFFFFFFFFFFFF


class HDF5Error(ValueError):
    pass


class HDF5UnsupportedDatatype(HDF5Error):
    """A datatype class the minimal reader does not decode (compound,
    enum, …).  Separated from :class:`HDF5Error` so the attribute
    handler can drop only these, not e.g. version-mismatch failures."""


# netCDF-4 bookkeeping attributes: losing one silently mislabels
# dimensions (extent-matched / phony fallback), so never drop them.
# REFERENCE_LIST is deliberately absent: it is a compound-typed
# BACK-pointer (dim → datasets) the dimension resolution never reads,
# and real netcdf-c files carry it on every dimension variable.
_NC4_BOOKKEEPING = frozenset(
    {"DIMENSION_LIST", "CLASS", "NAME", "_Netcdf4Dimid", "_Netcdf4Coordinates"}
)


def _unsupported(what: str) -> HDF5Error:
    return HDF5Error(
        f"hdf5 codec: {what} is not supported by the minimal reader; "
        "install h5py for full-format files"
    )


# ---------------------------------------------------------------- messages
@dataclass
class _Dataspace:
    shape: tuple[int, ...] = ()


@dataclass
class _Datatype:
    cls: int = 0
    size: int = 0
    signed: bool = True
    order: str = "<"
    is_vlen_string: bool = False
    is_vlen_ref: bool = False
    strpad: int = 0


@dataclass
class _Layout:
    kind: str = "contiguous"  # compact | contiguous | chunked
    address: int = UNDEFINED
    size: int = 0
    chunk_shape: tuple[int, ...] = ()
    btree: int = UNDEFINED
    compact: bytes = b""


@dataclass
class _Obj:
    """Parsed object header: a group or a dataset."""

    addr: int = 0
    links: dict[str, int] = field(default_factory=dict)  # name -> header addr
    symtab: tuple[int, int] | None = None  # (btree addr, heap addr)
    attrs: dict[str, object] = field(default_factory=dict)
    dataspace: _Dataspace | None = None
    datatype: _Datatype | None = None
    layout: _Layout | None = None
    filters: list[tuple[int, tuple[int, ...]]] = field(default_factory=list)

    @property
    def is_dataset(self) -> bool:
        return self.layout is not None


class _Reader:
    def __init__(self, data: bytes):
        # Userblock support: the signature may sit at any power-of-two
        # offset >= 512; stored file addresses are then relative to that
        # base — slicing re-bases them so every absolute dereference in
        # the parser stays correct.  A signature at a non-conforming
        # offset is content coincidence, not a userblock.
        off = 0
        while data[off : off + 8] != SIGNATURE:
            off = 512 if off == 0 else off * 2
            if off + 8 > len(data):
                raise HDF5Error("not an HDF5 file (signature missing)")
        self.data = data[off:] if off else data
        self.base = off
        if len(self.data) < 56:
            raise HDF5Error("truncated HDF5 file (shorter than a superblock)")
        sb = self.data
        self.sb_version = sb[8]
        if self.sb_version in (0, 1):
            if sb[13] != 8 or sb[14] != 8:
                raise _unsupported("non-8-byte offsets/lengths")
            # root group symbol-table entry at fixed position
            pos = 24 if self.sb_version == 0 else 28
            # v1 adds 2+2 bytes (indexed storage internal node k + reserved)
            if self.sb_version == 1:
                pos = 24 + 4
            # skip base addr, free space, EOF, driver info (4 x 8)
            entry = sb[pos + 32 :]
            self.root_addr = struct.unpack_from("<Q", entry, 8)[0]
        elif self.sb_version in (2, 3):
            if sb[9] != 8 or sb[10] != 8:
                raise _unsupported("non-8-byte offsets/lengths")
            _base, _ext, _eof, root = struct.unpack_from("<QQQQ", sb, 12)
            self.root_addr = root
        else:
            raise _unsupported(f"superblock version {self.sb_version}")
        self.objects: dict[int, _Obj] = {}

    # ---------------------------------------------------------- plumbing
    def u(self, fmt: str, pos: int):
        return struct.unpack_from("<" + fmt, self.data, pos)

    # ---------------------------------------------------------- object headers
    def obj(self, addr: int) -> _Obj:
        if addr in self.objects:
            return self.objects[addr]
        o = _Obj(addr=addr)
        self.objects[addr] = o
        if self.data[addr : addr + 4] == b"OHDR":
            self._parse_v2_header(addr, o)
        else:
            self._parse_v1_header(addr, o)
        return o

    def _parse_v1_header(self, addr: int, o: _Obj) -> None:
        version, _, nmsg, _refcnt, hdr_size = self.u("BBHII", addr)
        if version != 1:
            raise _unsupported(f"object header version {version} at {addr}")
        # v1 header body starts 8-byte aligned after the 12-byte prefix
        # (4 bytes padding)
        blocks = [(addr + 16, hdr_size)]
        seen = 0
        while blocks and seen < nmsg:
            bpos, bsize = blocks.pop(0)
            pos, end = bpos, bpos + bsize
            while pos + 8 <= end and seen < nmsg:
                mtype, msize, _mflags = self.u("HHB", pos)
                pos += 8
                body = self.data[pos : pos + msize]
                if mtype == 0x0010:
                    caddr, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((caddr, clen))
                else:
                    self._message(mtype, body, o)
                pos += msize
                seen += 1

    def _parse_v2_header(self, addr: int, o: _Obj) -> None:
        flags = self.data[addr + 5]
        pos = addr + 6
        if flags & 0x20:
            pos += 16
        if flags & 0x10:
            pos += 4
        size_bytes = 1 << (flags & 0x3)
        chunk0 = int.from_bytes(self.data[pos : pos + size_bytes], "little")
        pos += size_bytes
        track = bool(flags & 0x04)
        blocks = [(pos, chunk0)]
        while blocks:
            bpos, bsize = blocks.pop(0)
            pos, end = bpos, bpos + bsize
            # each block ends with a 4-byte checksum; OCHK blocks carry a
            # 4-byte signature handled by the continuation parser below
            while pos + 4 <= end:
                mtype = self.data[pos]
                msize = int.from_bytes(self.data[pos + 1 : pos + 3], "little")
                pos += 4
                if track:
                    pos += 2
                body = self.data[pos : pos + msize]
                if mtype == 0x10:
                    caddr, clen = struct.unpack_from("<QQ", body, 0)
                    if self.data[caddr : caddr + 4] != b"OCHK":
                        raise HDF5Error("bad continuation block signature")
                    # content excludes the OCHK signature and checksum
                    blocks.append((caddr + 4, clen - 8))
                else:
                    self._message(mtype, body, o)
                pos += msize

    # ---------------------------------------------------------- messages
    def _message(self, mtype: int, body: bytes, o: _Obj) -> None:
        if mtype == 0x0000:
            return
        if mtype == 0x0001:
            o.dataspace = self._dataspace(body)
        elif mtype == 0x0002:  # link info
            pos = 2 + (8 if body[1] & 1 else 0)
            heap, btree = struct.unpack_from("<QQ", body, pos)
            if heap != UNDEFINED:
                # dense links: messages live in a fractal heap indexed
                # by a name B-tree v2 (netcdf-c switches to this beyond
                # 8 links when tracking creation order)
                for payload in self._btree2_heap_records(btree, heap):
                    self._link(payload, o)
        elif mtype == 0x0003:
            o.datatype = self._datatype(body)
        elif mtype == 0x0006:
            self._link(body, o)
        elif mtype == 0x0008:
            o.layout = self._layout(body)
        elif mtype == 0x000B:
            o.filters = self._filters(body)
        elif mtype == 0x000C:
            try:
                name, value = self._attribute(body)
            except HDF5UnsupportedDatatype as e:
                # exotic attribute datatype (compound/enum/…): drop the
                # attribute rather than fail the file — but never a
                # netCDF-4 bookkeeping attribute (DIMENSION_LIST/CLASS/…)
                # whose silent loss would mislabel same-size dimensions,
                # and never a version-mismatch (not this exception type)
                if getattr(e, "attr_name", None) in _NC4_BOOKKEEPING:
                    raise
                return
            o.attrs[name] = value
        elif mtype == 0x0011:
            btree, heap = struct.unpack_from("<QQ", body, 0)
            o.symtab = (btree, heap)
        elif mtype == 0x0015:  # attribute info
            pass  # compact attributes still arrive as 0x000C messages
        # fill value (0x0004/0x0005), group info, mtimes, comments: ignored

    def _dataspace(self, body: bytes) -> _Dataspace:
        version = body[0]
        rank = body[1]
        if version == 1:
            flags = body[2]
            pos = 8
        elif version == 2:
            flags = body[2]
            pos = 4
        else:
            raise _unsupported(f"dataspace version {version}")
        dims = struct.unpack_from("<" + "Q" * rank, body, pos)
        return _Dataspace(shape=tuple(int(d) for d in dims))

    def _datatype(self, body: bytes) -> _Datatype:
        cls_ver = body[0]
        cls = cls_ver & 0x0F
        bits0, bits8, bits16 = body[1], body[2], body[3]
        size = struct.unpack_from("<I", body, 4)[0]
        dt = _Datatype(cls=cls, size=size)
        if cls == 0:  # fixed point
            dt.order = ">" if (bits0 & 1) else "<"
            dt.signed = bool(bits0 & 0x08)
        elif cls == 1:  # float
            dt.order = ">" if (bits0 & 1) else "<"
        elif cls == 3:  # string
            dt.strpad = bits0 & 0x0F
        elif cls == 7:  # reference
            pass
        elif cls == 9:  # variable length
            vtype = bits0 & 0x0F
            base = self._datatype(body[8:])
            if vtype == 1:
                dt.is_vlen_string = True
            elif base.cls == 7:
                dt.is_vlen_ref = True
            else:
                raise HDF5UnsupportedDatatype(
                    str(_unsupported("vlen of non-reference non-string"))
                )
        else:
            raise HDF5UnsupportedDatatype(str(_unsupported(f"datatype class {cls}")))
        return dt

    def _layout(self, body: bytes) -> _Layout:
        version = body[0]
        if version != 3:
            raise _unsupported(f"data layout version {version}")
        kind = body[1]
        lay = _Layout()
        if kind == 0:
            lay.kind = "compact"
            n = struct.unpack_from("<H", body, 2)[0]
            lay.compact = body[4 : 4 + n]
        elif kind == 1:
            lay.kind = "contiguous"
            lay.address, lay.size = struct.unpack_from("<QQ", body, 2)
        elif kind == 2:
            lay.kind = "chunked"
            rank = body[2]
            lay.btree = struct.unpack_from("<Q", body, 3)[0]
            dims = struct.unpack_from("<" + "I" * rank, body, 11)
            # last entry is the element size; chunk shape excludes it
            lay.chunk_shape = tuple(int(d) for d in dims[:-1])
        else:
            raise _unsupported(f"chunked layout v4 / layout class {kind}")
        return lay

    def _filters(self, body: bytes) -> list[tuple[int, tuple[int, ...]]]:
        version = body[0]
        nfilters = body[1]
        out = []
        if version == 1:
            pos = 8
        elif version == 2:
            pos = 2
        else:
            raise _unsupported(f"filter pipeline version {version}")
        for _ in range(nfilters):
            fid = struct.unpack_from("<H", body, pos)[0]
            if version == 1 or fid >= 256:
                name_len = struct.unpack_from("<H", body, pos + 2)[0]
                if version == 1 and name_len % 8:
                    name_len += 8 - name_len % 8
                flags_, ncd = struct.unpack_from("<HH", body, pos + 4)
                pos += 8 + name_len
            else:
                # v2, id < 256: no name length / name fields at all
                flags_, ncd = struct.unpack_from("<HH", body, pos + 2)
                pos += 6
            cd = struct.unpack_from("<" + "I" * ncd, body, pos)
            pos += 4 * ncd
            if version == 1 and ncd % 2 == 1:
                pos += 4  # padding
            out.append((fid, tuple(int(c) for c in cd)))
        return out

    def _link(self, body: bytes, o: _Obj) -> None:
        version, flags = body[0], body[1]
        if version != 1:
            raise _unsupported(f"link message version {version}")
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[pos]
            pos += 1
        if flags & 0x04:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # charset
        len_size = 1 << (flags & 0x3)
        name_len = int.from_bytes(body[pos : pos + len_size], "little")
        pos += len_size
        name = body[pos : pos + name_len].decode("utf-8")
        pos += name_len
        if ltype == 0:
            o.links[name] = struct.unpack_from("<Q", body, pos)[0]
        # soft/external links ignored

    def _attribute(self, body: bytes):
        version = body[0]
        if version == 1:
            name_size, dt_size, sp_size = struct.unpack_from("<HHH", body, 2)
            pos = 8
            pad = lambda n: (n + 7) & ~7  # noqa: E731
            name = body[pos : pos + name_size].split(b"\x00")[0].decode()
            pos += pad(name_size)
            try:
                dt = self._datatype(body[pos : pos + dt_size])
            except HDF5UnsupportedDatatype as e:
                e.attr_name = name
                raise
            pos += pad(dt_size)
            sp = self._dataspace(body[pos : pos + sp_size])
            pos += pad(sp_size)
        elif version == 3:
            name_size, dt_size, sp_size = struct.unpack_from("<HHH", body, 2)
            pos = 9  # +1 name charset
            name = body[pos : pos + name_size].split(b"\x00")[0].decode()
            pos += name_size
            try:
                dt = self._datatype(body[pos : pos + dt_size])
            except HDF5UnsupportedDatatype as e:
                e.attr_name = name
                raise
            pos += dt_size
            sp = self._dataspace(body[pos : pos + sp_size])
            pos += sp_size
        else:
            raise _unsupported(f"attribute message version {version}")
        raw = body[pos:]
        return name, self._decode_values(raw, dt, sp.shape)

    # ---------------------------------------------------------- values
    def _decode_values(self, raw: bytes, dt: _Datatype, shape: tuple[int, ...]):
        n = int(np.prod(shape)) if shape else 1
        if dt.is_vlen_string:
            out = [self._vlen_bytes(raw, i, 1).decode("utf-8", "replace") for i in range(n)]
            return out[0] if not shape else out
        if dt.is_vlen_ref:
            seqs = []
            for i in range(n):
                payload = self._vlen_bytes(raw, i, 8)
                seqs.append(list(np.frombuffer(payload, dtype="<u8")))
            return seqs[0] if not shape else seqs
        if dt.cls == 3:
            vals = [
                raw[i * dt.size : (i + 1) * dt.size].split(b"\x00")[0].decode(
                    "utf-8", "replace"
                )
                for i in range(n)
            ]
            return vals[0] if not shape else vals
        if dt.cls == 7:
            refs = list(np.frombuffer(raw[: 8 * n], dtype="<u8"))
            return refs[0] if not shape else refs
        arr = np.frombuffer(raw[: n * dt.size], dtype=self._np_dtype(dt)).reshape(
            shape or ()
        )
        return arr.item() if not shape else arr

    def _vlen_bytes(self, raw: bytes, i: int, elem_size: int) -> bytes:
        """Global-heap vlen element i of a 16-byte-stride vlen array.
        The descriptor's length counts ELEMENTS of the sequence."""
        length, gaddr, gindex = struct.unpack_from("<IQI", raw, 16 * i)
        return self._global_heap(gaddr, gindex)[: length * elem_size]

    def _global_heap(self, addr: int, index: int) -> bytes:
        if self.data[addr : addr + 4] != b"GCOL":
            raise HDF5Error("bad global heap signature")
        size = struct.unpack_from("<Q", self.data, addr + 8)[0]
        pos, end = addr + 16, addr + size
        while pos + 16 <= end:
            idx, _refs, _, osize = struct.unpack_from("<HHIQ", self.data, pos)
            if idx == 0:
                break
            if idx == index:
                return self.data[pos + 16 : pos + 16 + osize]
            pos += 16 + ((osize + 7) & ~7)
        raise HDF5Error(f"global heap object {index} not found at {addr}")

    def _np_dtype(self, dt: _Datatype) -> np.dtype:
        if dt.cls == 0:
            kind = "i" if dt.signed else "u"
            return np.dtype(f"{dt.order}{kind}{dt.size}")
        if dt.cls == 1:
            return np.dtype(f"{dt.order}f{dt.size}")
        raise _unsupported(f"dataset datatype class {dt.cls}")

    # ------------------------------------------------- dense link storage
    def _fractal_heap(self, addr: int):
        """Parse a fractal heap header; return a resolver heap_id -> bytes."""
        d = self.data
        if d[addr : addr + 4] != b"FRHP":
            raise HDF5Error("bad fractal heap signature")
        pos = addr + 5
        _id_len, filt_len = struct.unpack_from("<HH", d, pos)
        flags = d[pos + 4]
        max_managed = struct.unpack_from("<I", d, pos + 5)[0]
        pos += 9
        pos += 8 * 12  # huge/free/managed-space bookkeeping (12 x 8 bytes)
        table_width = struct.unpack_from("<H", d, pos)[0]
        start_block, max_direct = struct.unpack_from("<QQ", d, pos + 2)
        max_heap_bits, _start_rows = struct.unpack_from("<HH", d, pos + 18)
        root_addr = struct.unpack_from("<Q", d, pos + 22)[0]
        cur_rows = struct.unpack_from("<H", d, pos + 30)[0]
        if filt_len:
            raise _unsupported("filtered fractal heap")
        offset_size = (max_heap_bits + 7) // 8
        length_size = max(1, (max_managed.bit_length() + 7) // 8)
        checksummed = bool(flags & 0x02)

        # map heap linear space -> file positions via the direct blocks
        blocks: list[tuple[int, int, int]] = []  # (heap_off, file_addr, size)

        def add_direct(baddr: int, size: int) -> None:
            if baddr == UNDEFINED:
                return
            if d[baddr : baddr + 4] != b"FHDB":
                raise HDF5Error("bad fractal heap direct block")
            boff = int.from_bytes(d[baddr + 13 : baddr + 13 + offset_size], "little")
            blocks.append((boff, baddr, size))

        if cur_rows == 0:
            add_direct(root_addr, start_block)
        else:
            if d[root_addr : root_addr + 4] != b"FHIB":
                raise HDF5Error("bad fractal heap indirect block")
            pos = root_addr + 13 + offset_size
            for row in range(cur_rows):
                size = start_block if row <= 1 else start_block << (row - 1)
                if size > max_direct:
                    raise _unsupported("multi-level fractal heap")
                for _ in range(table_width):
                    child = struct.unpack_from("<Q", d, pos)[0]
                    add_direct(child, size)
                    pos += 8

        def resolve(heap_id: bytes) -> bytes:
            idflags = heap_id[0]
            if (idflags >> 4) & 0x3 != 0:
                raise _unsupported("huge/tiny fractal heap object")
            off = int.from_bytes(heap_id[1 : 1 + offset_size], "little")
            ln = int.from_bytes(
                heap_id[1 + offset_size : 1 + offset_size + length_size], "little"
            )
            for boff, baddr, size in blocks:
                if boff <= off < boff + size:
                    return d[baddr + (off - boff) : baddr + (off - boff) + ln]
            raise HDF5Error("fractal heap object offset out of range")

        return resolve, checksummed

    def _btree2_heap_records(self, btree_addr: int, heap_addr: int):
        """Yield heap payloads for every record of a v2 B-tree whose
        records end in a fractal-heap ID (link/attr name indexes)."""
        d = self.data
        resolve, _ = self._fractal_heap(heap_addr)
        if btree_addr == UNDEFINED:
            return
        if d[btree_addr : btree_addr + 4] != b"BTHD":
            raise HDF5Error("bad v2 B-tree signature")
        _ver, rtype = d[btree_addr + 4], d[btree_addr + 5]
        node_size, rec_size, depth = struct.unpack_from("<IHH", d, btree_addr + 6)
        root_addr, root_nrec = struct.unpack_from("<QH", d, btree_addr + 16)
        if depth != 0:
            raise _unsupported("multi-level v2 B-tree")
        if root_addr == UNDEFINED or root_nrec == 0:
            return
        if d[root_addr : root_addr + 4] != b"BTLF":
            raise HDF5Error("bad v2 B-tree leaf signature")
        pos = root_addr + 6
        for _ in range(root_nrec):
            rec = d[pos : pos + rec_size]
            if rtype in (5, 6):  # link name / creation order index
                heap_id = rec[4:] if rtype == 5 else rec[8:]
                yield resolve(heap_id)
            else:
                raise _unsupported(f"v2 B-tree record type {rtype}")
            pos += rec_size

    # ---------------------------------------------------------- group walk
    def group_links(self, o: _Obj) -> dict[str, int]:
        links = dict(o.links)
        if o.symtab is not None:
            btree, heap = o.symtab
            links.update(self._symbol_table_links(btree, heap))
        return links

    def _local_heap_str(self, heap_addr: int, offset: int) -> str:
        if self.data[heap_addr : heap_addr + 4] != b"HEAP":
            raise HDF5Error("bad local heap signature")
        data_addr = struct.unpack_from("<Q", self.data, heap_addr + 24)[0]
        s = self.data[data_addr + offset :]
        return s.split(b"\x00")[0].decode("utf-8")

    def _symbol_table_links(self, btree_addr: int, heap_addr: int) -> dict[str, int]:
        out: dict[str, int] = {}
        if btree_addr == UNDEFINED:
            return out
        stack = [btree_addr]
        while stack:
            addr = stack.pop()
            sig = self.data[addr : addr + 4]
            if sig == b"TREE":
                level, nentries = struct.unpack_from("<BH", self.data, addr + 5)
                pos = addr + 24 + 8  # skip siblings + first key
                for _ in range(nentries):
                    child = struct.unpack_from("<Q", self.data, pos)[0]
                    stack.append(child)
                    pos += 16  # child + next key
            elif sig == b"SNOD":
                nsyms = struct.unpack_from("<H", self.data, addr + 6)[0]
                pos = addr + 8
                for _ in range(nsyms):
                    name_off, obj_addr = struct.unpack_from("<QQ", self.data, pos)
                    out[self._local_heap_str(heap_addr, name_off)] = obj_addr
                    pos += 40
            else:
                raise HDF5Error(f"unexpected node {sig!r} in symbol table")
        return out

    # ---------------------------------------------------------- dataset read
    def read_dataset(self, o: _Obj) -> np.ndarray:
        assert o.layout is not None and o.datatype is not None
        shape = o.dataspace.shape if o.dataspace else ()
        dt = o.datatype
        if dt.is_vlen_string:
            raw = self._raw_data(o)
            n = int(np.prod(shape)) if shape else 1
            vals = [
                self._vlen_bytes(raw, i, 1).decode("utf-8", "replace")
                for i in range(n)
            ]
            return np.array(vals, dtype=object).reshape(shape or ())
        npdt = (
            np.dtype(f"S{dt.size}") if dt.cls == 3 else self._np_dtype(dt)
        )
        if o.layout.kind == "chunked":
            return self._read_chunked(o, npdt)
        raw = self._raw_data(o)
        n = int(np.prod(shape)) if shape else 1
        if len(raw) < n * npdt.itemsize:
            # unallocated contiguous data: fill with zeros
            arr = np.zeros(n, dtype=npdt)
        else:
            arr = np.frombuffer(raw[: n * npdt.itemsize], dtype=npdt)
        return arr.reshape(shape or ())

    def _raw_data(self, o: _Obj) -> bytes:
        lay = o.layout
        if lay.kind == "compact":
            return lay.compact
        if lay.kind == "contiguous":
            if lay.address == UNDEFINED:
                return b""
            return self.data[lay.address : lay.address + lay.size]
        raise HDF5Error("chunked layout has no single raw buffer")

    def _apply_filters(self, raw: bytes, filters, itemsize: int, mask: int) -> bytes:
        for pos, (fid, cd) in enumerate(reversed(filters)):
            if mask & (1 << (len(filters) - 1 - pos)):
                continue
            if fid == 1:
                raw = zlib.decompress(raw)
            elif fid == 2:
                sz = cd[0] if cd else itemsize
                arr = np.frombuffer(raw, dtype="u1")
                n = len(raw) // sz
                raw = (
                    arr[: n * sz].reshape(sz, n).T.tobytes() + raw[n * sz :]
                )
            elif fid == 3:
                raw = raw[:-4]  # fletcher32 checksum trailer
            else:
                raise _unsupported(f"filter id {fid}")
        return raw

    def _read_chunked(self, o: _Obj, npdt: np.dtype) -> np.ndarray:
        shape = o.dataspace.shape
        chunk = o.layout.chunk_shape
        out = np.zeros(shape, dtype=npdt)
        if o.layout.btree == UNDEFINED:
            return out
        rank = len(chunk)
        stack = [o.layout.btree]
        while stack:
            addr = stack.pop()
            if self.data[addr : addr + 4] != b"TREE":
                raise HDF5Error("bad chunk B-tree signature")
            node_type, level, nentries = struct.unpack_from("<BBH", self.data, addr + 4)
            if node_type != 1:
                raise HDF5Error("chunk B-tree node type != 1")
            pos = addr + 24
            # keys and children alternate: key0 child0 key1 child1 ... keyN
            key_size = 8 + 8 * (rank + 1)
            for _ in range(nentries):
                csize, fmask = struct.unpack_from("<II", self.data, pos)
                offs = struct.unpack_from("<" + "Q" * (rank + 1), self.data, pos + 8)
                child = struct.unpack_from("<Q", self.data, pos + key_size)[0]
                if level > 0:
                    stack.append(child)
                else:
                    raw = self.data[child : child + csize]
                    raw = self._apply_filters(
                        raw, o.filters, npdt.itemsize, fmask
                    )
                    carr = np.frombuffer(
                        raw[: int(np.prod(chunk)) * npdt.itemsize], dtype=npdt
                    ).reshape(chunk)
                    sel = tuple(
                        slice(offs[d], min(offs[d] + chunk[d], shape[d]))
                        for d in range(rank)
                    )
                    clip = tuple(
                        slice(0, min(chunk[d], shape[d] - offs[d]))
                        for d in range(rank)
                    )
                    out[sel] = carr[clip]
                pos += key_size + 8
        return out


# ---------------------------------------------------------------- netcdf view
_DIM_PLACEHOLDER = "This is a netCDF dimension but not a netCDF variable"


def read_hdf5(data: bytes) -> NCDataset:
    """Parse an HDF5 / NetCDF-4 byte buffer into an :class:`NCDataset`."""
    try:
        return _read_hdf5(data)
    except HDF5Error:
        raise
    except (struct.error, IndexError, ValueError) as e:
        # truncated/corrupt containers surface as the module's own
        # actionable error, not a bare struct/index error mid-parse
        raise HDF5Error(f"corrupt or truncated HDF5 file: {e}") from e


def _read_hdf5(data: bytes) -> NCDataset:
    r = _Reader(data)
    root = r.obj(r.root_addr)

    # walk groups depth-first; netcdf data files are usually flat, but
    # prefix nested paths like the GFED4 reader expects ("group/var")
    datasets: dict[str, _Obj] = {}
    group_attrs = dict(root.attrs)
    stack = [("", root)]
    seen = {root.addr}
    while stack:
        prefix, g = stack.pop()
        for name, addr in sorted(r.group_links(g).items()):
            child = r.obj(addr)
            full = f"{prefix}{name}"
            if child.is_dataset:
                datasets[full] = child
            else:
                if addr not in seen:
                    seen.add(addr)
                    stack.append((full + "/", child))

    addr_to_name = {o.addr: n for n, o in datasets.items()}

    # dimensions: dimension-scale datasets; their length is the dim size
    dims: dict[str, int] = {}
    for name, o in datasets.items():
        if o.attrs.get("CLASS") == "DIMENSION_SCALE":
            dims[name] = o.dataspace.shape[0] if o.dataspace.shape else 0

    ds = NCDataset(dims=dims, attrs=group_attrs)
    anon = 0
    for name, o in datasets.items():
        is_placeholder = str(o.attrs.get("NAME", "")).startswith(_DIM_PLACEHOLDER)
        if is_placeholder:
            continue
        shape = o.dataspace.shape if o.dataspace else ()
        dim_refs = o.attrs.get("DIMENSION_LIST")
        var_dims: list[str] = []
        if dim_refs is not None:
            for refs in dim_refs:
                ref = refs[0] if refs else UNDEFINED
                var_dims.append(addr_to_name.get(ref, ""))
        elif o.attrs.get("CLASS") == "DIMENSION_SCALE":
            var_dims = [name]
        if len(var_dims) != len(shape) or any(not d for d in var_dims):
            # fall back to synthesized dims matching the shape
            var_dims = []
            for extent in shape:
                match = next(
                    (d for d, n_ in dims.items() if n_ == extent), None
                )
                if match is None:
                    match = f"phony_dim_{anon}"
                    anon += 1
                    dims[match] = extent
                var_dims.append(match)
        attrs = {
            k: v
            for k, v in o.attrs.items()
            if k
            not in ("CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
                    "_Netcdf4Dimid", "_Netcdf4Coordinates")
        }
        ds.variables[name] = NCVariable(
            name, tuple(var_dims), r.read_dataset(o), attrs
        )
    return ds


def read_netcdf4(path_or_bytes) -> NCDataset:
    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else open(path_or_bytes, "rb").read()
    )
    return read_hdf5(bytes(data))


def is_hdf5(data: bytes) -> bool:
    """Signature probe matching ``_Reader``'s userblock rule: offset 0,
    then every power-of-two offset >= 512 (bounded by the buffer), so a
    userblocked NetCDF-4 file routes to ``read_hdf5`` instead of being
    rejected as an unrecognized container."""
    if data[:8] == SIGNATURE:
        return True
    off = 512
    while off + 8 <= len(data):
        if data[off : off + 8] == SIGNATURE:
            return True
        off *= 2
    return False
