"""Minimal from-scratch HDF5 container (write + read) for the KEA driver.

Implements the subset of the public HDF5 File Format Specification
(HDF Group, "HDF5 File Format Specification Version 2.0" — the
version-0-superblock / version-1-object-header / version-1-B-tree layer
that every HDF5 1.8+ library still reads) that a KEA raster needs:

- version-0 superblock (96 bytes at offset 0),
- "old-style" groups: a version-1 B-tree (node type 0) over SNOD symbol
  nodes, link names in a local heap,
- version-1 object headers with Dataspace (0x0001), Datatype (0x0003:
  fixed-point, IEEE float, fixed-length ASCII string), Data Layout v3
  (0x0008: contiguous and chunked), Filter Pipeline (0x000B: deflate),
  Attribute (0x000C) and Symbol Table (0x0011) messages,
- chunked 2-D storage indexed by a version-1 B-tree (node type 1),
  zlib-compressed, where an absent chunk stands for an all-fill block.

All multi-byte metadata fields are little-endian per the spec; offsets
and lengths are 8 bytes.  The writer streams raw chunk payloads into the
file as they arrive and assembles every metadata block in one in-memory
region at ``close()`` — HDF5 is offset-addressed, so metadata may
legally live after the data it describes (the same trick as the
streaming GeoTIFF writer's trailing IFD, sinks/gtiff.py).

No h5py/libhdf5 exists in this environment (SURVEY §10), so the reader
half is written independently from the same spec: it follows the
addresses, sizes and entry counts recorded in the file rather than
assuming the writer's allocation order, and it handles object-header
continuation blocks (0x0010) the writer never emits.
"""

from __future__ import annotations

import struct
import zlib
from collections import defaultdict

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF

_MSG_DATASPACE = 0x0001
_MSG_DATATYPE = 0x0003
_MSG_FILLVALUE = 0x0005
_MSG_LAYOUT = 0x0008
_MSG_FILTERS = 0x000B
_MSG_ATTRIBUTE = 0x000C
_MSG_CONTINUATION = 0x0010
_MSG_SYMBOLTABLE = 0x0011

_GROUP_BTREE_FANOUT = 32     # 2 * (group internal node K = 16)
_SNOD_FANOUT = 8             # 2 * (group leaf node K = 4)
_CHUNK_BTREE_FANOUT = 64     # 2 * (default indexed-storage K = 32)


def _pad8(b: bytes) -> bytes:
    return b + b"\0" * ((-len(b)) % 8)


# ------------------------------------------------------------- messages

def _dataspace_body(shape) -> bytes:
    dims = tuple(int(d) for d in shape)
    return (struct.pack("<BBB5x", 1, len(dims), 0)
            + b"".join(struct.pack("<Q", d) for d in dims))


def _datatype_body(dt: np.dtype) -> bytes:
    dt = np.dtype(dt)
    if dt.kind in "iu":
        bits0 = 0x08 if dt.kind == "i" else 0x00  # bit 3: two's complement
        return (struct.pack("<B3BI", 0x10, bits0, 0, 0, dt.itemsize)
                + struct.pack("<HH", 0, dt.itemsize * 8))
    if dt.kind == "f":
        if dt.itemsize == 4:
            exploc, expsize, mansize, bias, signloc = 23, 8, 23, 127, 31
        elif dt.itemsize == 8:
            exploc, expsize, mansize, bias, signloc = 52, 11, 52, 1023, 63
        else:
            raise ValueError(f"unsupported float width {dt.itemsize}")
        # bits0: little-endian, implied-set mantissa normalization (0x20)
        return (struct.pack("<B3BI", 0x11, 0x20, signloc, 0, dt.itemsize)
                + struct.pack("<HHBBBBI", 0, dt.itemsize * 8,
                              exploc, expsize, 0, mansize, bias))
    if dt.kind == "S":
        # null-terminated ASCII, fixed length
        return struct.pack("<B3BI", 0x13, 0, 0, 0, dt.itemsize)
    raise ValueError(f"dtype {dt} has no HDF5 datatype mapping here")


def _parse_datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    size = struct.unpack_from("<I", body, 4)[0]
    if cls == 0:
        return np.dtype(f"{'i' if body[1] & 0x08 else 'u'}{size}")
    if cls == 1:
        return np.dtype(f"f{size}")
    if cls == 3:
        return np.dtype(f"S{size}")
    raise ValueError(f"unsupported datatype class {cls}")


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(msgs: list[bytes]) -> bytes:
    blob = b"".join(msgs)
    return (struct.pack("<BxHII", 1, len(msgs), 1, len(blob))
            + b"\0" * 4 + blob)


def _attr_value(value) -> np.ndarray:
    if isinstance(value, str):
        value = value.encode()
    if isinstance(value, bytes):
        return np.array([value], dtype=f"S{len(value) + 1}")
    arr = np.asarray(value)
    if arr.ndim == 0:
        arr = arr.reshape(1)
    return arr


def _attribute_msg(name: str, value) -> bytes:
    arr = _attr_value(value)
    nb = name.encode() + b"\0"
    dt = _datatype_body(arr.dtype)
    sp = _dataspace_body(arr.shape)
    body = (struct.pack("<BxHHH", 1, len(nb), len(dt), len(sp))
            + _pad8(nb) + _pad8(dt) + _pad8(sp)
            + np.ascontiguousarray(arr).tobytes())
    return _msg(_MSG_ATTRIBUTE, body)


def _filter_pipeline_msg() -> bytes:
    # one filter: deflate (id 1), one client value (level; informational)
    body = (struct.pack("<BB2x4x", 1, 1)
            + struct.pack("<HHHHI4x", 1, 0, 0, 1, 1))
    return _msg(_MSG_FILTERS, body)


def _chunk_key(nbytes: int, mask: int, offs) -> bytes:
    return (struct.pack("<II", nbytes, mask)
            + b"".join(struct.pack("<Q", o) for o in offs)
            + struct.pack("<Q", 0))  # trailing element-dimension offset


# --------------------------------------------------------------- writer

class MiniHdf5Writer:
    """Streaming writer: declare datasets, push compressed chunks as the
    pipeline produces them, ``close()`` writes all metadata at the end."""

    def __init__(self, f):
        self.f = f
        f.seek(0)
        f.write(b"\0" * 96)  # superblock placeholder, rewritten at close
        self._eof = 96
        self._nodes: dict[str, dict] = {}   # path -> dataset spec
        self._groups: set[str] = {""}

    # -- declaration ----------------------------------------------------
    def add_group(self, path: str) -> None:
        self._ensure_parents(path)
        self._groups.add(path.strip("/"))

    def create_array(self, path: str, value, attrs=None) -> None:
        """Small contiguous dataset, written with the metadata at close."""
        arr = _attr_value(value)
        path = path.strip("/")
        self._ensure_parents(path)
        self._nodes[path] = {"kind": "contig", "arr": arr,
                             "attrs": dict(attrs or {})}

    def create_chunked(self, path: str, shape, dtype, chunk,
                       attrs=None) -> None:
        path = path.strip("/")
        self._ensure_parents(path)
        self._nodes[path] = {
            "kind": "chunked", "shape": tuple(int(s) for s in shape),
            "dtype": np.dtype(dtype), "chunk": tuple(int(c) for c in chunk),
            "attrs": dict(attrs or {}), "chunks": [],
        }

    def _ensure_parents(self, path: str) -> None:
        parts = path.strip("/").split("/")
        for i in range(len(parts)):
            self._groups.add("/".join(parts[:i]))

    # -- streaming ------------------------------------------------------
    def write_chunk(self, path: str, offsets, block: np.ndarray) -> None:
        """Deflate ``block`` (shape == declared chunk) and append it NOW;
        only the (offset, address, size) record is kept in memory."""
        spec = self._nodes[path.strip("/")]
        raw = zlib.compress(
            np.ascontiguousarray(block, dtype=spec["dtype"]).tobytes(), 1)
        self.f.seek(self._eof)
        self.f.write(raw)
        spec["chunks"].append((tuple(int(o) for o in offsets),
                               self._eof, len(raw)))
        self._eof += len(raw)

    # -- assembly -------------------------------------------------------
    def close(self) -> None:
        base = self._eof
        meta = bytearray()

        def alloc(n: int) -> int:
            off = len(meta)
            meta.extend(b"\0" * n)
            return base + off

        def patch(addr: int, b: bytes) -> None:
            meta[addr - base:addr - base + len(b)] = b

        addr_of: dict[str, int] = {}

        for path, spec in self._nodes.items():
            msgs = []
            if spec["kind"] == "contig":
                arr = spec["arr"]
                msgs.append(_msg(_MSG_DATASPACE, _dataspace_body(arr.shape)))
                msgs.append(_msg(_MSG_DATATYPE, _datatype_body(arr.dtype)))
                payload = np.ascontiguousarray(arr).tobytes()
                daddr = alloc(len(payload))
                patch(daddr, payload)
                msgs.append(_msg(_MSG_LAYOUT, struct.pack(
                    "<BBQQ", 3, 1, daddr, len(payload))))
            else:
                msgs.append(_msg(_MSG_DATASPACE,
                                 _dataspace_body(spec["shape"])))
                msgs.append(_msg(_MSG_DATATYPE,
                                 _datatype_body(spec["dtype"])))
                msgs.append(_filter_pipeline_msg())
                bt = self._chunk_btree(alloc, patch, spec)
                body = (struct.pack("<BBB", 3, 2, len(spec["chunk"]) + 1)
                        + struct.pack("<Q", bt)
                        + b"".join(struct.pack("<I", c)
                                   for c in spec["chunk"])
                        + struct.pack("<I", spec["dtype"].itemsize))
                msgs.append(_msg(_MSG_LAYOUT, body))
            for name, value in spec["attrs"].items():
                msgs.append(_attribute_msg(name, value))
            hdr = _object_header(msgs)
            a = alloc(len(hdr))
            patch(a, hdr)
            addr_of[path] = a

        children: dict[str, list[str]] = defaultdict(list)
        for path in sorted(self._groups - {""}) + sorted(self._nodes):
            parent = path.rsplit("/", 1)[0] if "/" in path else ""
            children[parent].append(path)
        for group in sorted(self._groups, key=lambda g: -g.count("/") - (g != "")):
            addr_of[group] = self._write_group(
                alloc, patch, sorted(set(children.get(group, []))), addr_of)

        self.f.seek(base)
        self.f.write(bytes(meta))
        eof = base + len(meta)
        sb = (SIGNATURE
              + struct.pack("<8B", 0, 0, 0, 0, 0, 8, 8, 0)
              + struct.pack("<HHI", 4, 16, 0)
              + struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
              + struct.pack("<QQII16x", 0, addr_of[""], 0, 0))
        assert len(sb) == 96
        self.f.seek(0)
        self.f.write(sb)

    def _chunk_btree(self, alloc, patch, spec) -> int:
        dims, cdims = spec["shape"], spec["chunk"]
        sentinel = _chunk_key(0, 0, tuple(
            -(-d // c) * c for d, c in zip(dims, cdims)))
        entries = [(_chunk_key(n, 0, offs), addr)
                   for offs, addr, n in sorted(spec["chunks"])]
        if not entries:
            # chunked dataset with every block implicit: an empty leaf
            a = alloc(24 + len(sentinel))
            patch(a, b"TREE" + struct.pack("<BBHQQ", 1, 0, 0, UNDEF, UNDEF)
                  + sentinel)
            return a
        level = 0
        while True:
            rows = [entries[i:i + _CHUNK_BTREE_FANOUT]
                    for i in range(0, len(entries), _CHUNK_BTREE_FANOUT)]
            keysz = len(sentinel)
            addrs = [alloc(24 + (len(r) + 1) * keysz + len(r) * 8)
                     for r in rows]
            for gi, row in enumerate(rows):
                nxt_key = rows[gi + 1][0][0] if gi + 1 < len(rows) \
                    else sentinel
                buf = b"TREE" + struct.pack(
                    "<BBHQQ", 1, level, len(row),
                    addrs[gi - 1] if gi > 0 else UNDEF,
                    addrs[gi + 1] if gi + 1 < len(rows) else UNDEF)
                for key, child in row:
                    buf += key + struct.pack("<Q", child)
                buf += nxt_key
                patch(addrs[gi], buf)
            if len(rows) == 1:
                return addrs[0]
            entries = [(rows[i][0][0], addrs[i]) for i in range(len(rows))]
            level += 1

    def _write_group(self, alloc, patch, child_paths, addr_of) -> int:
        names = [p.rsplit("/", 1)[-1] for p in child_paths]
        heap_data = bytearray(b"\0" * 8)  # offset 0: the empty string
        name_off = {}
        for n in names:
            name_off[n] = len(heap_data)
            heap_data.extend(_pad8(n.encode() + b"\0"))
        hd_addr = alloc(len(heap_data))
        patch(hd_addr, bytes(heap_data))
        heap_addr = alloc(32)
        patch(heap_addr, b"HEAP" + struct.pack(
            "<B3xQQQ", 0, len(heap_data), UNDEF, hd_addr))

        snod_addrs, snod_last = [], []
        for i in range(0, max(len(names), 1), _SNOD_FANOUT):
            grp = list(zip(names, child_paths))[i:i + _SNOD_FANOUT]
            a = alloc(8 + 40 * len(grp))
            buf = b"SNOD" + struct.pack("<BBH", 1, 0, len(grp))
            for n, p in grp:
                buf += struct.pack("<QQII16x", name_off[n], addr_of[p], 0, 0)
            patch(a, buf)
            snod_addrs.append(a)
            snod_last.append(name_off[grp[-1][0]] if grp else 0)

        bt_addr = alloc(24 + 8 * (2 * len(snod_addrs) + 1))
        buf = b"TREE" + struct.pack("<BBHQQ", 0, 0, len(snod_addrs),
                                    UNDEF, UNDEF)
        buf += struct.pack("<Q", 0)  # key 0: empty string <= everything
        for a, last in zip(snod_addrs, snod_last):
            buf += struct.pack("<QQ", a, last)
        patch(bt_addr, buf)

        hdr = _object_header([_msg(_MSG_SYMBOLTABLE,
                                   struct.pack("<QQ", bt_addr, heap_addr))])
        a = alloc(len(hdr))
        patch(a, hdr)
        return a


# --------------------------------------------------------------- reader

class H5Dataset:
    def __init__(self, h5, msgs):
        self._h5 = h5
        self._msgs = msgs
        sp = _find(msgs, _MSG_DATASPACE)
        rank = sp[1]
        self.shape = tuple(struct.unpack_from("<Q", sp, 8 + 8 * i)[0]
                           for i in range(rank))
        self.dtype = _parse_datatype(_find(msgs, _MSG_DATATYPE))
        self.attrs = {n: v for n, v in
                      (_parse_attribute(b) for t, b in msgs
                       if t == _MSG_ATTRIBUTE)}

    def read(self, fill=0) -> np.ndarray:
        body = _find(self._msgs, _MSG_LAYOUT)
        if body[0] != 3:
            raise ValueError(f"unsupported data layout version {body[0]}")
        if body[1] == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", body, 2)
            arr = np.frombuffer(self._h5.buf, dtype=self.dtype,
                                count=size // self.dtype.itemsize,
                                offset=addr)
            return arr.reshape(self.shape)
        if body[1] != 2:
            raise ValueError(f"unsupported layout class {body[1]}")
        ndim = body[2] - 1
        (bt_addr,) = struct.unpack_from("<Q", body, 3)
        cdims = struct.unpack_from(f"<{ndim}I", body, 11)
        deflated = any(t == _MSG_FILTERS for t, _ in self._msgs)
        padded = tuple(-(-d // c) * c for d, c in zip(self.shape, cdims))
        canvas = np.full(padded, fill, dtype=self.dtype)
        for offs, addr, nbytes in self._h5.walk_chunk_btree(bt_addr, ndim):
            raw = self._h5.buf[addr:addr + nbytes]
            if deflated:
                raw = zlib.decompress(raw)
            blk = np.frombuffer(raw, dtype=self.dtype).reshape(cdims)
            sel = tuple(slice(o, o + c) for o, c in zip(offs, cdims))
            canvas[sel] = blk
        return canvas[tuple(slice(0, d) for d in self.shape)]

    def read_scalar(self):
        v = self.read()
        if self.dtype.kind == "S":
            return v.reshape(-1)[0].rstrip(b"\0").decode()
        return v.reshape(-1)[0] if v.size == 1 else v


class H5Group:
    def __init__(self, h5, msgs):
        self._h5 = h5
        self.attrs = {n: v for n, v in
                      (_parse_attribute(b) for t, b in msgs
                       if t == _MSG_ATTRIBUTE)}
        bt_addr, heap_addr = struct.unpack("<QQ",
                                           _find(msgs, _MSG_SYMBOLTABLE))
        self._entries = dict(h5.walk_group_btree(bt_addr, heap_addr))

    def keys(self):
        return sorted(self._entries)

    def __contains__(self, name):
        return name in self._entries

    def __getitem__(self, name):
        if "/" in name:
            head, rest = name.split("/", 1)
            return self[head][rest]
        return self._h5.node(self._entries[name])


class H5File:
    """Read-side: parse a whole HDF5 byte buffer (the writer's subset,
    plus object-header continuations for robustness)."""

    def __init__(self, buf: bytes):
        if buf[:8] != SIGNATURE:
            raise ValueError("not an HDF5 file (missing signature)")
        if buf[8] != 0:
            raise ValueError(f"unsupported superblock version {buf[8]}")
        if buf[13] != 8 or buf[14] != 8:
            raise ValueError("only 8-byte offsets/lengths supported")
        self.buf = buf
        (self._root_hdr,) = struct.unpack_from("<Q", buf, 64)

    def root(self) -> H5Group:
        return self.node(self._root_hdr)

    def node(self, addr: int):
        msgs = self.read_object_header(addr)
        if any(t == _MSG_SYMBOLTABLE for t, _ in msgs):
            return H5Group(self, msgs)
        return H5Dataset(self, msgs)

    def __getitem__(self, path: str):
        node = self.root()
        for part in path.strip("/").split("/"):
            node = node[part]
        return node

    def read_object_header(self, addr: int) -> list[tuple[int, bytes]]:
        buf = self.buf
        version = buf[addr]
        (nmsgs,) = struct.unpack_from("<H", buf, addr + 2)
        if version != 1:
            raise ValueError(f"unsupported object header version {version}")
        (hdr_size,) = struct.unpack_from("<I", buf, addr + 8)
        blocks = [(addr + 16, hdr_size)]
        msgs: list[tuple[int, bytes]] = []
        while blocks and len(msgs) < nmsgs:
            at, remaining = blocks.pop(0)
            while remaining >= 8 and len(msgs) < nmsgs:
                mtype, msize, _flags = struct.unpack_from("<HHB", buf, at)
                body = buf[at + 8:at + 8 + msize]
                if mtype == _MSG_CONTINUATION:
                    caddr, clen = struct.unpack_from("<QQ", body)
                    blocks.append((caddr, clen))
                elif mtype != 0:  # skip NIL padding
                    msgs.append((mtype, body))
                at += 8 + msize
                remaining -= 8 + msize
        return msgs

    def walk_group_btree(self, bt_addr: int, heap_addr: int):
        buf = self.buf
        if buf[heap_addr:heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        (heap_data,) = struct.unpack_from("<Q", buf, heap_addr + 24)

        def name_at(off: int) -> str:
            end = buf.index(b"\0", heap_data + off)
            return buf[heap_data + off:end].decode()

        def walk(addr: int):
            if buf[addr:addr + 4] == b"SNOD":
                (n,) = struct.unpack_from("<H", buf, addr + 6)
                for i in range(n):
                    off, ohdr = struct.unpack_from("<QQ", buf,
                                                   addr + 8 + 40 * i)
                    yield name_at(off), ohdr
                return
            if buf[addr:addr + 4] != b"TREE":
                raise ValueError("bad group B-tree signature")
            ntype, level, n = struct.unpack_from("<BBH", buf, addr + 4)
            if ntype != 0:
                raise ValueError("expected a group B-tree node")
            for i in range(n):
                (child,) = struct.unpack_from(
                    "<Q", buf, addr + 24 + 8 + i * 16)
                yield from walk(child)

        yield from walk(bt_addr)

    def walk_chunk_btree(self, addr: int, ndim: int):
        buf = self.buf
        if buf[addr:addr + 4] != b"TREE":
            raise ValueError("bad chunk B-tree signature")
        ntype, level, n = struct.unpack_from("<BBH", buf, addr + 4)
        if ntype != 1:
            raise ValueError("expected a chunk B-tree node")
        keysz = 8 + 8 * (ndim + 1)
        at = addr + 24
        for i in range(n):
            nbytes, _mask = struct.unpack_from("<II", buf, at)
            offs = struct.unpack_from(f"<{ndim}Q", buf, at + 8)
            (child,) = struct.unpack_from("<Q", buf, at + keysz)
            if level > 0:
                yield from self.walk_chunk_btree(child, ndim)
            else:
                yield offs, child, nbytes
            at += keysz + 8


def _find(msgs, mtype: int) -> bytes:
    for t, b in msgs:
        if t == mtype:
            return b
    raise KeyError(f"object header has no message of type 0x{mtype:04x}")


def _parse_attribute(body: bytes):
    name_size, dt_size, sp_size = struct.unpack_from("<HHH", body, 2)
    at = 8
    name = body[at:at + name_size].split(b"\0")[0].decode()
    at += len(_pad8(body[at:at + name_size]))
    dt = _parse_datatype(body[at:at + dt_size])
    at += len(_pad8(body[at:at + dt_size]))
    sp = body[at:at + sp_size]
    rank = sp[1]
    shape = tuple(struct.unpack_from("<Q", sp, 8 + 8 * i)[0]
                  for i in range(rank))
    at += len(_pad8(body[at:at + sp_size]))
    count = int(np.prod(shape)) if shape else 1
    arr = np.frombuffer(body, dtype=dt, count=count, offset=at)
    if dt.kind == "S":
        return name, arr.reshape(-1)[0].rstrip(b"\0").decode()
    return name, (arr.reshape(shape) if len(shape) > 1
                  else (arr[0] if count == 1 else arr.copy()))


def h5_open(buf: bytes) -> H5File:
    return H5File(buf)
