"""Minimal LMDB-format writer (no liblmdb dependency).

Produces files following lmdb/mdb.c's on-disk layout (meta pages 0-1,
leaf/branch pages, overflow chains), readable by both this framework's
pure-Python reader (data/lmdb_reader.py) and standard lmdb bindings.
Backs the `create-lmdb` CLI command (reference
OCR/MGP-STR/create_lmdb_dataset.py) and the test fixtures.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

PAGE = 4096
MAGIC = 0xBEEFC0DE
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01


def _page_header(pgno: int, flags: int, lower: int, upper: int) -> bytes:
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _overflow_header(pgno: int, pages: int) -> bytes:
    return struct.pack("<QHHI", pgno, 0, P_OVERFLOW, pages)


def _build_leaf(pgno: int, items: List[Tuple[bytes, bytes, int]]) -> bytes:
    """items: (key, value_bytes_or_pgno_packed, node_flags)."""
    nodes = []
    for key, val, nflags in items:
        if nflags & F_BIGDATA:
            dsize = val[0]          # (true data size, pgno) packed by caller
            payload = struct.pack("<Q", val[1])
            node = struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, nflags,
                               len(key)) + key + payload
        else:
            node = struct.pack("<HHHH", len(val) & 0xFFFF, len(val) >> 16,
                               nflags, len(key)) + key + val
        if len(node) % 2:
            node += b"\x00"
        nodes.append(node)

    n = len(nodes)
    ptrs_end = 16 + 2 * n
    # nodes packed at the end of the page (upper grows downward)
    offsets = []
    pos = PAGE
    for node in reversed(nodes):
        pos -= len(node)
        offsets.append(pos)
    offsets.reverse()
    page = bytearray(PAGE)
    page[0:16] = _page_header(pgno, P_LEAF, ptrs_end, min(offsets) if offsets else PAGE)
    for i, (off, node) in enumerate(zip(offsets, nodes)):
        struct.pack_into("<H", page, 16 + 2 * i, off)
        page[off:off + len(node)] = node
    return bytes(page)


def _build_branch(pgno: int, entries: List[Tuple[bytes, int]]) -> bytes:
    """entries: (low_key, child_pgno); first key should be b''."""
    nodes = []
    for key, child in entries:
        lo = child & 0xFFFF
        hi = (child >> 16) & 0xFFFF
        fl = (child >> 32) & 0xFFFF
        node = struct.pack("<HHHH", lo, hi, fl, len(key)) + key
        if len(node) % 2:
            node += b"\x00"
        nodes.append(node)
    n = len(nodes)
    page = bytearray(PAGE)
    pos = PAGE
    offsets = []
    for node in reversed(nodes):
        pos -= len(node)
        offsets.append(pos)
    offsets.reverse()
    page[0:16] = _page_header(pgno, P_BRANCH, 16 + 2 * n, min(offsets))
    for i, (off, node) in enumerate(zip(offsets, nodes)):
        struct.pack_into("<H", page, 16 + 2 * i, off)
        page[off:off + len(node)] = node
    return bytes(page)


def _build_meta(pgno: int, txnid: int, root: int, entries: int,
                last_pg: int) -> bytes:
    page = bytearray(PAGE)
    page[0:16] = _page_header(pgno, P_META, 0, 0)
    base = 16
    struct.pack_into("<II", page, base, MAGIC, 1)
    struct.pack_into("<QQ", page, base + 8, 0, PAGE * 1024)  # address, mapsize
    dbs = base + 24
    # dbs[0] (FREE_DBI): zeros with root = -1
    struct.pack_into("<q", page, dbs + 40, -1)
    # dbs[1] (MAIN_DBI)
    main = dbs + 48
    struct.pack_into("<IHH", page, main, 0, 0, 1)
    struct.pack_into("<QQQ", page, main + 8, 0, 1, 0)
    struct.pack_into("<qq", page, main + 32, entries, root)
    struct.pack_into("<QQ", page, dbs + 96, last_pg, txnid)
    return bytes(page)


def write_lmdb(path: str, data: Dict[bytes, bytes],
               max_leaf_items: int = 30) -> None:
    """Write data.mdb at `path` (a file path)."""
    items = sorted(data.items())
    pages: Dict[int, bytes] = {}
    next_pg = 2  # 0, 1 are meta

    # overflow values > ~1000 bytes
    processed = []
    for k, v in items:
        if len(v) > 1000:
            npages = (len(v) + 16 + PAGE - 1) // PAGE
            opg = next_pg
            next_pg += npages
            buf = bytearray(npages * PAGE)
            buf[0:16] = _overflow_header(opg, npages)
            buf[16:16 + len(v)] = v
            for j in range(npages):
                pages[opg + j] = bytes(buf[j * PAGE:(j + 1) * PAGE])
            processed.append((k, (len(v), opg), F_BIGDATA))
        else:
            processed.append((k, v, 0))

    # leaves
    leaf_pgnos = []
    leaf_lowkeys = []
    for i in range(0, max(len(processed), 1), max_leaf_items):
        chunk = processed[i:i + max_leaf_items]
        pg = next_pg
        next_pg += 1
        pages[pg] = _build_leaf(pg, chunk)
        leaf_pgnos.append(pg)
        leaf_lowkeys.append(chunk[0][0] if chunk else b"")

    if len(leaf_pgnos) == 1:
        root = leaf_pgnos[0]
    else:
        entries = [(b"" if i == 0 else leaf_lowkeys[i], pg)
                   for i, pg in enumerate(leaf_pgnos)]
        root = next_pg
        next_pg += 1
        pages[root] = _build_branch(root, entries)

    out = bytearray(next_pg * PAGE)
    out[0:PAGE] = _build_meta(0, 1, root, len(items), next_pg - 1)
    out[PAGE:2 * PAGE] = _build_meta(1, 2, root, len(items), next_pg - 1)
    for pg, blob in pages.items():
        out[pg * PAGE:(pg + 1) * PAGE] = blob
    with open(path, "wb") as f:
        f.write(bytes(out))


def create_str_lmdb(gt_file: str, out_dir: str, root: str = "",
                    check_valid: bool = True) -> int:
    """Build an STR LMDB from a gt file of `imagepath\\tlabel` lines
    (reference OCR/MGP-STR/create_lmdb_dataset.py createDataset): keys
    num-samples / image-%09d (encoded bytes) / label-%09d. Returns the
    number of samples written."""
    import io
    import os

    data: Dict[bytes, bytes] = {}
    n = 0
    with open(gt_file, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            path, _, label = line.partition("\t")
            full = os.path.join(root, path) if root else path
            with open(full, "rb") as imf:
                img_bytes = imf.read()
            if check_valid:
                try:
                    from PIL import Image

                    Image.open(io.BytesIO(img_bytes)).verify()
                except Exception:
                    print(f"skipping invalid image: {full}")
                    continue
            n += 1
            data[b"image-%09d" % n] = img_bytes
            data[b"label-%09d" % n] = label.encode("utf-8")
    data[b"num-samples"] = str(n).encode()
    os.makedirs(out_dir, exist_ok=True)
    write_lmdb(os.path.join(out_dir, "data.mdb"), data)
    return n
