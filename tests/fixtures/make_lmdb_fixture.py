"""Build `beat_cache_lmdb/data.mdb` — a REAL LMDB environment holding
the two committed pyarrow-0.14 payloads (beat_window.arrow014 under key
b'0000000000', ted_window.arrow014 under b'0000000001') so the whole
migration path (LMDB container -> 0.14 payload -> GestureStore) is
tested on actual bytes with no monkeypatched modules (VERDICT r4 item 2).

`write_lmdb` renders the LMDB 0.9.x on-disk format from the mdb.c spec
(see data/lmdb_reader.py's docstring for the layout): meta pages 0/1,
leaf pages filled greedily, an optional single branch root, F_BIGDATA
values on contiguous overflow runs. It deliberately shares NO code with
the package's reader, so round-trip tests exercise two independent
renderings of the spec; tests/test_lmdb_reader.py additionally verifies
against the `lmdb` C binding whenever one is installed.
"""
import struct
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent

PSIZE = 4096
PAGEHDRSZ = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
MAGIC, VERSION = 0xBEEFC0DE, 1
P_INVALID = 0xFFFFFFFFFFFFFFFF


def _page_header(pgno, flags, lower, upper):
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _node(key, *, dsize, nflags, payload):
    return struct.pack("<HHHH", dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                       nflags, len(key)) + key + payload


def _branch_node(key, child_pgno):
    return struct.pack("<HHHH", child_pgno & 0xFFFF,
                       (child_pgno >> 16) & 0xFFFF,
                       (child_pgno >> 32) & 0xFFFF, len(key)) + key


def _render_page(pgno, flags, nodes):
    """nodes: list of rendered node byte strings, in key order. Nodes are
    placed from the page top downward (mdb layout); mp_ptrs ascend."""
    offsets, pos = [], PSIZE
    blob = bytearray(PSIZE)
    for node in nodes:
        size = len(node) + (len(node) & 1)  # 2-byte node alignment
        pos -= size
        blob[pos:pos + len(node)] = node
        offsets.append(pos)
    lower = PAGEHDRSZ + 2 * len(nodes)
    assert lower <= pos, "leaf overflow: page cannot hold these nodes"
    blob[:PAGEHDRSZ] = _page_header(pgno, flags, lower, pos)
    struct.pack_into(f"<{len(nodes)}H", blob, PAGEHDRSZ, *offsets)
    return bytes(blob)


def _meta(pgno, txnid, psize, main, last_pg):
    """main: dict(depth, branch, leaf, overflow, entries, root)."""
    hdr = _page_header(pgno, P_META, 0, 0)
    free_db = struct.pack("<IHH5Q", psize, 0, 0, 0, 0, 0, 0, P_INVALID)
    main_db = struct.pack("<IHH5Q", 0, 0, main["depth"], main["branch"],
                          main["leaf"], main["overflow"],
                          main["entries"], main["root"])
    meta = struct.pack("<IIQQ", MAGIC, VERSION, 0, PSIZE * (last_pg + 1))
    meta += free_db + main_db + struct.pack("<QQ", last_pg, txnid)
    return (hdr + meta).ljust(PSIZE, b"\x00")


def write_lmdb(path, items, inline_max=512):
    """Render an LMDB env at `path` (directory; creates data.mdb) with
    the given {key_bytes: value_bytes}. Values > inline_max go to
    overflow runs (F_BIGDATA), like any real big-record cache."""
    items = sorted(items.items())
    # pass 1 — pack leaf nodes into pages
    leaves, cur, cur_bytes = [], [], 0
    for key, value in items:
        big = len(value) > inline_max
        node_len = 8 + len(key) + (8 if big else len(value))
        node_len += node_len & 1
        if cur and PAGEHDRSZ + 2 * (len(cur) + 1) + cur_bytes + \
                node_len > PSIZE:
            leaves.append(cur)
            cur, cur_bytes = [], 0
        cur.append((key, value, big))
        cur_bytes += node_len
    if cur:
        leaves.append(cur)

    # page numbering: 0/1 metas, then leaves, then branch root (if any),
    # then overflow runs
    leaf_pgno = {i: 2 + i for i in range(len(leaves))}
    next_pg = 2 + len(leaves)
    branch_pg = None
    if len(leaves) > 1:
        branch_pg = next_pg
        next_pg += 1
    ov_runs = {}  # (leaf_i, slot_i) -> (pgno, n_pages)
    for li, leaf in enumerate(leaves):
        for si, (key, value, big) in enumerate(leaf):
            if big:
                n = (PAGEHDRSZ + len(value) + PSIZE - 1) // PSIZE
                ov_runs[(li, si)] = (next_pg, n)
                next_pg += n
    last_pg = next_pg - 1

    # pass 2 — render
    pages = {}
    for li, leaf in enumerate(leaves):
        nodes = []
        for si, (key, value, big) in enumerate(leaf):
            if big:
                pgno, _n = ov_runs[(li, si)]
                nodes.append(_node(key, dsize=len(value),
                                   nflags=F_BIGDATA,
                                   payload=struct.pack("<Q", pgno)))
            else:
                nodes.append(_node(key, dsize=len(value), nflags=0,
                                   payload=value))
        pages[leaf_pgno[li]] = _render_page(leaf_pgno[li], P_LEAF, nodes)
    if branch_pg is not None:
        nodes = []
        for li, leaf in enumerate(leaves):
            key = b"" if li == 0 else leaf[0][0]  # mdb: child 0 keyless
            nodes.append(_branch_node(key, leaf_pgno[li]))
        pages[branch_pg] = _render_page(branch_pg, P_BRANCH, nodes)
    for (li, si), (pgno, n) in ov_runs.items():
        value = leaves[li][si][1]
        hdr = struct.pack("<QHHI", pgno, 0, P_OVERFLOW, n)
        run = (hdr + value).ljust(n * PSIZE, b"\x00")
        pages[pgno] = run

    root = branch_pg if branch_pg is not None else (
        leaf_pgno[0] if leaves else P_INVALID)
    main = {
        "depth": (2 if branch_pg is not None else 1) if leaves else 0,
        "branch": 1 if branch_pg is not None else 0,
        "leaf": len(leaves),
        "overflow": sum(n for _, n in ov_runs.values()),
        "entries": len(items),
        "root": root,
    }
    empty = {"depth": 0, "branch": 0, "leaf": 0, "overflow": 0,
             "entries": 0, "root": P_INVALID}
    out = bytearray()
    out += _meta(0, 0, PSIZE, empty, 1)
    out += _meta(1, 1, PSIZE, main, last_pg)
    pos = 2
    while pos <= last_pg:
        page = pages[pos]
        out += page
        pos += len(page) // PSIZE
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "data.mdb").write_bytes(bytes(out))
    return path


def main():
    items = {
        b"0000000000": (HERE / "beat_window.arrow014").read_bytes(),
        b"0000000001": (HERE / "ted_window.arrow014").read_bytes(),
    }
    out = write_lmdb(HERE / "beat_cache_lmdb", items)
    print(f"wrote {out}/data.mdb "
          f"({(out / 'data.mdb').stat().st_size} bytes)")


if __name__ == "__main__":
    sys.exit(main())
