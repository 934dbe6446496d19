"""Minimal OLE2 Compound File Binary reader + Word 97 (.doc) text slice.

The reference converts .doc with an external ``antiword`` subprocess
(process.py:58-64) — absent from this environment.  This module closes the
U3 .doc branch in-process, from the public format specs alone:

- [MS-CFB]: the structured-storage container — 512-byte sectors, DIFAT →
  FAT → directory chain, and the mini-FAT/mini-stream for streams under
  the 4096-byte cutoff (real .doc Table streams are usually mini-stream
  resident, so both allocators are implemented)
- [MS-DOC]: the FIB in the WordDocument stream; the piece table (Clx →
  PlcPcd) in the 0Table/1Table stream; per-piece fCompressed bit selecting
  cp1252-at-fc/2 vs UTF-16LE-at-fc; the first ccpText characters are the
  main document body

Scope (the bounded slice): text extraction only — no OLE objects, no
fields resolution (field control bytes are dropped), no fastsaved
revision-pieces beyond what the piece table itself expresses (fastsaved
files ARE piece tables, so they work).  Encrypted documents
(fEncrypted, FIB flag bit 8) raise ValueError → b"" via the converter
error contract.

Everything is stdlib struct — no external binaries, mirroring the
BMP/PNM/AVI decode slices in pipeline/multimodal.py.
"""

from __future__ import annotations

import struct

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC


class CompoundFile:
    """Read-only [MS-CFB] container over in-memory bytes."""

    def __init__(self, data: bytes):
        if len(data) < 512 or data[:8] != OLE_MAGIC:
            raise ValueError("not an OLE2 compound file")
        self.data = data
        (
            self.sector_shift,
            self.mini_shift,
        ) = struct.unpack_from("<HH", data, 30)
        if not (7 <= self.sector_shift <= 12) or self.mini_shift >= self.sector_shift:
            raise ValueError("implausible CFB sector shifts")
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (
            _n_dir_sectors,
            self.n_fat_sectors,
            self.first_dir_sector,
            _trans,
            self.mini_cutoff,
            self.first_minifat_sector,
            self.n_minifat_sectors,
            self.first_difat_sector,
            self.n_difat_sectors,
        ) = struct.unpack_from("<9I", data, 40)
        self._fat = self._read_fat()
        self._dir = self._read_directory()
        self._minifat = self._read_minifat()
        root = self._dir[0]
        if root[1] != 5:
            raise ValueError("first directory entry is not the root storage")
        # the mini stream lives in the ROOT entry's regular-FAT chain
        self._mini_stream = (
            self._read_chain(root[2], root[3]) if root[3] else b""
        )

    # -- sector plumbing ----------------------------------------------------
    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.sector_size
        if off + self.sector_size > len(self.data):
            raise ValueError(f"sector {n} beyond file end")
        return self.data[off : off + self.sector_size]

    def _read_fat(self) -> list[int]:
        # DIFAT: 109 header entries + chained DIFAT sectors.  The chain is
        # bounded by the number of sectors that physically fit in the file
        # and cycle-checked — untrusted n_difat_sectors / next-pointers must
        # not loop forever (web-fetched .doc bytes are adversarial input)
        difat = list(struct.unpack_from("<109I", self.data, 76))
        sec = self.first_difat_sector
        per = self.sector_size // 4 - 1
        max_sectors = len(self.data) // self.sector_size + 1
        seen: set[int] = set()
        for _ in range(min(self.n_difat_sectors, max_sectors)):
            if sec in (ENDOFCHAIN, FREESECT) or sec in seen:
                break
            seen.add(sec)
            raw = struct.unpack(f"<{per + 1}I", self._sector(sec))
            difat.extend(raw[:per])
            sec = raw[per]
        fat: list[int] = []
        n_ids = self.sector_size // 4
        count = 0
        for s in difat:
            if s in (FREESECT, ENDOFCHAIN) or count >= self.n_fat_sectors:
                continue
            fat.extend(struct.unpack(f"<{n_ids}I", self._sector(s)))
            count += 1
        return fat

    def _chain(self, start: int, table: list[int]) -> list[int]:
        chain, sec, seen = [], start, set()
        while sec not in (ENDOFCHAIN, FREESECT):
            if sec in seen or sec >= len(table):
                raise ValueError("corrupt allocation chain")
            seen.add(sec)
            chain.append(sec)
            sec = table[sec]
        return chain

    def _read_chain(self, start: int, size: int) -> bytes:
        out = b"".join(self._sector(s) for s in self._chain(start, self._fat))
        return out[:size]

    def _read_minifat(self) -> list[int]:
        if not self.n_minifat_sectors:
            return []
        n_ids = self.sector_size // 4
        out: list[int] = []
        for s in self._chain(self.first_minifat_sector, self._fat):
            out.extend(struct.unpack(f"<{n_ids}I", self._sector(s)))
        return out

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        parts = []
        for s in self._chain(start, self._minifat):
            off = s * self.mini_size
            parts.append(self._mini_stream[off : off + self.mini_size])
        return b"".join(parts)[:size]

    # -- directory ----------------------------------------------------------
    def _read_directory(self) -> list[tuple[str, int, int, int]]:
        raw = b"".join(
            self._sector(s) for s in self._chain(self.first_dir_sector, self._fat)
        )
        entries = []
        for off in range(0, len(raw), 128):
            ent = raw[off : off + 128]
            if len(ent) < 128:
                break
            name_len, obj_type = struct.unpack_from("<HB", ent, 64)
            if obj_type == 0:
                continue  # unused entry
            name = ent[: max(0, name_len - 2)].decode("utf-16-le", "replace")
            start, size = struct.unpack_from("<IQ", ent, 116)
            entries.append((name, obj_type, start, size))
        if not entries:
            raise ValueError("empty CFB directory")
        return entries

    def stream_names(self) -> list[str]:
        return [name for name, t, _s, _z in self._dir if t == 2]

    def read_stream(self, name: str) -> bytes:
        for ename, etype, start, size in self._dir:
            if etype == 2 and ename == name:
                if size < self.mini_cutoff:
                    return self._read_mini_chain(start, size)
                return self._read_chain(start, size)
        raise KeyError(name)


# ---------------------------------------------------------------------------
# [MS-DOC] Word 97+ binary text extraction
# ---------------------------------------------------------------------------

_FIB_WIDENT = 0xA5EC
_FC_CLX_OFFSET = 0x01A2  # FibRgFcLcb97 pair 33 (fcClx, lcbClx)
_CCP_TEXT_OFFSET = 0x004C  # FibRgLw97[3]

# in-text control bytes → plain text (the antiword-style mapping):
# 0x0D paragraph mark and 0x0C page/section break end a paragraph;
# 0x0B hard line break stays an in-paragraph newline; 0x07 ends a table
# cell; field/object control bytes vanish
_DOC_CHAR_MAP = {
    "\r": "\n\n",
    "\x0c": "\n\n",
    "\x0b": "\n",
    "\x07": "\n",
    "\x1e": "-",   # non-breaking hyphen
    "\x1f": "",    # optional hyphen
    "\x01": "",    # embedded object marker
    "\x02": "",    # footnote mark
    "\x05": "",    # annotation reference
    "\x08": "",    # drawn object
}


def _strip_fields(text: str) -> str:
    """Keep only field RESULTS (antiword behaviour): 0x13 opens a field
    whose instruction part is dropped, 0x14 switches to the result part
    which is kept, 0x15 closes the field.  Fields nest."""
    out: list[str] = []
    in_instr = 0  # depth of field-instruction context
    for c in text:
        if c == "\x13":
            in_instr += 1
        elif c == "\x14":
            if in_instr:
                in_instr -= 1
        elif c == "\x15":
            pass  # field end: result context just closes
        elif not in_instr:
            out.append(c)
    return "".join(out)


def doc_text(data: bytes) -> str:
    """Main-document text of a Word 97 binary file.

    Raises ValueError on non-doc/encrypted/corrupt input (the converter
    wrapper maps that to b'')."""
    cf = CompoundFile(data)
    word = cf.read_stream("WordDocument")
    if len(word) < 0x200:
        raise ValueError("WordDocument stream too short for a FIB")
    wident, _nfib = struct.unpack_from("<HH", word, 0)
    if wident != _FIB_WIDENT:
        raise ValueError("missing FIB magic (not a Word binary file)")
    flags = struct.unpack_from("<H", word, 0x0A)[0]
    if flags & 0x0100:  # fEncrypted
        raise ValueError("encrypted .doc not supported")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = cf.read_stream(table_name)
    ccp_text = struct.unpack_from("<I", word, _CCP_TEXT_OFFSET)[0]
    fc_clx, lcb_clx = struct.unpack_from("<II", word, _FC_CLX_OFFSET)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise ValueError("piece table (Clx) missing or out of bounds")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # Clx = Prc* then Pcdt(0x02 + lcb + PlcPcd)
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        cb = struct.unpack_from("<H", clx, pos + 1)[0]
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("malformed Clx: Pcdt marker not found")
    lcb_plc = struct.unpack_from("<I", clx, pos + 1)[0]
    plc = clx[pos + 5 : pos + 5 + lcb_plc]
    if len(plc) != lcb_plc or (lcb_plc - 4) % 12:
        raise ValueError("malformed PlcPcd")
    n = (lcb_plc - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out: list[str] = []
    for i in range(n):
        cp_len = cps[i + 1] - cps[i]
        fc_raw = struct.unpack_from("<I", plc, (n + 1) * 4 + i * 8 + 2)[0]
        if fc_raw & 0x40000000:  # fCompressed: 8-bit cp1252 at fc/2
            fc = (fc_raw & 0x3FFFFFFF) // 2
            piece = word[fc : fc + cp_len].decode("cp1252", "replace")
        else:
            fc = fc_raw & 0x3FFFFFFF
            piece = word[fc : fc + 2 * cp_len].decode("utf-16-le", "replace")
        if len(piece) != cp_len:
            raise ValueError("piece text out of stream bounds")
        out.append(piece)
    text = _strip_fields("".join(out)[:ccp_text])
    return "".join(_DOC_CHAR_MAP.get(c, c) for c in text)
