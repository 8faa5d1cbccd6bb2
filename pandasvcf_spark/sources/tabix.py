"""Tabix (.tbi) index reader — region-pruned access into BGZF VCFs.

The reference shells out to the tabix BINARY only to grab headers
(vcf_metadata.py:18) and ships `.tbi` sidecars with every gz fixture
(test_data/*.tbi) but never uses them for region queries — a region read
in the reference is a full scan + filter. Here the index is parsed
driver-side (public htslib tabix spec: BGZF-compressed "TBI\\1" payload,
UCSC-style R-tree binning + a 16 kb linear index) and a region query
decompresses ONLY the BGZF blocks its bins point at, then exact-filters.
At 100 GB-single-file scale that turns "scan everything for a 600 kb
window" into a few dozen block reads.

Virtual offsets: tabix addresses records as `coffset << 16 | uoffset` —
compressed byte offset of the containing BGZF block, plus the record's
byte offset inside that block's decompressed text. Chunk begin/end
voffsets always point at record boundaries, so slicing decompressed text
between two voffsets can never yield a partial line (a partial first
line could otherwise PARSE as a plausible row of the wrong chromosome —
which is why the region scan slices by voffset instead of using the
drop-first-line protocol of the full scan).
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass


@dataclass
class TabixIndex:
    """Parsed .tbi: per-reference bin→chunks maps + linear intervals."""

    names: list[str]  # reference sequence names, index == ref id
    bins: list[dict[int, list[tuple[int, int]]]]  # per ref: bin -> chunks
    intervals: list[list[int]]  # per ref: 16 kb linear index (voffsets)
    col_seq: int
    col_beg: int
    col_end: int
    meta_char: str
    preset: int  # format field & 0xffff (0 generic, 1 SAM, 2 VCF)

    def ref_id(self, seq: str) -> int | None:
        """Resolve a sequence name leniently: exact, chr-stripped, or
        chr-prefixed (the engine normalizes CHROM to chr-less, tabix
        indexes store whatever the file used)."""
        for cand in (seq, seq.removeprefix("chr"), "chr" + seq):
            if cand in self.names:
                return self.names.index(cand)
        return None


def read_tabix(path: str) -> TabixIndex:
    """Parse a .tbi file. BGZF is concatenated gzip members, so Python's
    gzip module decompresses the whole payload in one call."""
    with gzip.open(path, "rb") as fh:
        raw = fh.read()
    if raw[:4] != b"TBI\x01":
        raise ValueError(f"{path!r} is not a tabix index (bad magic)")
    n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm = struct.unpack_from(
        "<8i", raw, 4
    )
    off = 36
    names = [n.decode() for n in raw[off : off + l_nm].split(b"\x00") if n]
    off += l_nm
    bins: list[dict[int, list[tuple[int, int]]]] = []
    intervals: list[list[int]] = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", raw, off)
        off += 4
        bmap: dict[int, list[tuple[int, int]]] = {}
        for _ in range(n_bin):
            bin_no, n_chunk = struct.unpack_from("<Ii", raw, off)
            off += 8
            chunks = []
            for _ in range(n_chunk):
                beg, end = struct.unpack_from("<QQ", raw, off)
                off += 16
                chunks.append((beg, end))
            bmap[bin_no] = chunks
        (n_intv,) = struct.unpack_from("<i", raw, off)
        off += 4
        ioff = list(struct.unpack_from(f"<{n_intv}Q", raw, off))
        off += 8 * n_intv
        bins.append(bmap)
        intervals.append(ioff)
    return TabixIndex(
        names=names,
        bins=bins,
        intervals=intervals,
        col_seq=col_seq,
        col_beg=col_beg,
        col_end=col_end,
        meta_char=chr(meta),
        preset=fmt & 0xFFFF,
    )


#: Pseudo-bin holding per-reference mapped/unmapped stats, not chunks of
#: records (htslib convention) — never a candidate for region queries.
PSEUDO_BIN = 37450


def reg2bins(beg: int, end: int) -> list[int]:
    """UCSC binning: all bins whose span overlaps [beg, end) (0-based,
    half-open) in the 6-level, 512 Mb scheme tabix uses."""
    end = min(end, 1 << 29) - 1
    bins = [0]
    for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
    return bins


def region_chunks(
    idx: TabixIndex, ref_id: int, beg: int, end: int
) -> list[tuple[int, int]]:
    """Merged, sorted virtual-offset chunk ranges possibly containing
    records overlapping [beg, end) (0-based half-open). Chunks whose end
    precedes the linear index's lower bound for the region's first 16 kb
    window are pruned (they end before any record reaching `beg`)."""
    bmap = idx.bins[ref_id]
    ioff = idx.intervals[ref_id]
    window = beg >> 14
    min_off = ioff[window] if window < len(ioff) else (ioff[-1] if ioff else 0)
    chunks = [
        c
        for b in reg2bins(beg, end)
        if b != PSEUDO_BIN
        for c in bmap.get(b, ())
        if c[1] > min_off
    ]
    chunks.sort()
    merged: list[tuple[int, int]] = []
    for vbeg, vend in chunks:
        if merged and vbeg <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], vend))
        else:
            merged.append((vbeg, vend))
    return merged


def parse_region(region: str) -> tuple[str, int | None, int | None]:
    """'22' | '22:16050075-16654125' | 'chr22:16,050,075-16,654,125' →
    (seq, beg_1based, end_1based); a bare sequence means the whole
    contig (None bounds)."""
    seq, _, span = region.partition(":")
    if not span:
        return seq, None, None
    b, dash, e = span.replace(",", "").partition("-")
    beg = int(b)
    end = int(e) if dash and e else beg
    if beg < 1 or end < beg:
        raise ValueError(f"bad region {region!r}")
    return seq, beg, end
