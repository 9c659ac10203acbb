"""ISO-BMFF (MP4) sample-table container codec — pure stdlib.

The video sibling of :mod:`pgferry_spark.multimodal.jpeg`'s "real bytes,
oracle-certifiable" pattern, scoped to what a 100 TB media pipeline
actually needs from the CONTAINER: the sample table.  ``moov/trak/mdia/
minf/stbl`` carries, per frame, its exact byte range inside ``mdat``
(``stsz`` sizes + ``stsc`` chunk map + ``stco`` offsets) and its timing
(``stts``) — which is precisely the index a distributed pipeline uses to
turn "decode frame k of a 40 GB file" into a bounded RANGE READ from
object storage, per task, with no full-file scan.  Frame PIXEL decode
(H.264 et al.) stays out of scope and quarantined, exactly like
progressive JPEG.

``encode_mp4_sampled`` writes a spec-shaped minimal file (ftyp, mdat
first — so sample offsets are an arithmetic function of the sizes —
then moov with the full stbl); ``parse_mp4_samples`` walks any
conforming file's box tree and reconstructs the per-sample
``(offset, size, t_ms)`` index with the REAL stsc chunk-run algorithm,
validating every range against the payload.
"""

from __future__ import annotations

import struct

FTYP = (
    struct.pack(">I", 20) + b"ftyp" + b"isom" + struct.pack(">I", 0) + b"isom"
)
# sample offsets = len(FTYP) + 8-byte mdat header + cumulative sizes
MDAT_DATA_OFFSET = len(FTYP) + 8


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def encode_mp4_sampled(
    sample_data: list[bytes],
    timescale: int = 1000,
    sample_delta: int = 40,
) -> bytes:
    """Minimal conforming MP4: ``ftyp`` + ``mdat`` (samples
    concatenated) + ``moov`` whose ``stbl`` indexes every sample — one
    chunk holding all samples, uniform ``stts`` delta.  The mdat-first
    layout makes each sample's absolute offset ``MDAT_DATA_OFFSET +
    Σ earlier sizes`` — an arithmetic law an ANSI oracle can replay."""
    if not sample_data:
        raise ValueError("need at least one sample")
    sizes = [len(s) for s in sample_data]
    n = len(sizes)
    duration = n * sample_delta

    mdat = _box(b"mdat", b"".join(sample_data))

    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration)   # times, scale, dur
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)      # rate, volume, rsvd
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),                            # next track id
    )
    tkhd = _full(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)        # track id 1
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0),                        # width, height
    )
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),                   # 'und' language
    )
    hdlr = _full(
        b"hdlr", 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"pipe\x00",
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 0))          # 0 descriptions
    stts = _full(b"stts", 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    offsets = []
    off = MDAT_DATA_OFFSET
    for s in sizes:
        offsets.append(off)
        off += s
    # one chunk: stco records the chunk's start (= first sample's offset)
    stco = _full(b"stco", 0, struct.pack(">II", 1, offsets[0]))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return FTYP + mdat + moov


def _walk(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for each box in a range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        btype = payload[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at {pos}")
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield btype, pos + header, pos + size
        pos += size


def _find(payload: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk(payload, start, end):
        if t == btype:
            return b, e
    raise ValueError(f"missing {btype.decode('ascii', 'replace')} box")


def parse_mp4_samples(payload: bytes) -> dict:
    """Reconstruct the per-sample byte-range index from the stbl of the
    FIRST track: the real ``stsc`` chunk-run algorithm (each stsc entry
    covers chunks ``[first_chunk, next.first_chunk)`` with
    ``samples_per_chunk`` each; offsets inside a chunk accumulate
    ``stsz`` sizes from the chunk's ``stco`` base).  Every range is
    validated against the payload length.  Returns ``{"timescale",
    "duration", "n_samples", "samples": [(offset, size, t_units), ...]}``
    with ``t_units`` the stts-accumulated start time in timescale
    units."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no ftyp box)")
    moov_b, moov_e = _find(payload, 0, len(payload), b"moov")
    trak_b, trak_e = _find(payload, moov_b, moov_e, b"trak")
    mdia_b, mdia_e = _find(payload, trak_b, trak_e, b"mdia")
    mdhd_b, _ = _find(payload, mdia_b, mdia_e, b"mdhd")
    version = payload[mdhd_b]
    if version == 1:
        timescale, duration = struct.unpack(
            ">IQ", payload[mdhd_b + 20 : mdhd_b + 32]
        )
    else:
        timescale, duration = struct.unpack(
            ">II", payload[mdhd_b + 12 : mdhd_b + 20]
        )
    minf_b, minf_e = _find(payload, mdia_b, mdia_e, b"minf")
    stbl_b, stbl_e = _find(payload, minf_b, minf_e, b"stbl")

    def full_body(btype: bytes) -> bytes:
        b, e = _find(payload, stbl_b, stbl_e, btype)
        return payload[b + 4 : e]  # skip version/flags

    # stsz: uniform size or per-sample table.  ALL declared counts are
    # bounded against len(payload) BEFORE any allocation (a crafted header
    # can declare up to 2^32 samples in 8 bytes; the sibling JPEG decoder
    # caps the same way with its 64 Mpx / entropy-bits bounds) — every
    # sample's bytes must live inside the payload, so total declared bytes
    # and table sizes are hard ceilings.
    stsz = full_body(b"stsz")
    uniform, n_samples = struct.unpack(">II", stsz[:8])
    if uniform:
        if uniform * n_samples > len(payload):
            raise ValueError(
                f"stsz declares {n_samples} samples x {uniform} B "
                f"> payload {len(payload)} B"
            )
        sizes = [uniform] * n_samples
    else:
        if len(stsz) < 8 + 4 * n_samples:
            raise ValueError("stsz table shorter than sample count")
        sizes = list(struct.unpack(f">{n_samples}I", stsz[8 : 8 + 4 * n_samples]))

    # stco / co64 chunk bases (each table entry needs 4/8 payload bytes —
    # bound n_chunks before building the list)
    try:
        stco = full_body(b"stco")
        (n_chunks,) = struct.unpack(">I", stco[:4])
        if len(stco) < 4 + 4 * n_chunks:
            raise ValueError("stco table shorter than chunk count")
        bases = list(struct.unpack(f">{n_chunks}I", stco[4 : 4 + 4 * n_chunks]))
    except ValueError:
        co64 = full_body(b"co64")
        (n_chunks,) = struct.unpack(">I", co64[:4])
        if len(co64) < 4 + 8 * n_chunks:
            raise ValueError("co64 table shorter than chunk count")
        bases = list(struct.unpack(f">{n_chunks}Q", co64[4 : 4 + 8 * n_chunks]))

    # stsc runs -> samples-per-chunk for every chunk
    stsc = full_body(b"stsc")
    (n_runs,) = struct.unpack(">I", stsc[:4])
    if len(stsc) < 4 + 12 * n_runs:
        raise ValueError("stsc table shorter than run count")
    runs = [
        struct.unpack(">III", stsc[4 + 12 * i : 16 + 12 * i])
        for i in range(n_runs)
    ]
    spc = [0] * n_chunks
    for i, (first, per, _desc) in enumerate(runs):
        if first < 1:
            raise ValueError("stsc first_chunk is 1-based, got 0")
        last = runs[i + 1][0] - 1 if i + 1 < n_runs else n_chunks
        for c in range(first - 1, last):
            if c >= n_chunks:
                raise ValueError("stsc run exceeds chunk count")
            spc[c] = per

    # stts -> per-sample start times: each 8-byte entry may declare a
    # 2^32 repeat count, so the expansion is capped at n_samples (itself
    # already payload-bounded) instead of trusting the declared counts.
    stts = full_body(b"stts")
    (n_tt,) = struct.unpack(">I", stts[:4])
    if len(stts) < 4 + 8 * n_tt:
        raise ValueError("stts table shorter than entry count")
    times = []
    t = 0
    for i in range(n_tt):
        cnt, delta = struct.unpack(">II", stts[4 + 8 * i : 12 + 8 * i])
        take = min(cnt, n_samples - len(times))
        for _ in range(take):
            times.append(t)
            t += delta
        if len(times) >= n_samples:
            break
    if len(times) < n_samples:
        raise ValueError("stts covers fewer samples than stsz")

    samples = []
    si = 0
    for c in range(n_chunks):
        off = bases[c]
        for _ in range(spc[c]):
            if si >= n_samples:
                break
            size = sizes[si]
            if off + size > len(payload):
                raise ValueError(
                    f"sample {si} range [{off}, {off + size}) outside payload"
                )
            samples.append((off, size, times[si]))
            off += size
            si += 1
    if si != n_samples:
        raise ValueError(
            f"chunk map places {si} samples, stsz declares {n_samples}"
        )
    return {
        "timescale": timescale,
        "duration": duration,
        "n_samples": n_samples,
        "samples": samples,
    }
