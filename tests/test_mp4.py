"""ISO-BMFF sample-table codec (multimodal/mp4.py): encode a minimal
conforming MP4, parse back the per-frame byte-range index with the real
stsc chunk-run algorithm, and the Spark explode that feeds range-read
decode tasks."""

import hashlib
import struct

import pytest

from pgferry_spark.multimodal.mp4 import (
    MDAT_DATA_OFFSET,
    encode_mp4_sampled,
    parse_mp4_samples,
)


def _samples(key, n):
    return [
        (hashlib.md5(f"{key}:{i}:body".encode()).digest() * 6)[
            : 16 + hashlib.md5(f"{key}:{i}".encode()).digest()[0] % 64
        ]
        for i in range(n)
    ]


class TestRoundTrip:
    def test_offsets_sizes_times_exact(self):
        samples = _samples(7, 5)
        enc = encode_mp4_sampled(samples)
        idx = parse_mp4_samples(enc)
        assert idx["n_samples"] == 5
        assert idx["timescale"] == 1000 and idx["duration"] == 200
        off = MDAT_DATA_OFFSET
        for i, (o, s, t) in enumerate(idx["samples"]):
            assert (o, s, t) == (off, len(samples[i]), i * 40)
            # the index points at the REAL bytes, not just plausible math
            assert enc[o : o + s] == samples[i]
            off += s

    def test_single_sample(self):
        enc = encode_mp4_sampled([b"x" * 32])
        idx = parse_mp4_samples(enc)
        assert idx["samples"] == [(MDAT_DATA_OFFSET, 32, 0)]

    def test_legacy_meta_parser_reads_generated_file(self):
        from pgferry_spark.multimodal.ops import parse_mp4_meta

        enc = encode_mp4_sampled(_samples(3, 4), sample_delta=500)
        meta = parse_mp4_meta(enc)
        assert meta["major_brand"] == "isom"
        assert meta["duration_ms"] == 2000


class TestStscRuns:
    def test_multi_chunk_layout_parses(self):
        # hand-edit the generated single-chunk file into a 2-chunk layout:
        # chunk 1 holds 2 samples, chunk 2 the rest — exercises the stsc
        # run algorithm (first run [chunk1], second run [chunk2..end])
        samples = [b"a" * 10, b"b" * 12, b"c" * 14, b"d" * 16]
        enc = bytearray(encode_mp4_sampled(samples))
        # stsc: 2 runs
        i = bytes(enc).find(b"stsc")
        new_stsc = (
            struct.pack(">I", 40) + b"stsc" + bytes([0, 0, 0, 0])
            + struct.pack(">I", 2)
            + struct.pack(">III", 1, 2, 1)   # chunk 1: 2 samples
            + struct.pack(">III", 2, 2, 1)   # chunks 2..: 2 samples
        )
        # stco: 2 chunk bases (contiguous here, so chunk 2 starts after
        # chunk 1's two samples)
        j = bytes(enc).find(b"stco")
        base1 = MDAT_DATA_OFFSET
        base2 = MDAT_DATA_OFFSET + 10 + 12
        new_stco = (
            struct.pack(">I", 24) + b"stco" + bytes([0, 0, 0, 0])
            + struct.pack(">I", 2) + struct.pack(">II", base1, base2)
        )
        # rebuild the file with the replacement boxes (box sizes differ,
        # so splice rather than overwrite; enclosing sizes need fixing)
        old_stsc_len = struct.unpack(">I", enc[i - 4 : i])[0]
        old_stco_len = struct.unpack(">I", enc[j - 4 : j])[0]
        out = (
            bytes(enc[: i - 4]) + new_stsc
            + bytes(enc[i - 4 + old_stsc_len : j - 4]) + new_stco
            + bytes(enc[j - 4 + old_stco_len :])
        )
        delta = (len(new_stsc) - old_stsc_len) + (len(new_stco) - old_stco_len)
        out = bytearray(out)
        # patch enclosing box sizes (moov > trak > mdia > minf > stbl)
        for btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            k = bytes(out).find(btype)
            size = struct.unpack(">I", out[k - 4 : k])[0]
            struct.pack_into(">I", out, k - 4, size + delta)
        idx = parse_mp4_samples(bytes(out))
        assert [(o, s) for o, s, _ in idx["samples"]] == [
            (base1, 10), (base1 + 10, 12), (base2, 14), (base2 + 14, 16),
        ]


class TestRejects:
    def test_not_bmff(self):
        with pytest.raises(ValueError):
            parse_mp4_samples(b"\x00" * 40)

    def test_empty_samples_rejected(self):
        with pytest.raises(ValueError):
            encode_mp4_sampled([])

    def test_range_outside_payload_rejected(self):
        enc = bytearray(encode_mp4_sampled([b"x" * 20]))
        # stco body: type(4) + ver/flags(4) + entry_count(4) + base(4)
        i = bytes(enc).find(b"stco")
        struct.pack_into(">I", enc, i + 12, 10 ** 6)  # chunk base past EOF
        with pytest.raises(ValueError):
            parse_mp4_samples(bytes(enc))

    def test_sample_count_mismatch_rejected(self):
        enc = bytearray(encode_mp4_sampled([b"x" * 20, b"y" * 20]))
        # stsc body: type(4) + ver/flags(4) + entry_count(4) +
        # (first_chunk, samples_per_chunk, desc)(12)
        i = bytes(enc).find(b"stsc")
        struct.pack_into(">I", enc, i + 16, 1)  # chunk map covers 1 sample
        with pytest.raises(ValueError):
            parse_mp4_samples(bytes(enc))

    # --- allocation-bound hostile payloads (ADVICE r6): a tiny crafted
    # header must NOT provoke multi-GB allocations or unbounded loops; it
    # must raise ValueError BEFORE allocating, like jpeg.py's caps. Each
    # test completes in milliseconds iff the bound fires first.

    def _patch(self, marker: bytes, field_off: int, value: int) -> bytes:
        enc = bytearray(encode_mp4_sampled([b"x" * 8]))
        i = bytes(enc).find(marker)
        struct.pack_into(">I", enc, i + field_off, value)
        return bytes(enc)

    def test_huge_uniform_stsz_bounded(self):
        # stsz body: type(4) ver/flags(4) uniform(4) count(4): declare
        # uniform=8 x 2^31 samples in a <1 KB payload
        enc = bytearray(encode_mp4_sampled([b"x" * 8]))
        i = bytes(enc).find(b"stsz")
        struct.pack_into(">II", enc, i + 8, 8, 2 ** 31)
        with pytest.raises(ValueError, match="payload"):
            parse_mp4_samples(bytes(enc))

    def test_huge_stsz_table_count_bounded(self):
        with pytest.raises(ValueError, match="stsz"):
            parse_mp4_samples(self._patch(b"stsz", 12, 2 ** 31))

    def test_huge_stco_count_bounded(self):
        # stco count lies: table would need 16 GB of entries. The stco
        # bound raises, the co64 fallback finds no box -> ValueError.
        with pytest.raises(ValueError):
            parse_mp4_samples(self._patch(b"stco", 8, 2 ** 32 - 1))

    def test_huge_stts_count_bounded(self):
        # stts entry_count lies (declares 2^31 8-byte entries)
        with pytest.raises(ValueError, match="stts"):
            parse_mp4_samples(self._patch(b"stts", 8, 2 ** 31))

    def test_huge_stts_repeat_capped(self):
        # stts cnt (samples covered by one entry) declares 2^31 repeats;
        # the expansion must cap at n_samples, not loop 2^31 times. A
        # correct parse still succeeds (cnt >= n_samples is conforming).
        enc = bytearray(encode_mp4_sampled([b"x" * 8]))
        i = bytes(enc).find(b"stts")
        struct.pack_into(">I", enc, i + 12, 2 ** 31)  # cnt field
        idx = parse_mp4_samples(bytes(enc))
        assert idx["n_samples"] == 1 and len(idx["samples"]) == 1

    def test_zero_first_chunk_rejected(self):
        with pytest.raises(ValueError, match="1-based"):
            parse_mp4_samples(self._patch(b"stsc", 12, 0))

    def test_huge_stsc_run_count_bounded(self):
        with pytest.raises(ValueError, match="stsc"):
            parse_mp4_samples(self._patch(b"stsc", 8, 2 ** 31))


class TestSparkWiring:
    def test_frame_index_law_on_spark(self, spark):
        from pgferry_spark.multimodal.ops import (
            attach_real_videos,
            video_frame_index,
        )

        base = spark.createDataFrame([(i,) for i in range(10)], "doc_id: long")
        rows = video_frame_index(attach_real_videos(base, "doc_id")).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["media_id"], []).append(r)
        for c in range(10):
            n = 3 + c % 5
            frames = sorted(by_doc[c], key=lambda r: r["frame_idx"])
            assert len(frames) == n
            off = MDAT_DATA_OFFSET
            for i, r in enumerate(frames):
                size = 16 + hashlib.md5(f"{c}:{i}".encode()).digest()[0] % 64
                assert (r["byte_offset"], r["byte_len"], r["t_ms"]) == (
                    off, size, i * 40,
                )
                off += size
