"""TIFF stack tests: writer/reader roundtrip, cv2-written LZW files, OME."""

import cv2 as cv
import numpy as np
import pytest

from microaligner_tpu._native import codec
from microaligner_tpu.io import MemmapWriter, TiffFile, read_tiff_page
from microaligner_tpu.io.ome import str_to_xml, extract_pixels_info, collect_info_from_ome


def _ome(size_c=2, size_z=3, size_y=40, size_x=50, dtype="uint16", channels=("DAPI", "Cy5")):
    chs = "".join(
        f'<Channel ID="Channel:0:{i}" Name="{n}" SamplesPerPixel="1"/>'
        for i, n in enumerate(channels)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0" Name="test">'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="{dtype}" '
        f'SizeT="1" SizeC="{size_c}" SizeZ="{size_z}" SizeY="{size_y}" SizeX="{size_x}" '
        'PhysicalSizeX="0.3" PhysicalSizeXUnit="um" PhysicalSizeY="0.3" PhysicalSizeYUnit="um">'
        + chs
        + "</Pixels></Image></OME>"
    )


class TestWriterReaderRoundtrip:
    def test_roundtrip_u16(self, tmp_path, rng):
        data = rng.integers(0, 65535, size=(1, 2, 3, 40, 50)).astype(np.uint16)
        path = tmp_path / "out.ome.tif"
        mm = MemmapWriter(path, data.shape, np.uint16, description=_ome())
        for c in range(2):
            for z in range(3):
                mm[0, c, z] = data[0, c, z]
        mm.flush()
        mm.close()

        with TiffFile(path) as tf:
            assert len(tf.pages) == 6
            assert tf.ome_metadata is not None
            s = tf.series[0]
            assert s.shape == (2, 3, 40, 50)
            assert s.axes == "CZYX"
            assert s.dtype == np.uint16
            for p in range(6):
                c, z = p // 3, p % 3
                np.testing.assert_array_equal(tf.read_page(p), data[0, c, z])

    def test_read_tiff_page_helper(self, tmp_path, rng):
        data = rng.integers(0, 255, size=(1, 1, 2, 30, 30)).astype(np.uint8)
        path = tmp_path / "x.tif"
        mm = MemmapWriter(path, data.shape, np.uint8, description=_ome(1, 2, 30, 30, "uint8", ("DAPI",)))
        mm[0, 0, 0] = data[0, 0, 0]
        mm[0, 0, 1] = data[0, 0, 1]
        mm.close()
        np.testing.assert_array_equal(read_tiff_page(path, 1), data[0, 0, 1])

    def test_float32_roundtrip(self, tmp_path, rng):
        data = rng.random((1, 1, 1, 20, 20)).astype(np.float32)
        path = tmp_path / "f.tif"
        mm = MemmapWriter(path, data.shape, np.float32)
        mm[0, 0, 0] = data[0, 0, 0]
        mm.close()
        np.testing.assert_array_equal(read_tiff_page(path, 0), data[0, 0, 0])


class TestReadForeignTiffs:
    def test_cv2_lzw_u16(self, tmp_path, rng):
        img = rng.integers(0, 65535, size=(64, 80)).astype(np.uint16)
        p = str(tmp_path / "cv.tif")
        cv.imwrite(p, img)  # cv2 writes LZW + horizontal predictor
        with TiffFile(p) as tf:
            assert tf.pages[0].compression == 5
            np.testing.assert_array_equal(tf.read_page(0), img)

    def test_cv2_lzw_u8(self, tmp_path, rng):
        img = rng.integers(0, 255, size=(100, 90)).astype(np.uint8)
        p = str(tmp_path / "cv8.tif")
        cv.imwrite(p, img)
        with TiffFile(p) as tf:
            np.testing.assert_array_equal(tf.read_page(0), img)

    def test_native_codec_built(self):
        assert codec.native, "C++ TIFF codec failed to build"

    def test_zstd_strip_roundtrip(self, tmp_path, rng):
        """zstd-compressed classic TIFF (COMPRESSION 50000, as written by
        tifffile/imagecodecs) decodes exactly.  The fixture is hand-built so
        the test needs no external TIFF writer."""
        assert codec.zstd_available, "libzstd missing on this system"
        img = rng.integers(0, 65535, size=(33, 47)).astype(np.uint16)
        comp = codec.zstd_encode(img.tobytes())

        import struct

        def entry(tag, typ, count, value):
            return struct.pack("<HHI4s", tag, typ, count, value)

        data_off = 8
        ifd_off = data_off + len(comp)
        entries = [
            entry(256, 3, 1, struct.pack("<I", img.shape[1])),   # ImageWidth
            entry(257, 3, 1, struct.pack("<I", img.shape[0])),   # ImageLength
            entry(258, 3, 1, struct.pack("<I", 16)),             # BitsPerSample
            entry(259, 3, 1, struct.pack("<I", 50000)), # Compression
            entry(262, 3, 1, struct.pack("<I", 1)),              # Photometric
            entry(273, 4, 1, struct.pack("<I", data_off)),       # StripOffsets
            entry(277, 3, 1, struct.pack("<I", 1)),              # SamplesPerPixel
            entry(278, 3, 1, struct.pack("<I", img.shape[0])),   # RowsPerStrip
            entry(279, 4, 1, struct.pack("<I", len(comp))),      # StripByteCounts
        ]
        buf = struct.pack("<2sHI", b"II", 42, ifd_off) + comp
        buf += struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
        p = tmp_path / "z.tif"
        p.write_bytes(buf)
        with TiffFile(str(p)) as tf:
            assert tf.pages[0].compression == 50000
            np.testing.assert_array_equal(tf.read_page(0), img)

    def test_lzma_strip_roundtrip(self, tmp_path, rng):
        """LZMA-compressed classic TIFF (COMPRESSION 34925, as written by
        tifffile via lzma.compress) decodes exactly; stdlib lzma handles the
        xz container."""
        import lzma
        import struct

        img = rng.integers(0, 65535, size=(29, 41)).astype(np.uint16)
        comp = lzma.compress(img.tobytes())

        def entry(tag, typ, count, value):
            return struct.pack("<HHI4s", tag, typ, count, value)

        data_off = 8
        ifd_off = data_off + len(comp)
        entries = [
            entry(256, 3, 1, struct.pack("<I", img.shape[1])),
            entry(257, 3, 1, struct.pack("<I", img.shape[0])),
            entry(258, 3, 1, struct.pack("<I", 16)),
            entry(259, 3, 1, struct.pack("<I", 34925)),
            entry(262, 3, 1, struct.pack("<I", 1)),
            entry(273, 4, 1, struct.pack("<I", data_off)),
            entry(277, 3, 1, struct.pack("<I", 1)),
            entry(278, 3, 1, struct.pack("<I", img.shape[0])),
            entry(279, 4, 1, struct.pack("<I", len(comp))),
        ]
        buf = struct.pack("<2sHI", b"II", 42, ifd_off) + comp
        buf += struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
        p = tmp_path / "x.tif"
        p.write_bytes(buf)
        with TiffFile(str(p)) as tf:
            assert tf.pages[0].compression == 34925
            np.testing.assert_array_equal(tf.read_page(0), img)

    @staticmethod
    def _tiff_single_strip(comp_bytes, shape, compression, bits=8, extra_entries=()):
        import struct

        def entry(tag, typ, count, value):
            return struct.pack("<HHI4s", tag, typ, count, value)

        data_off = 8
        ifd_off = data_off + len(comp_bytes)
        entries = [
            entry(256, 3, 1, struct.pack("<I", shape[1])),
            entry(257, 3, 1, struct.pack("<I", shape[0])),
            entry(258, 3, 1, struct.pack("<I", bits)),
            entry(259, 3, 1, struct.pack("<I", compression)),
            entry(262, 3, 1, struct.pack("<I", 1)),
            entry(273, 4, 1, struct.pack("<I", data_off)),
            entry(277, 3, 1, struct.pack("<I", 1)),
            entry(278, 3, 1, struct.pack("<I", shape[0])),
            entry(279, 4, 1, struct.pack("<I", len(comp_bytes))),
        ] + list(extra_entries)
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
        buf = struct.pack("<2sHI", b"II", 42, ifd_off) + comp_bytes
        buf += struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
        return buf

    def test_jpeg_strip_full_stream(self, tmp_path, rng):
        """Compression-7 strip holding a complete JPEG stream decodes to the
        same pixels cv2 decodes from those bytes."""
        import cv2 as cv

        img = cv.GaussianBlur(
            rng.integers(0, 255, size=(48, 64)).astype(np.uint8), (0, 0), 2.0
        )
        ok, enc = cv.imencode(".jpg", img, [cv.IMWRITE_JPEG_QUALITY, 95])
        assert ok
        stream = enc.tobytes()
        golden = cv.imdecode(np.frombuffer(stream, np.uint8), cv.IMREAD_GRAYSCALE)

        p = tmp_path / "j.tif"
        p.write_bytes(self._tiff_single_strip(stream, img.shape, 7))
        with TiffFile(str(p)) as tf:
            assert tf.pages[0].compression == 7
            np.testing.assert_array_equal(tf.read_page(0), golden)

    def test_jpeg_strip_with_jpegtables(self, tmp_path, rng):
        """Abbreviated JPEG stream + JPEGTables tag (tag 347): the reader
        splices the tables back in (how tifffile/libtiff write multi-strip
        JPEG TIFFs)."""
        import struct

        import cv2 as cv

        img = cv.GaussianBlur(
            rng.integers(0, 255, size=(40, 56)).astype(np.uint8), (0, 0), 2.0
        )
        ok, enc = cv.imencode(".jpg", img, [cv.IMWRITE_JPEG_QUALITY, 95])
        assert ok
        stream = enc.tobytes()
        golden = cv.imdecode(np.frombuffer(stream, np.uint8), cv.IMREAD_GRAYSCALE)

        # split DQT/DHT segments out of the full stream into a tables stream
        tables_segs, rest = [], []
        i = 2
        while i < len(stream):
            assert stream[i] == 0xFF
            marker = stream[i + 1]
            if marker == 0xDA:  # SOS: entropy data to EOI stays in the block
                rest.append(stream[i:])
                break
            seg_len = struct.unpack(">H", stream[i + 2 : i + 4])[0]
            seg = stream[i : i + 2 + seg_len]
            (tables_segs if marker in (0xDB, 0xC4) else rest).append(seg)
            i += 2 + seg_len
        tables = b"\xff\xd8" + b"".join(tables_segs) + b"\xff\xd9"
        block = b"\xff\xd8" + b"".join(rest)

        def entry(tag, typ, count, value):
            return struct.pack("<HHI4s", tag, typ, count, value)

        # tables go out-of-line after the IFD
        data_off = 8
        ifd_off = data_off + len(block)
        n_entries = 10
        tables_off = ifd_off + 2 + n_entries * 12 + 4
        extra = [entry(347, 7, len(tables), struct.pack("<I", tables_off))]
        buf = self._tiff_single_strip(block, img.shape, 7, extra_entries=extra)
        buf += tables
        p = tmp_path / "jt.tif"
        p.write_bytes(buf)
        with TiffFile(str(p)) as tf:
            assert tf.pages[0].jpeg_tables == tables
            np.testing.assert_array_equal(tf.read_page(0), golden)

    def test_jpeg_tiled_page(self, tmp_path, rng):
        """Tiled layout + compression 7: each tile a complete JPEG stream,
        edge tiles MCU-padded and cropped on paste."""
        import struct

        import cv2 as cv

        h, w, tl, tw = 70, 90, 48, 64  # 2x2 tiles, ragged edges
        img = cv.GaussianBlur(
            rng.integers(0, 255, size=(h, w)).astype(np.uint8), (0, 0), 2.0
        )
        tiles, streams, goldens = [], [], {}
        pad = np.zeros((2 * tl, 2 * tw), np.uint8)
        pad[:h, :w] = img
        for ty in range(2):
            for tx in range(2):
                t = pad[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                ok, enc = cv.imencode(".jpg", t, [cv.IMWRITE_JPEG_QUALITY, 95])
                assert ok
                streams.append(enc.tobytes())
                goldens[(ty, tx)] = cv.imdecode(
                    np.frombuffer(streams[-1], np.uint8), cv.IMREAD_GRAYSCALE
                )

        def entry(tag, typ, count, value):
            return struct.pack("<HHI4s", tag, typ, count, value)

        data_off = 8
        offsets, off = [], data_off
        for s in streams:
            offsets.append(off)
            off += len(s)
        ifd_off = off
        n_entries = 10
        arrays_off = ifd_off + 2 + n_entries * 12 + 4
        entries = [
            entry(256, 3, 1, struct.pack("<I", w)),
            entry(257, 3, 1, struct.pack("<I", h)),
            entry(258, 3, 1, struct.pack("<I", 8)),
            entry(259, 3, 1, struct.pack("<I", 7)),
            entry(262, 3, 1, struct.pack("<I", 1)),
            entry(277, 3, 1, struct.pack("<I", 1)),
            entry(322, 3, 1, struct.pack("<I", tw)),   # TileWidth
            entry(323, 3, 1, struct.pack("<I", tl)),   # TileLength
            entry(324, 4, 4, struct.pack("<I", arrays_off)),       # TileOffsets
            entry(325, 4, 4, struct.pack("<I", arrays_off + 16)),  # TileByteCounts
        ]
        buf = struct.pack("<2sHI", b"II", 42, ifd_off) + b"".join(streams)
        buf += struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
        buf += struct.pack("<4I", *offsets)
        buf += struct.pack("<4I", *[len(s) for s in streams])
        p = tmp_path / "jtile.tif"
        p.write_bytes(buf)

        expect = np.empty((h, w), np.uint8)
        for ty in range(2):
            for tx in range(2):
                ys = min(tl, h - ty * tl)
                xs = min(tw, w - tx * tw)
                expect[ty * tl : ty * tl + ys, tx * tw : tx * tw + xs] = goldens[
                    (ty, tx)
                ][:ys, :xs]
        with TiffFile(str(p)) as tf:
            assert tf.pages[0].is_tiled
            np.testing.assert_array_equal(tf.read_page(0), expect)

    def test_jpeg2000_u16_strip_lossless(self, tmp_path, rng):
        """Compression 34712: a lossless uint16 JP2 stream round-trips
        bit-exact (the JPEG-family mode microscopy archives actually use)."""
        import cv2 as cv

        img = rng.integers(0, 65535, size=(48, 64)).astype(np.uint16)
        ok, enc = cv.imencode(".jp2", img, [cv.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
        assert ok
        p = tmp_path / "j2k.tif"
        p.write_bytes(self._tiff_single_strip(enc.tobytes(), img.shape, 34712, bits=16))
        with TiffFile(str(p)) as tf:
            assert tf.pages[0].compression == 34712
            np.testing.assert_array_equal(tf.read_page(0), img)

    def test_jpeg2000_raw_codestream_aperio(self, tmp_path, rng):
        """Aperio tags (33003) store a RAW J2K codestream (no JP2 container);
        the decoder must accept it."""
        import cv2 as cv

        img = rng.integers(0, 65535, size=(40, 56)).astype(np.uint16)
        ok, enc = cv.imencode(".jp2", img, [cv.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
        assert ok
        blob = enc.tobytes()
        i = blob.find(b"\xff\x4f\xff\x51")  # SOC..SIZ: codestream start
        assert i > 0
        p = tmp_path / "aperio.tif"
        p.write_bytes(self._tiff_single_strip(blob[i:], img.shape, 33003, bits=16))
        with TiffFile(str(p)) as tf:
            np.testing.assert_array_equal(tf.read_page(0), img)

    def test_webp_strip(self, tmp_path, rng):
        """Compression 50001: WebP-compressed strip decodes to cv2's own
        decode of the same bytes (WebP is 8-bit; gray stored via its RGB)."""
        import cv2 as cv

        img = cv.GaussianBlur(
            rng.integers(0, 255, size=(48, 64)).astype(np.uint8), (0, 0), 2.0
        )
        ok, enc = cv.imencode(".webp", img, [cv.IMWRITE_WEBP_QUALITY, 101])  # >100 = lossless
        assert ok
        golden = cv.imdecode(np.frombuffer(enc.tobytes(), np.uint8), cv.IMREAD_UNCHANGED)
        if golden.ndim == 3:
            golden = golden[..., 0]
        p = tmp_path / "w.tif"
        p.write_bytes(self._tiff_single_strip(enc.tobytes(), img.shape, 50001))
        with TiffFile(str(p)) as tf:
            assert tf.pages[0].compression == 50001
            np.testing.assert_array_equal(tf.read_page(0), golden)
            np.testing.assert_array_equal(tf.read_page(0), img)  # lossless mode

    def test_old_style_jpeg_interchange_format(self, tmp_path, rng):
        """Compression 6 with JPEGInterchangeFormat/-Length (tags 513/514):
        the whole-page JIF stream decodes; strip entries are ignored."""
        import struct

        import cv2 as cv

        img = cv.GaussianBlur(
            rng.integers(0, 255, size=(48, 64)).astype(np.uint8), (0, 0), 2.0
        )
        ok, enc = cv.imencode(".jpg", img, [cv.IMWRITE_JPEG_QUALITY, 95])
        assert ok
        stream = enc.tobytes()
        golden = cv.imdecode(np.frombuffer(stream, np.uint8), cv.IMREAD_GRAYSCALE)

        def entry(tag, typ, count, value):
            return struct.pack("<HHI4s", tag, typ, count, value)

        extra = [
            entry(513, 4, 1, struct.pack("<I", 8)),  # stream sits at data_off=8
            entry(514, 4, 1, struct.pack("<I", len(stream))),
        ]
        p = tmp_path / "oldj.tif"
        p.write_bytes(self._tiff_single_strip(stream, img.shape, 6, extra_entries=extra))
        with TiffFile(str(p)) as tf:
            assert tf.pages[0].compression == 6
            assert tf.pages[0].jpeg_if_offset == 8
            np.testing.assert_array_equal(tf.read_page(0), golden)

    def test_old_style_jpeg_without_jif_raises(self, tmp_path, rng):
        img_bytes = b"\x00" * 64
        p = tmp_path / "oldj_bad.tif"
        p.write_bytes(self._tiff_single_strip(img_bytes, (8, 8), 6))
        with TiffFile(str(p)) as tf:
            with pytest.raises(ValueError, match="JPEGInterchangeFormat"):
                tf.read_page(0)


class TestOmeParsing:
    def test_pixels_info(self):
        info = extract_pixels_info(str_to_xml(_ome()))
        assert info["SizeC"] == 2 and info["SizeZ"] == 3
        assert info["PhysicalSizeX"] == 0.3

    def test_ref_channel_resolution(self):
        info = collect_info_from_ome("DAPI", str_to_xml(_ome(channels=("c01 DAPI-1", "c01 Cy5-2"))))
        assert info["ref_ch_ids"] == [0]

    def test_missing_ref_channel_raises(self):
        with pytest.raises(ValueError, match="Incorrect reference channel"):
            collect_info_from_ome("GFP", str_to_xml(_ome()))
