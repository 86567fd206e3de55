"""Cross-walker quarantine fuzz: every byte-level walker in the repo
must, on ARBITRARY input, either parse cleanly or raise ValueError
(via NotImplementedError only where a seam is documented) — never
struct.error / IndexError / KeyError / zlib.error / infinite loop.
This is the 'corruption quarantines, never kills the task' contract
checked at its root, for every format family at once.

Three input classes per walker: pure random bytes, a VALID fixture
with one random byte flipped, and a valid fixture truncated at a
random point — the three corruptions real storage actually produces.
"""

from __future__ import annotations

import random
import zlib

import pytest


def _walkers():
    """(name, parse_fn, fixture_fn) for every byte-level walker."""
    from user_behavior_spark_pipeline_spark.operators import (
        arrow_ipc,
        avro,
        demux,
        lake,
        mkv,
        multimodal,
        pdf,
        protowire,
        tensors,
        warc,
        webdataset,
    )

    return [
        ("warc", lambda b: warc.warc_parse(b),
         lambda d: warc.synth_warc_bytes(d, "text")),
        ("mp4", lambda b: demux.mp4_demux(b),
         lambda d: demux.synth_mp4_bytes(d, 5)),
        ("mp3", lambda b: demux.mp3_parse(b),
         lambda d: demux.synth_id3_mp3_bytes(d, 5)),
        ("flac", lambda b: demux.flac_parse(b),
         lambda d: demux.synth_flac_bytes(d, 5)),
        ("subtitles", lambda b: demux.subtitle_cues_parse(b),
         lambda d: demux.synth_subtitle_bytes(d, 5)),
        ("ogg", lambda b: demux.ogg_parse(b),
         lambda d: demux.synth_ogg_bytes(d, 5)),
        ("mkv", lambda b: mkv.mkv_demux(b),
         lambda d: mkv.synth_mkv_bytes(d)),
        ("pdf", lambda b: pdf.pdf_text_extract(b),
         lambda d: pdf.synth_pdf_modern_bytes(d, "body text")),
        ("png", lambda b: multimodal.decode_real(b, "image"),
         lambda d: multimodal.png_encode_gray(5, 4, [d % 256] * 20)),
        ("jpeg", lambda b: multimodal.decode_real(b, "image"),
         lambda d: multimodal.jpeg_encode_gray_dc(16, 8, [d % 64, 0])),
        ("jpeg_lossless", lambda b: multimodal.decode_real(b, "image"),
         lambda d: multimodal.jpeg_encode_lossless(
             5, 4, [(d + i) % 256 for i in range(20)])),
        ("tiff", lambda b: multimodal.decode_real(b, "image"),
         lambda d: multimodal.tiff_encode(
             5, 4, [d % 256] * 20, compression=5, predictor=2)),
        ("gif", lambda b: multimodal.decode_real(b, "image"),
         lambda d: multimodal.gif_encode_indexed(
             5, 4, bytes(range(12)), [d % 4] * 20)),
        ("bmp", lambda b: multimodal.decode_real(b, "image"),
         lambda d: multimodal.bmp_encode_rgb24(3, 2, [d % 256] * 18)),
        ("wav", lambda b: multimodal._wav_decode(b),
         lambda d: multimodal.wav_encode([d % 99, -d % 99], 8000, 1,
                                         "float32")),
        ("dims", lambda b: multimodal.image_dimensions(b),
         lambda d: multimodal.synth_webp_bytes(10 + d % 50, 7, "vp8l")),
        ("exif", lambda b: multimodal.image_exif_parse(b)
         if hasattr(multimodal, "image_exif_parse")
         else multimodal.decode_real(b, "image"),
         lambda d: multimodal.png_encode_gray(4, 4, [d % 256] * 16)),
        ("tar", lambda b: list(webdataset.tar_members(b)),
         lambda d: webdataset.synth_webdataset_bytes(d, "text")),
        ("jsonl", lambda b: webdataset.decompress_transparent(
            b, 1 << 20, "jsonl shard").decode("utf-8", "replace"),
         lambda d: webdataset.synth_jsonl_shard_bytes(d, "text")),
        ("zip", lambda b: list(webdataset.zip_members(b)),
         lambda d: webdataset.synth_zip_bytes(d, "text")),
        ("npy", lambda b: tensors.npy_decode(b),
         lambda d: tensors.npy_encode(list(range(6)), (2, 3), "<f4")),
        ("npz", lambda b: [tensors.npy_decode(x)
                           for _n, x in tensors._iter_npy_members(b)],
         lambda d: tensors.synth_npz_bytes(d)),
        ("avro", lambda b: list(avro.avro_container_records(b)),
         lambda d: avro.synth_avro_bytes(d)),
        ("arrow", lambda b: list(arrow_ipc.arrow_ipc_rows(b)),
         lambda d: arrow_ipc.synth_arrow_bytes(d)),
        ("proto", lambda b: list(protowire.proto_wire_fields(b)),
         lambda d: protowire.synth_proto_bytes(d, "t")),
        ("parquet", lambda b: lake.parquet_footer(b),
         lambda d: lake.synth_parquet_bytes(d)),
        ("sitemap", lambda b: warc.sitemap_parse(b),
         lambda d: warc.synth_sitemap_bytes(d)
         if hasattr(warc, "synth_sitemap_bytes") else b"<urlset/>"),
    ]


# pyarrow-backed walkers: a bit flip INSIDE a structurally-valid
# flatbuffer can throw std::length_error in Arrow's C++ which escapes
# the Cython boundary and ABORTS the process (reproduced on this
# pyarrow; /tmp-saved crash input). Arrow IPC carries no integrity
# checksums, so this is undetectable from Python — the modules document
# the untrusted-input posture (checksummed storage or subprocess
# decode). The fuzz therefore exercises junk + truncation (proven
# clean, 400 trials each) but not interior bit flips for these two.
_NO_BITFLIP = {"arrow", "parquet"}


@pytest.mark.parametrize("name", [w[0] for w in _walkers()])
def test_walker_never_escapes_valueerror(name):
    walkers = {w[0]: w for w in _walkers()}
    _, parse, fixture = walkers[name]
    rng = random.Random(zlib.crc32(name.encode()))
    ok = 0
    for trial in range(120):
        kind = trial % 3
        if kind == 1 and name in _NO_BITFLIP:
            kind = 2
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
        else:
            base = fixture(rng.randrange(0, 50))
            if kind == 1 and base:
                i = rng.randrange(len(base))
                data = base[:i] + bytes([base[i] ^ (1 + rng.randrange(255))]) + base[i + 1 :]
            else:
                data = base[: rng.randrange(0, len(base) + 1)]
        try:
            parse(data)
            ok += 1
        except (ValueError, NotImplementedError):
            pass  # the quarantine/seam contract
        # anything else (struct.error, IndexError, KeyError, zlib.error,
        # OverflowError, RecursionError...) fails the test by escaping
    # sanity: the valid fixture itself parses
    parse(fixture(3))
    assert ok >= 0