"""Multimodal columns demo (L5): binary ingest -> magic-byte typing ->
real decode (BMP pixels, PNG zlib scanlines, GIF LZW, baseline JPEG
Huffman+IDCT, WAV PCM samples) -> frame sampling.

The pipeline shape is the 100 TB one: binaryFile scan, JVM-side type
sniffing, and map-only Arrow-batched decode stages that scale with
executor count. BMP/PNG/GIF/JPEG/WAV are decoded for real
(stdlib+numpy only); codec-library formats (progressive JPEG, MP3,
video) fall back to the declared stub.
"""

from __future__ import annotations

import os
import struct
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def _bmp(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    stride = ((width * 24 + 31) // 32) * 4
    row = b"".join(bytes(bgr) for _ in range(width)) + b"\x00" * (stride - width * 3)
    px = row * height
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(px), 2835, 2835, 0, 0)
        + px
    )


def _wav(rate: int, amplitude: int, frames: int) -> bytes:
    data = struct.pack(f"<{frames}h", *([amplitude] * frames))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    import zlib

    def chunk(cid: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + cid + body + struct.pack(
            ">I", zlib.crc32(cid + body)
        )

    scan = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def _gif(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    # Single-frame GIF, 4-entry palette, all pixels at index 1,
    # minimal LZW: a clear code before every pixel keeps the code
    # width fixed at 3 bits (valid per spec; the decoder's dictionary
    # paths are exercised by the q84 oracle and tests instead).
    codes = []
    for _ in range(width * height):
        codes += [4, 1]  # clear, then literal index 1
    codes.append(5)  # end
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x81, 0, 0)
    out += bytes((0, 0, 0, *rgb, 255, 255, 255, 9, 9, 9))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0) + bytes([2])
    for i in range(0, len(data), 255):
        blk = data[i : i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


def _jpeg(luma: int) -> bytes:
    # Minimal baseline JPEG: one 8x8 grayscale block, DC-only, custom
    # 1-symbol-per-length Huffman tables. DC quant step 8 => every
    # pixel decodes to exactly luma (stored coefficient luma - 128).
    dc = luma - 128
    t = abs(dc).bit_length()
    quant = [8] + [16] * 63
    zz = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    # DC table: categories 0-7 at 3 bits (codes 0..7); AC: EOB at 1 bit.
    dht_dc = bytes([0x00]) + bytes([0, 0, 8] + [0] * 13) + bytes(range(8))
    dht_ac = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    bits = (t << (t + 1)) | ((dc if dc > 0 else dc + (1 << t) - 1) << 1)
    nbits = 3 + t + 1  # DC code + amplitude + 1-bit EOB (code 0)
    pad = 8 - nbits % 8 if nbits % 8 else 0
    scan = ((bits << pad) | ((1 << pad) - 1)).to_bytes((nbits + pad) // 8, "big")
    scan = scan.replace(b"\xff", b"\xff\x00")  # entropy byte stuffing
    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        quant[zz[i]] for i in range(64)
    )
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tbl in (dht_dc, dht_ac):
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(tbl)) + tbl
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return out + scan + b"\xff\xd9"


def _avi(frames: list[bytes], usec_per_frame: int = 40000) -> bytes:
    # Minimal MJPEG AVI: RIFF + hdrl/avih + movi with ##dc JPEG chunks.
    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<14I", usec_per_frame, 0, 0, 0, len(frames), 0, 1,
                       *[0] * 7)
    hdrl = b"hdrl" + chunk(b"avih", avih)
    movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    payload = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from xlearning_spark.operators import multimodal as mm

    with tempfile.TemporaryDirectory() as d:
        open(os.path.join(d, "red.bmp"), "wb").write(_bmp(8, 4, (0, 0, 255)))
        open(os.path.join(d, "blue.bmp"), "wb").write(_bmp(3, 3, (255, 0, 0)))
        open(os.path.join(d, "green.png"), "wb").write(_png(6, 5, (0, 200, 0)))
        open(os.path.join(d, "teal.gif"), "wb").write(_gif(7, 4, (0, 128, 128)))
        open(os.path.join(d, "gray.jpg"), "wb").write(_jpeg(200))
        open(os.path.join(d, "clip.avi"), "wb").write(
            _avi([_jpeg(60), _jpeg(120), _jpeg(180)])
        )
        open(os.path.join(d, "tone.wav"), "wb").write(_wav(8000, 8192, 800))
        open(os.path.join(d, "note.txt"), "wb").write(b"not media")

        files = mm.with_media_type(mm.read_binary_files(spark, d))
        print("typed files:")
        for r in files.select("path", "media_type", "length").collect():
            print(f"  {os.path.basename(r.path)}: {r.media_type} ({r.length} B)")

        images = mm.decode_image(files.filter("media_type like 'image/%'"))
        for r in images.collect():
            print(
                f"image {os.path.basename(r.path)}: {r.width}x{r.height}"
                f" ch={r.n_channels} rgb_means={[round(x, 3) for x in r.feature]}"
            )

        audio = mm.decode_audio(files.filter("media_type like 'audio/%'"))
        for r in audio.collect():
            print(
                f"audio {os.path.basename(r.path)}: {r.sample_rate} Hz"
                f" {r.n_channels}ch {r.bit_depth}-bit {r.duration_s:.3f}s"
                f" rms={[round(x, 4) for x in r.feature]}"
            )

        resampled = mm.resample_audio(
            mm.decode_audio(
                files.filter("media_type like 'audio/%'"), keep_samples=True
            ),
            target_rate=16000,
        )
        for r in resampled.collect():
            print(
                f"resampled {os.path.basename(r.path)} -> {r.sample_rate} Hz"
                f" ({r.n_samples} samples, {r.duration_s:.3f}s,"
                f" rms={[round(x, 4) for x in r.feature]})"
            )

        resized = mm.resize_image(
            mm.decode_image(
                files.filter("media_type like 'image/%'"), keep_pixels=True
            ),
            target_width=4,
            target_height=4,
        )
        for r in resized.collect():
            if r.pixels is not None:
                print(
                    f"resized {os.path.basename(r.path)} -> 4x4 real bilinear,"
                    f" means={[round(x, 3) for x in r.feature]}"
                )

        video = mm.decode_video(files.filter("media_type = 'video/avi'"))
        for r in sorted(video.collect(), key=lambda r: r.frame_no):
            print(
                f"video {os.path.basename(r.path)} frame {r.frame_no}/"
                f"{r.n_frames} @ {r.fps:.0f}fps: {r.width}x{r.height}"
                f" luma={round(r.feature[0], 3)}"
            )

        frames = mm.frame_sample(files, every_n_bytes=64, max_frames=3)
        print(f"sampled frames: {frames.count()}")


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-multimodal"))
