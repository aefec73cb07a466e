"""Multimodal columns demo (L5): binary ingest -> magic-byte typing ->
real decode (BMP pixels, WAV PCM samples) -> frame sampling.

The pipeline shape is the 100 TB one: binaryFile scan, JVM-side type
sniffing, and map-only Arrow-batched decode stages that scale with
executor count. BMP and WAV are decoded for real (pure-bytes formats);
codec-dependent formats fall back to the declared stub.
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


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from xlearning_spark.operators import multimodal as mm

    with tempfile.TemporaryDirectory() as d:
        open(os.path.join(d, "red.bmp"), "wb").write(_bmp(8, 4, (0, 0, 255)))
        open(os.path.join(d, "blue.bmp"), "wb").write(_bmp(3, 3, (255, 0, 0)))
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

        frames = mm.frame_sample(files, every_n_bytes=64, max_frames=3)
        print(f"sampled frames: {frames.count()}")


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-multimodal"))
