"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with sidecar metadata columns;
decode / feature-extract / resize / frame-sample are actor-pool map_batches
stages. The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the codec boundary is stubbed: `DecodeStage` either raises a
clearly-marked NotImplementedError (real mode) or applies a deterministic fake
codec (test mode) that parses the 16-byte header written by
`encode_fake_image`. Everything Ray-side — schema, batch sizing for fat
binary rows, actor signatures, output layout — is real and tested.

Scale note: binary payload rows are wide; callers should lower `batch_size`
(64–256) and/or raise DataContext.target_max_block_size so blocks don't split
pathologically (ray_guide: object-store pressure pitfalls).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKEIMG1"
HEADER = struct.Struct(">8sII")  # magic, width, height


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload: header + seeded uint8 pixel bytes."""
    rng = np.random.default_rng(seed)
    return HEADER.pack(MAGIC, width, height) + rng.integers(
        0, 256, width * height, dtype=np.uint8
    ).tobytes()


class DecodeStage:
    """binary → (width, height, mean_intensity) metadata columns.

    mode="fake": parse the deterministic fake codec (tests/bench).
    mode="real": STUB — raises NotImplementedError; swap in a PIL/ffmpeg body
    in an environment that ships the codec libraries.
    """

    def __init__(self, binary_column: str = "payload", mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.binary_column = binary_column
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real image decode requires PIL/ffmpeg (not in this container); "
                "use mode='fake' or provide a decoder"
            )
        widths, heights, means = [], [], []
        for buf in batch.column(self.binary_column).to_pylist():
            if buf is None or len(buf) < HEADER.size:
                widths.append(None), heights.append(None), means.append(None)
                continue
            magic, w, h = HEADER.unpack_from(buf)
            if magic != MAGIC:
                widths.append(None), heights.append(None), means.append(None)
                continue
            px = np.frombuffer(buf, dtype=np.uint8, offset=HEADER.size)
            widths.append(w)
            heights.append(h)
            means.append(round(float(px.mean()), 4) if len(px) else None)
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("mean_intensity", pa.array(means, pa.float64()))
        )


class ResizeStage:
    """Fake resize: subsample pixel bytes to (w//f, h//f); demonstrates a
    payload-rewriting stage (output is a new binary column, input dropped to
    keep blocks lean)."""

    def __init__(self, factor: int = 2, binary_column: str = "payload"):
        self.factor = factor
        self.binary_column = binary_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        f = self.factor
        for buf in batch.column(self.binary_column).to_pylist():
            if buf is None or len(buf) < HEADER.size:
                out.append(None)
                continue
            magic, w, h = HEADER.unpack_from(buf)
            if magic != MAGIC:
                out.append(None)
                continue
            px = np.frombuffer(buf, dtype=np.uint8, offset=HEADER.size).reshape(h, w)
            small = px[::f, ::f]
            out.append(
                HEADER.pack(MAGIC, small.shape[1], small.shape[0]) + small.tobytes()
            )
        return batch.drop_columns([self.binary_column]).append_column(
            self.binary_column, pa.array(out, pa.binary())
        )


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling indices for a video payload (plumbing for
    a future ffmpeg-backed stage)."""
    return list(range(0, n_frames, max(1, every)))
