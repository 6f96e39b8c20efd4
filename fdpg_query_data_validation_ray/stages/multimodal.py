"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with sidecar metadata columns;
decode / feature-extract / resize / frame-sample are actor-pool map_batches
stages. Two codec paths:

- mode="real": a dependency-free uncompressed-BMP codec (BITMAPINFOHEADER,
  8-bit grayscale palette or 24-bit BI_RGB, bottom-up rows, 4-byte row
  padding) implemented in struct + numpy — an actual on-disk image format,
  exercised end-to-end in-sandbox without PIL/ffmpeg. Swap in a PIL/ffmpeg
  body for JPEG/PNG/video in an environment that ships those libraries.
- mode="fake": a trivial 16-byte-header codec for speed in plumbing tests.

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


# -- real codec: uncompressed BMP -------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")   # magic, file size, res, res, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp_gray(pixels: np.ndarray) -> bytes:
    """(h × w) uint8 array → 8-bit grayscale BMP (256-entry gray palette,
    bottom-up rows, rows padded to 4 bytes) — a real, spec-conformant image
    file (openable by any viewer)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    stride = (w + 3) & ~3
    palette = bytearray()
    for i in range(256):
        palette += bytes((i, i, i, 0))  # BGRA
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = px
    data = rows[::-1].tobytes()  # bottom-up
    offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size + len(palette)
    info = _BMP_INFO_HDR.pack(40, w, h, 1, 8, 0, len(data), 2835, 2835, 256, 0)
    fhdr = _BMP_FILE_HDR.pack(b"BM", offset + len(data), 0, 0, offset)
    return fhdr + info + bytes(palette) + data


def _bmp_header(buf, off: int = 0):
    """Validated BMP header parse shared by decode_bmp / split_frames /
    the header-only dims path: (fsize, data_offset, hdr_size, w, h_signed,
    bpp, n_colors) or None. Performs exactly decode_bmp's header checks so
    every consumer agrees on what counts as a BMP."""
    if buf is None or off + _BMP_FILE_HDR.size + _BMP_INFO_HDR.size > len(buf):
        return None
    magic, fsize, _r1, _r2, offset = _BMP_FILE_HDR.unpack_from(buf, off)
    if magic != b"BM":
        return None
    (hdr_size, w, h, planes, bpp, compression, _isize, _xp, _yp, n_colors,
     _imp) = _BMP_INFO_HDR.unpack_from(buf, off + _BMP_FILE_HDR.size)
    if hdr_size < 40 or planes != 1 or compression != 0 or w <= 0 or h == 0:
        return None
    return fsize, offset, hdr_size, w, h, bpp, n_colors


def bmp_dims(buf) -> tuple[int, int] | None:
    """Header-only (width, height) — no pixel materialization. None exactly
    when the header checks decode_bmp performs fail (pixel-data bounds are
    still only checked by the full decode)."""
    hdr = _bmp_header(buf)
    if hdr is None:
        return None
    _fs, _off, _hs, w, h, _bpp, _nc = hdr
    return w, abs(h)


def decode_bmp(buf: bytes) -> tuple[int, int, np.ndarray] | None:
    """Uncompressed BMP (8-bit palette or 24-bit BI_RGB, bottom-up or
    top-down) → (width, height, grayscale (h × w) float array). None for
    anything that is not a decodable BMP. Pure struct + numpy."""
    hdr = _bmp_header(buf)
    if hdr is None:
        return None
    _fsize, offset, hdr_size, w, h, bpp, n_colors = hdr
    top_down = h < 0
    h = abs(h)
    if bpp == 8:
        n_colors = n_colors or 256
        pal_off = _BMP_FILE_HDR.size + hdr_size
        pal = np.frombuffer(buf, np.uint8, n_colors * 4, pal_off).reshape(-1, 4)
        # palette BGR → luminance (gray palettes collapse to the index value)
        lum = pal[:, :3].mean(axis=1)
        stride = (w + 3) & ~3
        if offset + stride * h > len(buf):
            return None
        rows = np.frombuffer(buf, np.uint8, stride * h, offset).reshape(h, stride)
        idx = rows[:, :w]
        px = lum[idx]
    elif bpp == 24:
        stride = (w * 3 + 3) & ~3
        if offset + stride * h > len(buf):
            return None
        rows = np.frombuffer(buf, np.uint8, stride * h, offset).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        px = bgr.mean(axis=2)
    else:
        return None
    if not top_down:
        px = px[::-1]
    return w, h, px


class DecodeStage:
    """binary → (width, height, mean_intensity) metadata columns.

    mode="real" (default): the uncompressed-BMP codec above — an actual image
    format decoded with struct + numpy (no PIL/ffmpeg needed).
    mode="fake": parse the trivial 16-byte-header codec (plumbing tests).
    Undecodable payloads yield null metadata in both modes (bad rows must not
    kill the stage — they surface as nulls for a downstream not_null rule).
    """

    def __init__(self, binary_column: str = "payload", mode: str = "real"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.binary_column = binary_column
        self.mode = mode

    def _decode_one(self, buf) -> tuple[int | None, int | None, float | None]:
        if self.mode == "real":
            out = decode_bmp(buf)
            if out is None:
                return None, None, None
            w, h, px = out
            return w, h, round(float(px.mean()), 4) if px.size else None
        if buf is None or len(buf) < HEADER.size:
            return None, None, None
        magic, w, h = HEADER.unpack_from(buf)
        if magic != MAGIC:
            return None, None, None
        px = np.frombuffer(buf, dtype=np.uint8, offset=HEADER.size)
        return w, h, round(float(px.mean()), 4) if len(px) else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means = [], [], []
        for buf in batch.column(self.binary_column).to_pylist():
            w, h, mi = self._decode_one(buf)
            widths.append(w), heights.append(h), means.append(mi)
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("mean_intensity", pa.array(means, pa.float64()))
        )


class ResizeStage:
    """Subsample to (w//f, h//f); demonstrates a payload-rewriting stage
    (output is a new binary column, input dropped to keep blocks lean).

    mode="real" (default): decode BMP → stride-subsample → re-encode as 8-bit
    grayscale BMP. mode="fake": the 16-byte-header codec."""

    def __init__(self, factor: int = 2, binary_column: str = "payload",
                 mode: str = "real"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.factor = factor
        self.binary_column = binary_column
        self.mode = mode

    def _resize_one(self, buf) -> bytes | None:
        f = self.factor
        if self.mode == "real":
            out = decode_bmp(buf)
            if out is None:
                return None
            _w, _h, px = out
            small = px[::f, ::f]
            return encode_bmp_gray(np.clip(np.round(small), 0, 255).astype(np.uint8))
        if buf is None or len(buf) < HEADER.size:
            return None
        magic, w, h = HEADER.unpack_from(buf)
        if magic != MAGIC:
            return None
        px = np.frombuffer(buf, dtype=np.uint8, offset=HEADER.size).reshape(h, w)
        small = px[::f, ::f]
        return HEADER.pack(MAGIC, small.shape[1], small.shape[0]) + small.tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize_one(b) for b in batch.column(self.binary_column).to_pylist()]
        return batch.drop_columns([self.binary_column]).append_column(
            self.binary_column, pa.array(out, pa.binary())
        )


class PerceptualHashStage:
    """binary image → 64-bit average-hash (aHash): decode, sample the
    grayscale plane onto a grid×grid lattice (nearest-neighbor — exact and
    resolution-independent), threshold each cell at the lattice mean, pack
    the bits row-major into an int64. Near-identical images collapse to
    equal (or Hamming-close) hashes, so exact-dup grouping on the hash is
    the standard cheap image-dedup pass (pHash family; the DCT variant
    drops in behind the same signature). Undecodable payloads hash to
    null. No SQL form exists (no BMP codec in DuckDB) — correctness is
    pinned by a brute-force cross-check test."""

    def __init__(self, binary_column: str = "payload", grid: int = 8):
        self.binary_column = binary_column
        self.grid = int(grid)

    def _hash_one(self, buf) -> int | None:
        out = decode_bmp(buf) if buf is not None else None
        if out is None:
            return None
        w, h, px = out
        if w < 1 or h < 1:
            return None
        g = self.grid
        ys = (np.arange(g) * h) // g
        xs = (np.arange(g) * w) // g
        lat = px[np.ix_(ys, xs)]
        bits = (lat > lat.mean()).astype(np.uint8).ravel()
        u = int.from_bytes(np.packbits(bits).tobytes(), "big")
        return u - (1 << 64) if u >= (1 << 63) else u

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [self._hash_one(b)
                  for b in batch.column(self.binary_column).to_pylist()]
        return batch.append_column("phash", pa.array(hashes, pa.int64()))


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling indices for a video payload (plumbing for
    a future ffmpeg-backed stage)."""
    return list(range(0, n_frames, max(1, every)))


def split_frames(buf: bytes) -> list[bytes]:
    """Split a multi-frame payload (concatenated BMP frames — the container
    seam a real demuxer would replace) into per-frame byte slices, using each
    frame's own declared file size (bytes 2-6 of the BMP file header). A
    malformed boundary ends the scan: the frames parsed so far are returned
    (bad payload tails must not kill the batch)."""
    frames: list[bytes] = []
    if buf is None:
        return frames
    off, n = 0, len(buf)
    while off < n:
        # full header validation (not just the 'BM' magic): plausible
        # garbage starting with 'BM' must end the scan, not become a
        # phantom frame that misaligns every boundary after it
        hdr = _bmp_header(buf, off)
        if hdr is None:
            break
        fsize = hdr[0]
        if fsize <= _BMP_FILE_HDR.size + _BMP_INFO_HDR.size or off + fsize > n:
            break
        frames.append(bytes(buf[off : off + fsize]))
        off += fsize
    return frames


class FrameSampleStage:
    """Multi-frame binary payload → one row per SAMPLED frame.

    The video-pipeline shape from the mandate: an actor-pool map_batches
    stage that (a) parses frame boundaries out of the container bytes
    (split_frames — an ffmpeg demuxer would slot in here), (b) applies the
    deterministic sampling plan (every Nth frame, frame_sample_plan), and
    (c) decodes ONLY the sampled frames, emitting
    (id, frame_index, width, height) rows — a flat_map-shaped explode done
    inside map_batches so the output stays one Arrow table per batch.
    Per-row Python iteration is inherent to variable-size binary payloads
    (same argument as DecodeStage); keep batches small for fat rows."""

    def __init__(self, every: int = 2, binary_column: str = "payload",
                 id_column: str = "doc_id"):
        self.every = max(1, every)
        self.binary_column = binary_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list = []
        fidx_out: list[int] = []
        w_out: list[int | None] = []
        h_out: list[int | None] = []
        ids = batch[self.id_column].to_pylist()
        payloads = batch[self.binary_column].to_pylist()
        for rid, buf in zip(ids, payloads):
            frames = split_frames(buf)
            for fi in frame_sample_plan(len(frames), self.every):
                # header-only dims: this stage emits metadata, so it must
                # not materialize each frame's pixel array (chain
                # DecodeStage on the sampled frames when features are
                # actually needed)
                dims = bmp_dims(frames[fi])
                ids_out.append(rid)
                fidx_out.append(fi)
                w_out.append(dims[0] if dims else None)
                h_out.append(dims[1] if dims else None)
        return pa.table(
            {
                self.id_column: pa.array(ids_out, batch[self.id_column].type),
                "frame_index": pa.array(fidx_out, pa.int64()),
                "width": pa.array(w_out, pa.int64()),
                "height": pa.array(h_out, pa.int64()),
            }
        )
