"""Media decode/normalize stages over opaque binary columns.

Mirrors the reference's filter-driven image decode
(extractor/src/engine/mod.rs:138-211): DCTDecode → JPEG decode; FlateDecode
→ inflate + format-guess + rotate90; bare DeviceRGB/DeviceGray raw buffers
with exact size checks; anything else → unsupported ⇒ skipped (counted, not
fatal).

Real image/audio codecs are not in this container. Decode is therefore a
deterministic stand-in behind the same plumbing (actor pool over Arrow
``binary`` columns, per-element failure capture); where a real library
*is* importable (PIL) it is used opportunistically. The multimodal schema,
batch sizing, actor signature and output layout are real and tested —
SURVEY.md M6.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # real decoder, if present (not guaranteed in this container)
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

UNSUPPORTED = "Unsupported filter/color space"  # engine/mod.rs:163,207


class MediaDecodeStage:
    """Actor-pool UDF over MEDIA_SCHEMA batches → decode results.

    Output columns: ``media_ref, ok, out_width, out_height, n_bytes, error``.
    FlateDecode's ``rotate90()`` (engine/mod.rs:156-160) swaps the output
    dimensions; raw RGB/Gray enforce the exact ``w*h*3`` / ``w*h`` size
    checks (engine/mod.rs:169-206) — a mismatched buffer is a decode
    failure, mirroring the reference's error path.
    """

    def __init__(self, strict_sizes: bool = True):
        # once-per-actor: decoder tables / codec contexts would load here
        self._strict = strict_sizes

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy(zero_copy_only=False)
        heights = batch.column("height").to_numpy(zero_copy_only=False)
        codecs = batch.column("codec").to_pylist()

        ok = np.zeros(len(refs), bool)
        out_w = np.zeros(len(refs), np.int32)
        out_h = np.zeros(len(refs), np.int32)
        n_bytes = np.zeros(len(refs), np.int64)
        errors: list[str] = []
        for i, (p, c) in enumerate(zip(payloads, codecs)):
            w, h = int(widths[i]), int(heights[i])
            err = ""
            if p is None:
                err = "empty payload"
            elif c == "dct":
                ok[i], out_w[i], out_h[i] = True, w, h
            elif c == "flate":
                # inflate + guess + rotate90: dims swap
                ok[i], out_w[i], out_h[i] = True, h, w
            elif c == "raw-rgb":
                if not self._strict or len(p) == w * h * 3:
                    ok[i], out_w[i], out_h[i] = True, w, h
                else:
                    err = UNSUPPORTED
            elif c == "raw-gray":
                if not self._strict or len(p) == w * h:
                    ok[i], out_w[i], out_h[i] = True, w, h
                else:
                    err = UNSUPPORTED
            else:
                err = UNSUPPORTED
            if ok[i]:
                n_bytes[i] = len(p)
            errors.append(err)
        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array(ok),
                pa.array(out_w),
                pa.array(out_h),
                pa.array(n_bytes),
                pa.array(errors, pa.string()),
            ],
            names=["media_ref", "ok", "out_width", "out_height", "n_bytes", "error"],
        )


class ImageFeatureStage:
    """Actor-pool UDF: deterministic fake feature-extraction over binary
    payloads (stat features computable without codecs). Real model inference
    would replace ``_features``; the plumbing (batch → fixed-width float
    matrix column) is the real shape.
    """

    DIM = 8

    def __init__(self):
        pass

    def _features(self, payload: bytes | None) -> np.ndarray:
        if not payload:
            return np.zeros(self.DIM, np.float32)
        a = np.frombuffer(payload, np.uint8).astype(np.float32)
        q = np.percentile(a, [10, 25, 50, 75, 90]).astype(np.float32)
        return np.concatenate([[a.mean(), a.std(), float(len(a))], q]).astype(
            np.float32
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._features(p) for p in payloads])
        return pa.Table.from_arrays(
            [
                batch.column("media_ref"),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), self.DIM
                ),
            ],
            names=["media_ref", "features"],
        )


AUDIO_WINDOW = 1024  # samples per analysis window


class AudioEnergyStage:
    """Audio-modality actor-pool UDF: interpret the opaque payload as
    PCM s16le and emit exact-integer signal features per item —
    n_samples, window count, total energy (Σ sample², fits int64 for
    < 2^33 samples), and peak |amplitude|. A real audio decoder
    (ffmpeg/soundfile) would replace the frombuffer; the batched binary →
    feature-row plumbing is the production shape. Checked against an
    independent pure-Python byte-loop golden (fixtures)."""

    def __init__(self, window: int = AUDIO_WINDOW):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_samp = np.zeros(len(payloads), np.int64)
        energy = np.zeros(len(payloads), np.int64)
        peak = np.zeros(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            if not p:
                continue
            s = np.frombuffer(p[: len(p) - (len(p) % 2)], np.int16).astype(np.int64)
            n_samp[i] = len(s)
            if len(s):
                energy[i] = int((s * s).sum())
                peak[i] = int(np.abs(s).max())
        n_win = -(-n_samp // self.window)
        return pa.Table.from_arrays(
            [
                batch.column("media_ref"),
                pa.array(n_samp),
                pa.array(n_win),
                pa.array(energy),
                pa.array(peak),
            ],
            names=["media_ref", "n_samples", "n_windows", "energy", "peak"],
        )


FRAME_BYTES = 1024


def frame_sample_batch(batch: pa.Table, stride: int = FRAME_BYTES) -> pa.Table:
    """Multimodal frame-sampling plumbing: treat the opaque payload as a
    frame stream of fixed-size chunks and emit the sample geometry
    (n_frames = ceil(bytes/stride)). A real video decoder would replace
    the chunking; the schema/batching contract is the real part
    (SURVEY.md multimodal note)."""
    import pyarrow.compute as pc

    nb = pc.binary_length(batch.column("payload"))
    n_frames = pc.cast(
        pc.ceil(pc.divide(pc.cast(nb, pa.float64()), float(stride))), pa.int64()
    )
    return pa.Table.from_arrays(
        [
            batch.column("media_ref"),
            pc.cast(nb, pa.int64()),
            n_frames,
        ],
        names=["media_ref", "n_bytes", "n_frames"],
    )


def decode_real_image(payload: bytes):
    """True image decode — requires PIL, which this container may lack.

    Kept as the explicit extension point for real deployments; the
    deterministic stand-ins above keep tests hermetic.
    """
    if not _HAS_PIL:
        raise NotImplementedError("image codecs unavailable in this environment")
    import io

    import PIL.Image as Image

    return Image.open(io.BytesIO(payload))


def decode_real_to_png(payload: bytes, rotate90: bool = False) -> tuple:
    """Reference-shaped real decode (extractor/src/engine/mod.rs:142-162):
    decode the compressed payload, convert to RGBA, optionally rotate90
    (the FlateDecode path swaps dims), re-encode as PNG. Returns
    ``(png_bytes, out_width, out_height)``.

    PNG payloads decode through the pure-stdlib codec
    (``png_codec.decode_png``) and baseline JPEG through the pure-Python
    ``jpeg_codec`` (r3 next-round #7 — the DCTDecode path now executes in
    this container); other compressed formats need PIL (the container may
    lack it — the ``NotImplementedError`` contract is tested either way).
    """
    from .jpeg_codec import decode_jpeg, is_jpeg
    from .png_codec import decode_png, encode_png, is_png

    if is_png(payload):
        rgba = decode_png(payload)
        if rotate90:
            # reference image::rotate90() turns the image CLOCKWISE
            # (mod.rs:156-160); np.rot90 k=-1 matches, dims swap
            rgba = np.ascontiguousarray(np.rot90(rgba, k=-1))
        h, w = rgba.shape[:2]
        return encode_png(rgba), w, h
    if is_jpeg(payload):
        px = decode_jpeg(payload)
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        rgba = np.concatenate(
            [px, np.full(px.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
        if rotate90:
            rgba = np.ascontiguousarray(np.rot90(rgba, k=-1))
        h, w = rgba.shape[:2]
        return encode_png(rgba), w, h
    if not _HAS_PIL:
        raise NotImplementedError("image codecs unavailable in this environment")
    import io

    import PIL.Image as Image

    img = Image.open(io.BytesIO(payload)).convert("RGBA")
    if rotate90:
        # reference rotate90() turns the image clockwise; dims swap
        img = img.transpose(Image.Transpose.ROTATE_270)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue(), img.width, img.height


class ImageResizeStage:
    """Nearest-neighbor resize over RAW pixel buffers (``raw-rgb`` /
    ``raw-gray``) — the thumbnail/normalize step of a multimodal training
    pipeline, EXACT (no codec needed): output pixel (x, y) copies source
    pixel (x·w//tw, y·h//th), the standard floor-mapping NN. Compressed
    codecs (dct/flate/jbig2) report unsupported — in production they chain
    behind ``MediaDecodeStage``'s real decoder (same skip-not-fatal policy
    as the reference's filter dispatch, extractor/src/engine/mod.rs:
    138-211).

    Vectorized: one ``np.frombuffer`` view + a fancy-index gather per
    image; per-actor state holds the (tw, th) index maps cache keyed by
    source dims. Output: ``media_ref, ok, out_width, out_height,
    out_md5, error`` (md5 of the resized buffer is the golden-equality
    witness)."""

    def __init__(self, target_w: int = 16, target_h: int = 16):
        self._tw = int(target_w)
        self._th = int(target_h)
        self._maps: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _index_map(self, w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
        key = (w, h)
        m = self._maps.get(key)
        if m is None:
            xs = (np.arange(self._tw, dtype=np.int64) * w) // self._tw
            ys = (np.arange(self._th, dtype=np.int64) * h) // self._th
            m = (xs, ys)
            self._maps[key] = m
        return m

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy(zero_copy_only=False)
        heights = batch.column("height").to_numpy(zero_copy_only=False)
        codecs = batch.column("codec").to_pylist()
        n = len(refs)
        ok = np.zeros(n, bool)
        md5s: list[str] = []
        errors: list[str] = []
        for i, (p, c) in enumerate(zip(payloads, codecs)):
            w, h = int(widths[i]), int(heights[i])
            channels = 3 if c == "raw-rgb" else (1 if c == "raw-gray" else 0)
            if channels == 0:
                md5s.append("")
                errors.append(UNSUPPORTED)
                continue
            buf = p or b""
            if w <= 0 or h <= 0 or len(buf) != w * h * channels:
                md5s.append("")
                errors.append("size mismatch")
                continue
            xs, ys = self._index_map(w, h)
            img = np.frombuffer(buf, np.uint8).reshape(h, w, channels)
            out = img[ys[:, None], xs[None, :], :]  # (th, tw, ch) gather
            ok[i] = True
            md5s.append(hashlib.md5(out.tobytes()).hexdigest())
            errors.append("")
        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array(ok),
                pa.array(
                    np.where(ok, self._tw, 0).astype(np.int32)
                ),
                pa.array(
                    np.where(ok, self._th, 0).astype(np.int32)
                ),
                pa.array(md5s, pa.string()),
                pa.array(errors, pa.string()),
            ],
            names=["media_ref", "ok", "out_width", "out_height", "out_md5", "error"],
        )
