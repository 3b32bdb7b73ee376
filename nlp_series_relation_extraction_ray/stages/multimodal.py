"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata.

Each decode stage carries BOTH code paths:

- the REAL library branch (PIL for images, soundfile for audio) — actual
  decode/resize/feature code, selected when the library imports AND the
  caller passes ``fake=False``; exercised by skip-marked tests so it runs
  wherever the libraries exist (they are absent in this container);
- a deterministic FAKE derived from the payload bytes (``fake=True``, the
  default) so the Ray-side plumbing — schema contract, actor signature,
  payload-byte batch sizing, output layout — is real and tested everywhere.

Batch-size note: binary payloads dominate batch memory, so these stages run
with small batches; ``decode_media(target_batch_bytes=...)`` sizes
``batch_size ≈ target_batch_bytes / avg_payload_bytes`` from a bounded
payload sample instead of a row-count guess.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta_json", pa.string()),
    ]
)


def synth_media_table(n: int, kind: str = "image") -> pa.Table:
    """Deterministic fake payload table for plumbing tests."""
    ids, payloads, metas = [], [], []
    for i in range(n):
        seed = hashlib.blake2b(f"{kind}-{i}".encode(), digest_size=16).digest()
        payloads.append(seed * (8 + i % 5))
        ids.append(i)
        metas.append('{"codec": "fake", "source": "synth"}')
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_json": pa.array(metas, pa.string()),
        }
    )


def _try_pil():
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _try_soundfile():
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


class ImageDecodeStage:
    """payload -> (width, height, feature vector).

    Real branch: ``PIL.Image.open`` per payload, grayscale-downsample to a
    ``feat_dim``-long intensity vector.  Library probe happens once per
    actor in ``__init__``."""

    def __init__(self, fake: bool = True, feat_dim: int = 8):
        self.feat_dim = feat_dim
        self._pil = _try_pil()
        if not self._pil and not fake:
            raise NotImplementedError(
                "image decode requires PIL; pass fake=True for the "
                "deterministic stub"
            )
        self.use_real = self._pil and not fake

    def _fake_decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.blake2b(payload, digest_size=32).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        feat = np.frombuffer(h[: self.feat_dim * 4], dtype=np.uint8)[
            : self.feat_dim
        ].astype(np.float32) / 255.0
        return width, height, feat

    def _real_decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        import io

        import PIL.Image

        with PIL.Image.open(io.BytesIO(payload)) as img:
            width, height = img.size
            # feat_dim×1 grayscale thumbnail -> column-mean intensity vector
            gray = img.convert("L").resize((self.feat_dim, self.feat_dim))
            arr = np.asarray(gray, dtype=np.float32) / 255.0
        return width, height, arr.mean(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._real_decode if self.use_real else self._fake_decode
        widths, heights, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, f = decode(payload)
            widths.append(w)
            heights.append(h)
            feats.append(np.asarray(f, dtype=np.float32).tolist())
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSampleStage:
    """video payload -> one row per sampled frame index (flat_map shape).

    No real branch (ffmpeg bindings are far outside this container);
    ``fake=False`` raises — documented stub."""

    def __init__(self, every_n: int = 10, fake: bool = True):
        if not fake:
            raise NotImplementedError("video decode requires ffmpeg bindings")
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "frame_sha": []}
        for i in range(batch.num_rows):
            payload = batch["payload"][i].as_py()
            n_frames = 30 + len(payload) % 90  # fake duration from payload
            mid = batch["media_id"][i].as_py()
            for f in range(0, n_frames, self.every_n):
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["frame_sha"].append(
                    hashlib.blake2b(
                        payload + f.to_bytes(4, "big"), digest_size=8
                    ).hexdigest()
                )
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame_sha": pa.array(out["frame_sha"], pa.string()),
            }
        )


class ImageResizeStage:
    """payload -> resized payload digest + target dims.

    Real branch: PIL decode → ``resize(target)`` → re-encode PNG → digest
    of the resized bytes (downstream stages get a stable content id either
    way)."""

    def __init__(self, target: tuple[int, int] = (224, 224),
                 fake: bool = True):
        self._pil = _try_pil()
        if not self._pil and not fake:
            raise NotImplementedError(
                "image resize requires PIL; pass fake=True for the stub"
            )
        self.use_real = self._pil and not fake
        self.target = target

    def _fake_sha(self, payload: bytes) -> str:
        tw, th = self.target
        return hashlib.blake2b(
            payload + tw.to_bytes(4, "big") + th.to_bytes(4, "big"),
            digest_size=16,
        ).hexdigest()

    def _real_sha(self, payload: bytes) -> str:
        import io

        import PIL.Image

        with PIL.Image.open(io.BytesIO(payload)) as img:
            resized = img.resize(self.target)
            buf = io.BytesIO()
            resized.save(buf, format="PNG")
        return hashlib.blake2b(buf.getvalue(), digest_size=16).hexdigest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        sha = self._real_sha if self.use_real else self._fake_sha
        tw, th = self.target
        shas = [sha(p) for p in batch["payload"].to_pylist()]
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"],
                "width": pa.array([tw] * batch.num_rows, pa.int32()),
                "height": pa.array([th] * batch.num_rows, pa.int32()),
                "resized_sha": pa.array(shas, pa.string()),
            }
        )


class AudioFeatureStage:
    """audio payload -> (duration_ms, n_samples, feature vector).

    Real branch: ``soundfile.read`` → duration from frames/samplerate →
    per-band RMS over ``feat_dim`` equal time slices (a filterbank-free
    MFCC stand-in using only numpy)."""

    def __init__(self, feat_dim: int = 12, fake: bool = True):
        self._sf = _try_soundfile()
        if not self._sf and not fake:
            raise NotImplementedError(
                "audio decode requires soundfile; pass fake=True for the stub"
            )
        self.use_real = self._sf and not fake
        self.feat_dim = feat_dim

    def _fake_features(self, payload: bytes) -> tuple[int, int, list[float]]:
        h = hashlib.blake2b(payload, digest_size=32).digest()
        dur = 500 + int.from_bytes(h[:2], "big") % 9500  # 0.5-10 s
        feat = (
            np.frombuffer(h, dtype=np.uint8)[: self.feat_dim]
            .astype(np.float32) / 255.0
        ).tolist()
        return dur, dur * 16, feat  # fake 16 kHz

    def _real_features(self, payload: bytes) -> tuple[int, int, list[float]]:
        import io

        import soundfile as sf

        data, samplerate = sf.read(io.BytesIO(payload), dtype="float32")
        if data.ndim > 1:  # downmix to mono
            data = data.mean(axis=1)
        n_samples = len(data)
        dur_ms = int(round(1000.0 * n_samples / samplerate))
        # per-slice RMS over feat_dim equal time slices
        edges = np.linspace(0, n_samples, self.feat_dim + 1, dtype=np.int64)
        feat = [
            float(np.sqrt(np.mean(np.square(data[a:b])))) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
        return dur_ms, n_samples, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats_of = self._real_features if self.use_real else \
            self._fake_features
        durs, samps, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            dur, n, f = feats_of(payload)
            durs.append(dur)
            samps.append(n)
            feats.append(f)
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"],
                "duration_ms": pa.array(durs, pa.int32()),
                "n_samples": pa.array(samps, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


_MEDIA_STAGES = {
    "image": ImageDecodeStage,
    "video": FrameSampleStage,
    "resize": ImageResizeStage,
    "audio": AudioFeatureStage,
}


def payload_sized_batch(media_ds, target_batch_bytes: int,
                        sample_rows: int = 8, max_batch: int = 256) -> int:
    """batch_size ≈ target_batch_bytes / avg_payload_bytes, from a bounded
    payload sample (a row-count guess is wrong by orders of magnitude when
    payloads range from KB thumbnails to MB originals)."""
    sample = media_ds.limit(sample_rows).to_pandas()
    if len(sample) == 0:
        return 16
    avg = max(1, int(sample["payload"].map(len).mean()))
    return max(1, min(max_batch, target_batch_bytes // avg))


def decode_media(media_ds, kind: str = "image", batch_size: int | None = None,
                 concurrency=(1, 4), target_batch_bytes: int = 4 << 20,
                 **stage_kwargs):
    """Actor-pool decode over a media Dataset.  ``batch_size=None`` sizes
    batches by payload bytes (``target_batch_bytes`` per batch) from a
    bounded sample; pass an explicit ``batch_size`` to override.
    ``stage_kwargs`` (e.g. ``fake=False`` to require the real library
    branch) forward to the stage constructor."""
    cls = _MEDIA_STAGES[kind]
    if batch_size is None:
        batch_size = payload_sized_batch(media_ds, target_batch_bytes)
    return media_ds.map_batches(
        cls,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
