"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode kernels are STUBBED (no image/audio libraries in this
environment): each stage tries the real library import and otherwise either
raises ``NotImplementedError`` (``fake=False``) or produces a deterministic
fake derived from the payload bytes (``fake=True``) — the Ray-side plumbing
(schema contract, actor signature, small-batch sizing for large payloads,
output layout) is real and tested.

Batch-size note: binary payloads dominate batch memory, so these stages run
with small ``batch_size`` (payload-count, not row-count heuristics) — at
corpus scale set ``batch_size ≈ target_batch_bytes / avg_payload_bytes``.
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


class ImageDecodeStage:
    """payload -> (width, height, feature vector).

    Real path would be PIL/torchvision inside ``__init__`` (once per actor);
    here the decode is a deterministic fake unless the library exists.
    """

    def __init__(self, fake: bool = True, feat_dim: int = 8):
        self.feat_dim = feat_dim
        try:  # pragma: no cover - library not present in this environment
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False
        if not self._pil and not fake:
            raise NotImplementedError(
                "image decode requires PIL; pass fake=True for the "
                "deterministic stub"
            )
        self.fake = not self._pil

    def _fake_decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.blake2b(payload, digest_size=32).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        feat = np.frombuffer(h[: self.feat_dim * 4], dtype=np.uint8)[
            : self.feat_dim
        ].astype(np.float32) / 255.0
        return width, height, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, f = self._fake_decode(payload)
            widths.append(w)
            heights.append(h)
            feats.append(f.tolist())
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSampleStage:
    """video payload -> one row per sampled frame index (flat_map shape)."""

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

    Real path: PIL ``Image.resize`` in ``__call__`` with the decoded object
    cached per batch; the fake derives a deterministic "resized" digest
    from (payload, target) so downstream stages have a stable contract.
    """

    def __init__(self, target: tuple[int, int] = (224, 224),
                 fake: bool = True):
        try:  # pragma: no cover - library not present in this environment
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False
        if not self._pil and not fake:
            raise NotImplementedError(
                "image resize requires PIL; pass fake=True for the stub"
            )
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        shas = []
        for payload in batch["payload"].to_pylist():
            shas.append(
                hashlib.blake2b(
                    payload + tw.to_bytes(4, "big") + th.to_bytes(4, "big"),
                    digest_size=16,
                ).hexdigest()
            )
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

    Real path: soundfile/librosa decode + MFCC in ``__call__`` with the
    model/filterbank built once in ``__init__``; the fake derives duration
    and a bounded feature vector deterministically from the payload bytes.
    """

    def __init__(self, feat_dim: int = 12, fake: bool = True):
        try:  # pragma: no cover - library not present in this environment
            import soundfile  # noqa: F401

            self._sf = True
        except ImportError:
            self._sf = False
        if not self._sf and not fake:
            raise NotImplementedError(
                "audio decode requires soundfile; pass fake=True for the stub"
            )
        self.feat_dim = feat_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, samps, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            h = hashlib.blake2b(payload, digest_size=32).digest()
            dur = 500 + int.from_bytes(h[:2], "big") % 9500  # 0.5-10 s
            durs.append(dur)
            samps.append(dur * 16)  # fake 16 kHz
            feats.append(
                (np.frombuffer(h, dtype=np.uint8)[: self.feat_dim]
                 .astype(np.float32) / 255.0).tolist()
            )
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


def decode_media(media_ds, kind: str = "image", batch_size: int = 16,
                 concurrency=(1, 4)):
    """Actor-pool decode over a media Dataset (small batches: payloads are
    large; real deployments size batch_size by bytes)."""
    cls = _MEDIA_STAGES[kind]
    return media_ds.map_batches(
        cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
