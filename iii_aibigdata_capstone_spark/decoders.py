"""Payload-decoder seam for the multimodal/kernel lane.

The reference ships a swap-in classifier seam for exactly this situation —
``TrueBinaryClassifier`` (pi/digit_detector/classify.py:35-51) stands in for
the real CNN so the pipeline is testable without weights. This module is
that pattern generalized to ONE injection point for payload decoding: every
kernel/multimodal query resolves its decoder through :func:`pixel_decoder` /
:func:`image_decoder`, so dropping in a real cv2/ONNX decode is a
``register_decoder(...)`` call (or ``SPARK_GRAFT_DECODER=<name>`` env var) —
no query code changes.

Two built-ins:

- ``stub`` (default): deterministic fake pixels from sha256(payload) — the
  container has no codec libs (SURVEY.md §7 `.MISSING_LARGE_BLOBS`), and a
  content-hash image is stable across runs/engines so downstream kernels
  stay testable.
- ``raw``: a *trivially real* decoder — the payload's own bytes ARE the
  pixels (tiled/truncated to the requested length). No codec needed, but
  unlike the stub it actually reads the image data, which exercises the
  exact code path a cv2 decoder would use (bytes in, uint8 ndarray out).

A production deployment registers, e.g.::

    import cv2, numpy as np
    from iii_aibigdata_capstone_spark import decoders

    def cv2_pixels(payload: bytes, n: int) -> np.ndarray:
        img = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_GRAYSCALE)
        return img.reshape(-1)[:n]

    decoders.register_decoder("cv2", pixel=cv2_pixels, image=cv2_image)

and sets ``SPARK_GRAFT_DECODER=cv2`` **in the driver's environment before
building the query plan**. Resolution happens ON THE DRIVER when a query
is built: each kernel/multimodal query calls ``pixel_decoder()`` /
``image_decoder()`` at plan-build time and ships the *resolved function*
to executors inside its ``mapInPandas`` closure (cloudpickle serializes
the function by value, so a decoder registered only on the driver still
runs on every worker — ``--py-files`` is needed only when the decoder
function references module-level state such as a loaded ONNX session).
``spark.executorEnv.*`` is NOT consulted; the driver's env/registration is
the single source of truth, which also makes the active decoder uniform
across all tasks of a query by construction.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import Callable

import numpy as np

# (payload, n_pixels) -> uint8 ndarray of length n_pixels
PixelDecoder = Callable[[bytes, int], np.ndarray]
# payload -> (width, height, flat pixel list) — the cv2.imdecode shape
ImageDecoder = Callable[[bytes], "tuple[int, int, list[int]]"]

FAKE_W, FAKE_H = 8, 8

ENV_VAR = "SPARK_GRAFT_DECODER"


def _stub_pixels(payload: bytes, n: int) -> np.ndarray:
    h = hashlib.sha256(payload).digest()
    reps = (n + len(h) - 1) // len(h)
    return np.frombuffer(h * reps, dtype=np.uint8)[:n].copy()


def _stub_image(payload: bytes) -> tuple[int, int, list[int]]:
    h = hashlib.sha256(payload).digest() * 2  # 64 bytes
    return FAKE_W, FAKE_H, list(h[: FAKE_W * FAKE_H])


def _raw_pixels(payload: bytes, n: int) -> np.ndarray:
    if not payload:
        return np.zeros(n, dtype=np.uint8)
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = (n + len(buf) - 1) // len(buf)
    return np.tile(buf, reps)[:n].copy()


def _raw_image(payload: bytes) -> tuple[int, int, list[int]]:
    return FAKE_W, FAKE_H, list(_raw_pixels(payload, FAKE_W * FAKE_H))


@dataclass(frozen=True)
class Decoder:
    name: str
    pixel: PixelDecoder
    image: ImageDecoder


_REGISTRY: dict[str, Decoder] = {
    "stub": Decoder("stub", _stub_pixels, _stub_image),
    "raw": Decoder("raw", _raw_pixels, _raw_image),
}


def register_decoder(name: str, pixel: PixelDecoder, image: ImageDecoder) -> None:
    """Install a real decoder under ``name`` (idempotent overwrite)."""
    _REGISTRY[name] = Decoder(name, pixel, image)


def active_decoder(name: str | None = None) -> Decoder:
    """Resolve the decoder: explicit name > $SPARK_GRAFT_DECODER > stub.

    Called on the DRIVER (queries resolve at plan-build time and ship the
    resolved function in their UDF closures — see the module docstring),
    so the env var / registration that matters is the driver's.
    """
    key = name or os.environ.get(ENV_VAR, "stub")
    try:
        return _REGISTRY[key]
    except KeyError:
        raise KeyError(
            f"unknown decoder {key!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def pixel_decoder(name: str | None = None) -> PixelDecoder:
    return active_decoder(name).pixel


def image_decoder(name: str | None = None) -> ImageDecoder:
    return active_decoder(name).image
