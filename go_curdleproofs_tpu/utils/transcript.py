"""Curdleproofs Fiat-Shamir transcript.

Mirrors /root/reference/transcript/transcript.go byte-for-byte:
  * points are absorbed as 48-byte ZCash-compressed affine encodings;
  * scalars as 32-byte big-endian;
  * challenges are 32-byte PRF outputs rejection-sampled until canonical Fr,
    and each accepted challenge is appended back into the transcript
    (transcript.go:48-58 — required for cross-implementation compatibility).
"""

from __future__ import annotations

from typing import List, Sequence

from . import codec
from . import field_host as fh
from .field_host import Affine
from .merlin import MerlinTranscript


class Transcript:
    __slots__ = ("inner",)

    def __init__(self, label: bytes):
        self.inner = MerlinTranscript(label)

    def append_message(self, label: bytes, message: bytes) -> None:
        self.inner.append_message(label, message)

    def append_points(self, label: bytes, *points: Affine) -> None:
        for pt in points:
            self.inner.append_message(label, codec.point_bytes(pt))

    def append_scalars(self, label: bytes, *scalars: int) -> None:
        for s in scalars:
            self.inner.append_message(label, codec.fr_to_bytes(s))

    def get_and_append_challenge(self, label: bytes) -> int:
        while True:
            dest = self.inner.challenge_bytes(label, 32)
            v = int.from_bytes(dest, "big")
            if v < fh.R:
                self.append_scalars(label, v)
                return v

    def get_and_append_challenges(self, label: bytes, count: int) -> List[int]:
        return [self.get_and_append_challenge(label) for _ in range(count)]
