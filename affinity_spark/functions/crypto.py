"""Time-based crypto proof — the reference's API-layer auth (F8).

Behavioral parity with ``api/src/main/java/io/amient/affinity/core/util/
TimeCryptoProof.java:95-175`` + ``TimeCryptoProofSHA256.java``: a proof
is ``SHA256(salt || utc_minute_be8 || arg)`` where ``utc_minute_be8`` is
the current UTC time floored to the whole minute (epoch seconds) as an
8-byte big-endian long; verification accepts the proof computed in the
current, previous, or next minute window (clock-skew tolerance). The
deterministic ``hash`` variant is ``SHA256(salt || arg)`` (no time
component). Hex is uppercase on output, case-insensitive on input, as
the reference's ``toHex``/``fromHex`` pair behaves.

Pure stdlib (hashlib); the clock is injectable so the ±1-window
acceptance is testable without sleeping across minute boundaries."""

from __future__ import annotations

import hashlib
import os
import struct
import time
from collections.abc import Callable


def generate_salt() -> bytes:
    """16 random bytes (the reference's ``generateSalt``)."""
    return os.urandom(16)


class TimeCryptoProofSHA256:
    """Thread-safe signer/verifier over one salt."""

    def __init__(self, salt: bytes | str, clock: Callable[[], float] = time.time):
        self._salt = bytes.fromhex(salt) if isinstance(salt, str) else bytes(salt)
        self._clock = clock

    def _utc_whole_minutes(self, window_offset: int = 0) -> int:
        # whole-minute epoch SECONDS (the reference keeps seconds units,
        # zeroing second/nano), plus offset windows of 60 s
        return (int(self._clock()) // 60) * 60 + window_offset * 60

    def hash(self, arg: str | bytes) -> str:
        """Deterministic salted hash (no time component)."""
        data = arg.encode() if isinstance(arg, str) else bytes(arg)
        return hashlib.sha256(self._salt + data).hexdigest().upper()

    def sign(self, arg: str | bytes, window_offset: int = 0) -> str:
        """Time-based proof for ``arg`` in the current (or offset) minute
        window."""
        data = arg.encode() if isinstance(arg, str) else bytes(arg)
        utc = self._utc_whole_minutes(window_offset)
        payload = self._salt + struct.pack(">q", utc) + data
        return hashlib.sha256(payload).hexdigest().upper()

    def verify(self, signature: str, arg: str | bytes) -> bool:
        """True when ``signature`` matches the proof of the current,
        previous, or next minute window (the reference's ±1 tolerance).
        Constant-time comparison: a guard must not leak how much of a
        forged proof's prefix matched (r12 ADVICE)."""
        import hmac

        if not signature.isascii():
            return False  # hex proofs are ASCII; compare_digest would raise
        sig = signature.upper()
        # evaluate ALL windows (no short-circuit) through compare_digest
        return (
            sum(
                hmac.compare_digest(self.sign(arg, off), sig)
                for off in (0, -1, 1)
            )
            > 0
        )
