"""SPSC frame ring buffer: native-backed with a pure-Python fallback.

Carries fixed-size per-frame payloads (e.g. a 180-float feature vector + a
48x96 ROI) from the capture/landmark thread to the device-dispatch thread.
``push`` fails (returns False) when full — deliberate frame dropping, counted
in ``dropped`` — rather than overwriting a clip in flight.
"""

from __future__ import annotations

import ctypes
import threading
from collections import deque
from typing import Optional

import numpy as np

from . import native


class FrameRing:
    """Fixed-capacity SPSC ring of ``slot_bytes``-sized byte payloads."""

    def __init__(self, capacity: int, slot_bytes: int):
        self.slot_bytes = int(slot_bytes)
        lib = native.load()
        self._lib = lib
        if lib is not None:
            self._h = lib.rb_create(capacity, slot_bytes)
            if not self._h:
                raise MemoryError("rb_create failed")
            self.capacity = int(lib.rb_capacity(self._h))
        else:
            self._h = None
            self.capacity = 1
            while self.capacity < max(2, capacity):
                self.capacity *= 2
            self._q: deque = deque()
            self._qlock = threading.Lock()
            self._dropped = 0

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.rb_destroy(self._h)
            self._h = None

    @property
    def native(self) -> bool:
        return self._h is not None

    def __len__(self) -> int:
        if self._h is not None:
            return int(self._lib.rb_size(self._h))
        with self._qlock:
            return len(self._q)

    @property
    def dropped(self) -> int:
        if self._h is not None:
            return int(self._lib.rb_dropped(self._h))
        return self._dropped

    def push(self, payload: np.ndarray, stamp: int = 0) -> bool:
        buf = np.ascontiguousarray(payload).view(np.uint8).reshape(-1)
        if self._h is not None:
            return bool(
                self._lib.rb_push(
                    self._h,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    buf.nbytes,
                    stamp,
                )
            )
        with self._qlock:
            if len(self._q) >= self.capacity:
                self._dropped += 1
                return False
            self._q.append((buf.copy(), stamp))
            return True

    def pop(self) -> Optional[tuple[np.ndarray, int]]:
        out = np.empty(self.slot_bytes, np.uint8)
        if self._h is not None:
            stamp = ctypes.c_uint64()
            ok = self._lib.rb_pop(
                self._h,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.nbytes,
                ctypes.byref(stamp),
            )
            return (out, int(stamp.value)) if ok else None
        with self._qlock:
            if not self._q:
                return None
            buf, stamp = self._q.popleft()
        out[: len(buf)] = buf[: self.slot_bytes]
        return out, stamp

    def pop_batch(self, max_items: int) -> tuple[np.ndarray, np.ndarray]:
        """Drain up to max_items; returns (payloads (n, slot_bytes) u8,
        stamps (n,) u64)."""
        if self._h is not None:
            out = np.empty((max_items, self.slot_bytes), np.uint8)
            stamps = np.empty(max_items, np.uint64)
            n = int(
                self._lib.rb_pop_batch(
                    self._h,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    max_items,
                    stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                )
            )
            return out[:n], stamps[:n]
        items = []
        for _ in range(max_items):
            it = self.pop()
            if it is None:
                break
            items.append(it)
        if not items:
            return (np.empty((0, self.slot_bytes), np.uint8),
                    np.empty(0, np.uint64))
        return (np.stack([p for p, _ in items]),
                np.asarray([s for _, s in items], np.uint64))
