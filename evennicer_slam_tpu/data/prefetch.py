"""Background frame prefetcher.

The SLAM loop consumes frames strictly sequentially; decoding a 680x1200
color+depth+event PNG triple costs ~0.2-0.5 s of host time that would
otherwise serialize with TPU compute. This wrapper decodes frame ``i+1`` on a
worker thread while frame ``i`` is being tracked (cv2 releases the GIL during
imdecode). Random access falls through to the underlying reader.
"""

from __future__ import annotations

import threading
from typing import Optional


class PrefetchingReader:
    def __init__(self, reader, ahead: int = 1):
        self._reader = reader
        self._lock = threading.Lock()
        self._cache = {}
        self._thread: Optional[threading.Thread] = None
        self.has_events = getattr(reader, "has_events", False)

    def __len__(self):
        return len(self._reader)

    def __getattr__(self, name):
        return getattr(self._reader, name)

    def _prefetch(self, idx: int):
        try:
            frame = self._reader[idx]
        except Exception:
            return
        with self._lock:
            self._cache = {idx: frame}

    def __getitem__(self, idx: int):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        with self._lock:
            frame = self._cache.pop(idx, None)
        if frame is None:
            frame = self._reader[idx]
        nxt = idx + 1
        if nxt < len(self._reader):
            self._thread = threading.Thread(
                target=self._prefetch, args=(nxt,), daemon=True
            )
            self._thread.start()
        return frame
