"""Asynchronous local-mapping pipeline.

The reference runs LocalMapping and LoopClosing on dedicated threads with a
keyframe queue and stop/abort handshakes (System.cc:142-148,
LocalMapping.cc:528-709).  Here the expensive keyframe-rate work (fusion,
culling, statistics, local BA, loop closing) runs on a worker thread over
functional map snapshots while the tracker keeps tracking against whatever
snapshot it last saw — the reference's "track against the map mid-BA"
tolerance, without any locks, because MapState arrays are immutable.

Protocol (mirrors the reference's semantics):
- keyframe insertion + depth-point creation stay on the tracking thread
  (they are cheap and the tracker needs the results immediately);
- the tracker refuses to create a new keyframe while the mapper is busy —
  the reference's ``bLocalMappingIdle`` gate in NeedNewKeyFrame
  (Tracking.cc:902);
- the mapper publishes its updated MapState by plain attribute swap
  (atomic under the GIL); the only write the tracker performs meanwhile is
  the visibility counters, whose loss during a mapping window is harmless
  statistics drift.
"""

from __future__ import annotations

import queue
import threading


class AsyncMapper:
    def __init__(self, system):
        self.system = system
        self._q: queue.Queue = queue.Queue()
        self._idle = threading.Event()
        self._idle.set()
        self._exc: Exception | None = None
        self._thread = threading.Thread(
            target=self._run, name="local-mapping", daemon=True
        )
        self._thread.start()

    @property
    def idle(self) -> bool:
        return self._idle.is_set()

    def submit(self, kf_slot: int):
        self._idle.clear()
        self._q.put(kf_slot)

    def wait_idle(self, timeout: float | None = None) -> bool:
        return self._idle.wait(timeout)

    def shutdown(self):
        self._q.put(None)
        self._thread.join(timeout=60)
        if self._exc is not None:
            raise self._exc

    def _run(self):
        while True:
            kf = self._q.get()
            if kf is None:
                return
            try:
                self.system._mapping_pipeline(kf)
            except Exception as e:  # surfaced at shutdown; tracker continues
                self._exc = e
            finally:
                if self._q.empty():
                    self._idle.set()
