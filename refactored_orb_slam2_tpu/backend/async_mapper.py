"""Asynchronous local-mapping + loop-closing pipeline.

The reference runs LocalMapping and LoopClosing on dedicated threads with a
keyframe queue and stop/abort handshakes, and spawns a further thread per
global BA (System.cc:142-148, LocalMapping.cc:528-709, LoopClosing.cc:556).
This module reproduces that 3-thread split over functional map snapshots:

- **mapping worker**: consumes the keyframe queue, runs triangulation /
  fusion / culling / local BA.  Local BA polls the tracker's ``abort_ba``
  flag between LM chunks (mbAbortBA, LocalMapping.cc:70-78).
- **loop worker**: consumes keyframes the mapping worker finished, runs
  detection + Sim3; loop *correction* takes the map-writer lock (the
  reference's LocalMapping::RequestStop barrier, LoopClosing.cc:380-399).
- **GBA thread** (spawned per loop by the system): optimizes an immutable
  snapshot concurrently with mapping, takes the writer lock only for the
  final merge, and discards its result if the GBA epoch moved
  (mnFullBAIdx, LoopClosing.cc:618-715).

Writer discipline replaces the reference's mutex hierarchy: every mutation
of ``system.map`` happens under ``write_lock`` — the mapping worker takes
it per mutation (dispatch + attribute swap only; device execution and host
syncs run outside it), the tracker takes it only for the (cheap) keyframe
insertion, loop correction and GBA merge take it for their writebacks.  The
tracker's per-frame reads need no lock (MapState arrays are immutable;
attribute swap is atomic), and its per-frame visibility counters are
buffered and flushed at keyframe insertion instead of racing the mapper.
"""

from __future__ import annotations

import contextlib
import queue
import threading


class AsyncMapper:
    def __init__(self, system):
        self.system = system
        self._q: queue.Queue = queue.Queue()
        self._loop_q: queue.Queue = queue.Queue()
        self.write_lock = threading.RLock()
        self._idle = threading.Event()
        self._idle.set()
        self._loop_idle = threading.Event()
        self._loop_idle.set()
        self._exc: Exception | None = None
        self._map_thread = threading.Thread(
            target=self._run_mapping, name="local-mapping", daemon=True
        )
        self._loop_thread = threading.Thread(
            target=self._run_loop, name="loop-closing", daemon=True
        )
        self._map_thread.start()
        self._loop_thread.start()

    @property
    def idle(self) -> bool:
        """Mapping-worker idleness — the reference's AcceptKeyFrames gate
        (Tracking.cc:902); loop closing does not block keyframe insertion."""
        return self._idle.is_set()

    def queue_len(self) -> int:
        return self._q.qsize()

    @contextlib.contextmanager
    def paused(self):
        """Hold the map-writer lock: the mapping worker finishes its current
        keyframe and blocks before the next one (RequestStop semantics)."""
        with self.write_lock:
            yield

    def submit(self, kf_slot: int):
        self._idle.clear()
        self._q.put(kf_slot)

    def submit_loop(self, kf_slot: int):
        self._loop_idle.clear()
        self._loop_q.put(kf_slot)

    def wait_idle(self, timeout: float | None = None) -> bool:
        """Drain mapping, loop closing, and any in-flight GBA."""
        ok = self._idle.wait(timeout) and self._loop_idle.wait(timeout)
        gba = getattr(self.system, "_gba_thread", None)
        if gba is not None and gba.is_alive():
            gba.join(timeout)
            ok = ok and not gba.is_alive()
        return ok

    def shutdown(self):
        self._q.put(None)
        self._map_thread.join(timeout=120)
        self._loop_q.put(None)
        self._loop_thread.join(timeout=120)
        gba = getattr(self.system, "_gba_thread", None)
        if gba is not None and gba.is_alive():
            gba.join(timeout=120)
        if self._exc is not None:
            raise self._exc

    def _run_mapping(self):
        # NOTE: the worker does NOT hold write_lock across a whole keyframe.
        # _mapping_core takes it per map mutation (dispatch + attribute swap,
        # ~ms) and leaves host syncs and device execution outside, so the
        # tracker's keyframe insertion (mapper.paused()) waits milliseconds,
        # not the full mapping pipeline — the single-chip analog of the
        # reference's fine-grained map mutexes (MapPoint.cc/KeyFrame.cc
        # mutex-per-operation, never one lock across LocalMapping::Run).
        while True:
            kf = self._q.get()
            if kf is None:
                return
            try:
                self.system._mapping_core(kf)
                if self.system.loop_closing_enabled:
                    self.submit_loop(kf)
            except Exception as e:  # surfaced at shutdown; tracker continues
                self._exc = e
            finally:
                if self._q.empty():
                    self._idle.set()

    def _run_loop(self):
        while True:
            kf = self._loop_q.get()
            if kf is None:
                return
            try:
                self.system._try_close_loop(kf)
            except Exception as e:
                self._exc = e
            finally:
                if self._loop_q.empty():
                    self._loop_idle.set()
