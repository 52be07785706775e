"""Host -> device staging pipeline (component J, SURVEY.md §2.3; the
rebuild of the reference's VideoPipe idea at the PCIe boundary, §3.5/§5.8).

Three overlapped stages (config 4, BASELINE.json:10):
  decode (cv2/libav, GIL-released)  ->  batch assembly + device_put
  (background thread, bounded queue)  ->  device compute (consumer).

`jax.device_put` is asynchronous: the transfer is enqueued by the staging
thread and overlaps both further decode and the consumer's running device
program. The bounded queue gives backpressure and bounds host memory
(queue_depth * batch frames).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from tpuva.io.base import VideoBase

_SENTINEL = object()


class BatchStager:
    """Iterate (n_valid, device_batch) pairs for a video.

    device_batch is a (batch, H, W[, 3]) uint8 jax array already on (or in
    flight to) `device`; n_valid <= batch marks real rows (the tail batch
    is padded by repeating the last frame).
    """

    def __init__(
        self,
        video: VideoBase,
        batch: int,
        queue_depth: int = 2,
        device=None,
        sharding=None,
        use_native: bool = False,
    ):
        self._video = video
        self._batch = batch
        self._device = device
        self._sharding = sharding
        self._queue: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._use_native = use_native
        target = self._feeder_native if use_native else self._feeder
        self._thread = threading.Thread(
            target=target, name="batch-stager", daemon=True
        )
        self._started = False

    def _put_device(self, arr: np.ndarray):
        import jax

        target = self._sharding or self._device
        if target is not None:
            return jax.device_put(arr, target)
        return jax.device_put(arr)

    def _feeder(self):
        try:
            for n, stack in self._video.iter_batches(self._batch, pad_last=True):
                if self._stop.is_set():
                    return
                self._queue.put((n, self._put_device(stack)))
            self._queue.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 - relayed to consumer
            self._error = e
            try:
                self._queue.put(_SENTINEL)
            except Exception:
                pass

    def _feeder_native(self):
        """Three-stage native pipeline: a decode thread pushes frames into
        the C++ ring buffer (native/batcher.cpp, batch assembly off the
        GIL); this thread pops padded batches and stages them on device."""
        from tpuva.io.native import NativeBatcher

        v = self._video
        shape = (v.height, v.width, 3) if v.is_color else (v.height, v.width)
        ring = NativeBatcher(shape, self._batch, depth=2)

        def decode():
            try:
                for frame in v:
                    if self._stop.is_set():
                        break
                    ring.push(frame)
            finally:
                ring.close()

        t = threading.Thread(target=decode, name="decoder", daemon=True)
        t.start()
        try:
            while True:
                n, stack = ring.pop()
                if n == 0:
                    break
                if self._stop.is_set():
                    return
                self._queue.put((n, self._put_device(stack)))
            self._queue.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 - relayed to consumer
            self._error = e
            try:
                self._queue.put(_SENTINEL)
            except Exception:
                pass
        finally:
            t.join(timeout=5)

    def __iter__(self):
        if self._started:
            raise RuntimeError("BatchStager supports a single pass")
        self._started = True
        self._thread.start()
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item

    @property
    def depth(self) -> int:
        return self._queue.qsize()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        if self._started:
            self._thread.join(timeout=5)
