"""Asynchronous output/restart writer.

The reference stalls every rank inside collective PnetCDF writes at each
print/restart interval (write_output_pnetcdf / write_restart_pnetcdf,
io_pnetcdf.F:57-410/1661-2083, called from advance.f:38-49) — compute
stops for the duration of the I/O.  Here the device->host fetch and the
Zarr/TensorStore writes run on a background worker thread: the driver
submits the state reference at an interval boundary and immediately
launches the next segment, so interval N+1 computes while interval N
writes.  Wall clock ≈ compute + first/last write only.

Semantics:

* ``submit(fn, *args)`` enqueues ``fn(*args)`` for the worker.  The jax
  arrays passed must NOT be donated afterwards — the production segment
  path (``stepper.make_run_fn`` / ``mesh.shardmap.make_shardmap_run``)
  runs with ``donate=False``, so state references stay valid; the
  worker's np.asarray fetch proceeds concurrently with the next
  segment's compute.
* at most ``max_pending`` intervals queue before ``submit`` blocks
  (bounds host memory when I/O is slower than compute).
* errors raised by a write surface on the NEXT submit/flush (the same
  fail-the-run contract as the reference's error_status propagation,
  io_pnetcdf.F:43-54).
* multi-process: every process drives its own writer; the cooperative
  per-shard writes inside io.zarrstore keep their process barriers, so
  all processes must submit the same sequence (they do — the driver
  logic is replicated).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional


class AsyncWriter:
    def __init__(self, max_pending: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="extpom-io-writer")
        self._thread.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            fn, args, kw = item
            try:
                fn(*args, **kw)
            except BaseException as e:      # noqa: BLE001 - surfaced later
                self._err = e
            finally:
                self._q.task_done()

    def _raise_pending(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async output write failed") from err

    def submit(self, fn: Callable, *args, **kw) -> None:
        """Enqueue ``fn(*args, **kw)``; blocks only when ``max_pending``
        writes are already queued."""
        self._raise_pending()
        self._q.put((fn, args, kw))

    def flush(self) -> None:
        """Wait for all queued writes to finish; re-raise any failure."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        self.flush()
        self._q.put(None)
        self._thread.join()
