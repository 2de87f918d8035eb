"""Execution-context handle — the Spark analog of ``cuml.Handle``.

Reference: python/cuml/common/handle.pyx:32 — ``Handle`` wraps the C++
``cumlHandle`` carrying the execution context (CUDA stream + device
allocator); every estimator ctor accepts ``handle=`` (base.pyx:70-81) and
``handle.sync()`` blocks until queued device work completes.

Here the execution context is the SparkSession.  A ``Handle`` optionally
pins a specific session (otherwise estimators resolve the active one);
``setStream`` / ``enableRMM`` / ``n_streams`` are accepted for drop-in
compatibility and documented as no-ops — Spark actions are synchronous and
memory is executor-managed, so there is nothing to queue or pre-allocate.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import SparkSession


class Stream:
    """No-op stand-in for ``cuml.cuda.Stream`` (common/cuda.pyx:53).

    Spark has no user-visible async device streams — every DataFrame action
    is a synchronous job — so ``sync()`` returns immediately.  Exists so
    reference-style code (``stream = cuda.Stream(); handle.setStream(stream)``)
    ports by renaming imports only.
    """

    def sync(self) -> None:
        return None


class Handle:
    """Lightweight execution-context wrapper (handle.pyx:32 analog)."""

    def __init__(self, spark: Optional[SparkSession] = None, n_streams: int = 0):
        self._spark = spark
        self.n_streams = n_streams  # parity; no device streams under Spark
        self._stream: Optional[Stream] = None

    @property
    def spark(self) -> SparkSession:
        sess = self._spark or SparkSession.getActiveSession()
        if sess is None:
            from cuml_spark.core.session import get_spark

            sess = get_spark()
        return sess

    # -- reference-API compatibility no-ops (handle.pyx:49-76) -------------
    def setStream(self, stream: Stream) -> None:
        self._stream = stream

    def getStream(self) -> Optional[Stream]:
        return self._stream

    def enableRMM(self, **kwargs: Any) -> None:
        """Device allocator selection — executor memory is Spark-managed."""
        return None

    def sync(self) -> None:
        """Reference semantics: block until queued work completes.  Spark
        actions are synchronous, so there is never queued work to wait on."""
        return None

    def __getstate__(self):  # match base.pyx:147 — handles are not pickled
        return {"n_streams": self.n_streams}

    def __setstate__(self, state):
        self._spark = None
        self._stream = None
        self.n_streams = state.get("n_streams", 0)
