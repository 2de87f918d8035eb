"""Handle / cuda API-compatibility surface (handle.pyx:32, cuda.pyx:53).

Reference-style code constructs a Handle, attaches a Stream, passes
``handle=`` to any estimator, and calls ``handle.sync()`` after fitting —
all of that must port by renaming imports only."""

from __future__ import annotations

import pickle

import cuml_spark as cs


def test_handle_stream_surface():
    h = cs.Handle(n_streams=4)
    s = cs.cuda.Stream()
    h.setStream(s)
    assert h.getStream() is s
    h.enableRMM()  # documented no-op: executor memory is Spark-managed
    assert h.sync() is None and s.sync() is None
    assert h.n_streams == 4


def test_estimators_accept_handle():
    h = cs.Handle()
    for est in (cs.KMeans(n_clusters=2, handle=h),
                cs.LinearRegression(handle=h),
                cs.PCA(n_components=1, handle=h)):
        assert est.handle is h
    # default-constructed when omitted (base.pyx:81)
    assert isinstance(cs.Ridge(alpha=1.0).handle, cs.Handle)


def test_handle_pickles_without_session(spark):
    h = cs.Handle(spark=spark, n_streams=2)
    h2 = pickle.loads(pickle.dumps(h))
    assert h2.n_streams == 2
    # pinned session is stripped (base.pyx:147 semantics); resolution falls
    # back to the active session
    assert h2._spark is None
    assert h2.spark is not None


def test_handle_resolves_active_session(spark):
    assert cs.Handle().spark is spark


def test_common_module_path_parity():
    """Reference-style deep imports (cuml.common.base / .handle / .cuda)
    resolve to the same objects."""
    import cuml_spark.common.cuda as cuda
    from cuml_spark.common import Base as B1
    from cuml_spark.common.base import Base as B2
    from cuml_spark.common.handle import Handle as H2

    assert B1 is B2 is cs.Base
    assert H2 is cs.Handle
    assert cuda.Stream is cs.cuda.Stream
