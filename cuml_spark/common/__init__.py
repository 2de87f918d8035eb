"""``cuml_spark.common`` — import-path parity with ``cuml.common``
(python/cuml/common/: base.pyx, handle.pyx, cuda.pyx).  Same objects as the
package root; reference-style imports (``from cuml.common.base import Base``,
``import cuml.common.cuda as cuda``) port by renaming the package."""

from cuml_spark.core import handle as cuda  # noqa: F401  (Stream lives here)
from cuml_spark.core.base import Base  # noqa: F401
from cuml_spark.core.handle import Handle  # noqa: F401
