"""Query catalog: every implemented operator exposed as a named query with a
DuckDB oracle twin (the driver-contract surface in ``__spark_entry__.py``).
Importing this package registers all query modules.
"""

from . import catalog
from . import queries_parity  # noqa: F401  (registers on import)
from . import queries_analytics  # noqa: F401
from . import queries_analytics2  # noqa: F401
from . import queries_analytics3  # noqa: F401
from . import queries_collections  # noqa: F401
from . import queries_sampling  # noqa: F401
from . import queries_scalars  # noqa: F401
from . import queries_multijoin  # noqa: F401
from . import queries_northstar  # noqa: F401
from . import queries_northstar2  # noqa: F401
from . import queries_streaming  # noqa: F401
from . import queries_packing  # noqa: F401  (additions stay at the tail)
from . import queries_streamjoin_cms  # noqa: F401
from . import queries_tail2  # noqa: F401

__all__ = ["catalog"]
