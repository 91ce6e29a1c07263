from beast_spark.operators import dedup, similarity  # noqa: F401
from beast_spark.operators._cache import (  # noqa: F401
    pin_scratch,
    release_scratch_caches,
)
