"""crossai_ts_ray -- a Ray-Data-native time-series rollup / downsample /
retention engine with the query and data-processing capabilities of
AIoT-Group-UoP/crossai-ts, re-expressed Ray-Data-first.

Never calls ``ray.init()``: only CLI entry points, ``bench.py`` and the test
fixture own a Ray session (driver contract in ``__ray_entry__.py``).
"""

from .schema import DEFAULT_TIERS, SMALL_TIERS, TOKEN_SCHEMA, Tier

__all__ = ["DEFAULT_TIERS", "SMALL_TIERS", "TOKEN_SCHEMA", "Tier"]
__version__ = "0.1.0"
