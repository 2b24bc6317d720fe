"""crossai_ts_ray -- a Ray-Data-native time-series rollup / downsample /
retention engine with the query and data-processing capabilities of
AIoT-Group-UoP/crossai-ts, re-expressed Ray-Data-first.

Never calls ``ray.init()``: only CLI entry points, ``bench.py`` and the test
fixture own a Ray session (driver contract in ``__ray_entry__.py``).
"""

def _patch_fsspec_http() -> None:
    """fsspec's http module is importable but broken without aiohttp, and
    Ray's path resolution (_is_http_filesystem) only catches
    ModuleNotFoundError -- under concurrent imports (threaded partition
    pipelines) the partially-initialized module surfaces as a plain
    ImportError.  Install a stub class so the isinstance check (the only use)
    deterministically returns False."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        pass
    import sys
    import types

    mod = sys.modules.get("fsspec.implementations.http")
    if mod is None:
        mod = types.ModuleType("fsspec.implementations.http")
        sys.modules["fsspec.implementations.http"] = mod
    if not hasattr(mod, "HTTPFileSystem"):
        mod.HTTPFileSystem = type("HTTPFileSystem", (), {})


_patch_fsspec_http()

from .schema import DEFAULT_TIERS, SMALL_TIERS, TOKEN_SCHEMA, Tier

__all__ = ["DEFAULT_TIERS", "SMALL_TIERS", "TOKEN_SCHEMA", "Tier"]
__version__ = "0.1.0"
