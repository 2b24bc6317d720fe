"""crossai_ts_ray -- a Ray-Data-native time-series rollup / downsample /
retention engine with the query and data-processing capabilities of
AIoT-Group-UoP/crossai-ts, re-expressed Ray-Data-first.

Never calls ``ray.init()``: only CLI entry points, ``bench.py`` and the test
fixture own a Ray session (driver contract in ``__ray_entry__.py``).
"""

def _tune_malloc() -> None:
    """Keep large allocations on the retained glibc heap (mallopt
    M_MMAP_THRESHOLD / M_TRIM_THRESHOLD).

    This host is a Firecracker-style VM where first-touch page faults cost
    ~10us/page; numpy's big temporaries normally go through mmap/munmap, so
    every Ray task re-faults hundreds of MB and vectorized kernels measure
    10x slower than warm (observed: merge_finalize 3.8s cold vs 0.4s warm on
    identical input).  Retaining the heap makes pages fault once per worker
    process.  Runs in every process that imports this package -- including
    Ray workers deserializing stage functions.  Tradeoff: per-worker RSS
    stays at its high-water mark (bounded by batch sizes).  Disable with
    GRAFT_NO_MALLOC_TUNE=1.
    """
    import os

    if os.environ.get("GRAFT_NO_MALLOC_TUNE") == "1":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass  # non-glibc platform: default allocator behavior


_tune_malloc()


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
