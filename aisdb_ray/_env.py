"""Environment shims for the sealed sandbox.

Ray Data's path resolution probes ``fsspec.implementations.http`` on every
read/write (``ray/data/datasource/path_util.py``).  With ``aiohttp`` absent,
that import raises ``ModuleNotFoundError`` (which Ray catches) — but under
*concurrent* imports from pipeline threads a half-initialized module can
surface as a plain ``ImportError`` that Ray does not catch, killing a
partition job.  Register a stub module with an inert ``HTTPFileSystem`` class
so the probe always succeeds and the ``isinstance`` checks are simply False.
"""

from __future__ import annotations

import sys
import types


def install_fsspec_http_shim() -> None:
    try:
        import fsspec.implementations.http  # noqa: F401  (works if aiohttp exists)
        return
    except Exception:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # inert stand-in; never instantiated
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


install_fsspec_http_shim()
