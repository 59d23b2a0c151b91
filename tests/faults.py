"""Fault-injecting filesystem wrappers for contract tests.

ObjectStoreFS gives LocalFS S3-style semantics so the commit
protocol's guarantees are pinned where they are actually stressed
(r9 verdict #3).  lag=0 models MODERN object stores (strongly
consistent reads/listings, still no atomic rename, conditional create
only) and is suite-safe: read-your-writes holds, so the full behavior
matrix can run on it.  lag>0 models legacy list-after-write
inconsistency and breaks read-your-writes BY DESIGN — use it only in
tests that drain the lag explicitly (the commit-race pins in
test_protocol_contracts.py).
"""

from __future__ import annotations

import os


class ObjectStoreFS:
    """LocalFS with object-store fault injection for contract tests.

    - ``listdir`` hides entries created within the last ``lag``
      listing calls (list-after-write lag); direct per-key GETs
      (``exists``/``read_text``) stay strong, matching modern S3.
    - ``rename`` is copy-then-delete — callers relying on rename
      atomicity would observe src+dst coexisting.  The catalog never
      calls it (generation flips + replace_text replaced the r2
      rename-swap), which this suite effectively proves.
    - ``create_exclusive`` remains conditional: the one primitive the
      commit protocol is allowed to lean on.
    """

    def __init__(self, lag: int = 3):
        from mandoline_spark.fs import LocalFS

        self._inner = LocalFS()
        self._lag = lag
        self._fresh: dict[str, int] = {}

    def _mark(self, path: str) -> None:
        self._fresh[os.path.normpath(path)] = self._lag

    def listdir(self, path: str) -> list[str]:
        names = self._inner.listdir(path)
        base = os.path.normpath(path)
        visible = [
            n
            for n in names
            if self._fresh.get(os.path.join(base, n), 0) <= 0
        ]
        for k in list(self._fresh):
            self._fresh[k] -= 1
            if self._fresh[k] <= 0:
                del self._fresh[k]
        return visible

    def rename(self, src: str, dst: str) -> None:
        import shutil as _sh

        if os.path.isdir(src):
            _sh.copytree(src, dst)
            _sh.rmtree(src)
        else:
            _sh.copy2(src, dst)
            os.remove(src)
        self._mark(dst)

    def write_text(self, path: str, text: str) -> None:
        self._inner.write_text(path, text)
        self._mark(path)

    def replace_text(self, path: str, text: str) -> None:
        self._inner.replace_text(path, text)
        self._mark(path)

    def create_exclusive(self, path: str, text: str) -> bool:
        ok = self._inner.create_exclusive(path, text)
        if ok:
            self._mark(path)
        return ok

    def makedirs(self, path: str) -> None:
        self._inner.makedirs(path)
        self._mark(path)

    def __getattr__(self, attr):
        return getattr(self._inner, attr)
