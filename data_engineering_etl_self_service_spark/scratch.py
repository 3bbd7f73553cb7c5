"""Process-scoped scratch directories for operators/queries that persist
an index, snapshot table, or chunked intermediate as part of their job.

Generation-suffixed per call (ADVICE r4): a still-lazy DataFrame returned
by a *prior* invocation of the same name may reference its files, so the
previous generation is kept alive and only generations older than that
are removed.  The whole root is removed at interpreter exit.

One fixed root per process — never ``tempfile.mkdtemp`` per call, which
leaked a directory per bench/driver run (ADVICE r3).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_GENERATIONS: dict[str, int] = {}
_REGISTERED = False


def _root() -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"data_engineering_etl_self_service_spark-scratch-{os.getpid()}",
    )


def scratch_dir(name: str) -> str:
    """Return a fresh scratch directory for ``name``.

    Layout: ``<tmp>/data_engineering_etl_self_service_spark-scratch-<pid>/<name>-g<N>``
    where ``N`` increments per call.  Generation ``N-1`` survives until
    generation ``N+1`` is requested (its files may back a lazy DataFrame
    returned by the previous invocation); everything older is removed
    eagerly, and the root is rmtree'd via ``atexit``.
    """
    global _REGISTERED
    root = _root()
    if not _REGISTERED:
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _REGISTERED = True
    gen = _GENERATIONS.get(name, 0)
    _GENERATIONS[name] = gen + 1
    for g in range(gen - 1):
        shutil.rmtree(os.path.join(root, f"{name}-g{g}"), ignore_errors=True)
    path = os.path.join(root, f"{name}-g{gen}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path
