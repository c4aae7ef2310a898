"""Single-writer lock — Lucene ``write.lock`` analog.

Lucene guards an index directory with ``write.lock`` so two
``IndexWriter``s can never interleave segment writes (the reference
opens its writer over exactly that surface; Lucene 3.6 default is
``NativeFSLockFactory``). This engine's writers are op-granular
(``build_segment`` / ``delete_docs*`` / ``compact`` / ``add_indexes``
each read the prior view, write tables, then commit ``stats.json``
last), so the lock is held per operation: two concurrent writers would
otherwise read the same prior view and assign colliding ordinals /
doc_ids.

Mechanics: atomic ``O_CREAT|O_EXCL`` create of ``write.lock`` holding a
``{pid, host, ts}`` payload. A lock left by a DEAD process on the SAME
host is stale and silently broken (Lucene's ``unlockIndex`` analog,
but automatic — liveness is checkable here); a lock held by a live
process or another host raises :class:`LockHeldError` immediately
(Lucene's ``LockObtainFailedException``).

Scale note: create-exclusive is atomic on POSIX filesystems; object
stores (S3 et al.) lack that primitive — there, like Lucene's
``NoLockFactory`` deployments, coordination belongs to the job
scheduler (one writer job per index), and this module can be bypassed
with ``enabled=False``. The engine's stats-last commit convention means
a lost race corrupts nothing — the damage is limited to one writer's
segment being orphaned, which ``cleanup``/``list_segments`` ignore.
"""

from __future__ import annotations

import json
import os
import socket
import time
from contextlib import contextmanager

LOCK_NAME = "write.lock"


class LockHeldError(RuntimeError):
    """Another live writer holds the index's write lock
    (``LockObtainFailedException`` analog)."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


@contextmanager
def write_lock(index_dir: str, enabled: bool = True):
    """Hold the index's single-writer lock for the duration of one
    write operation. Reads never take it (Lucene readers don't
    either — the stats-last commit gives them snapshot consistency)."""
    if not enabled:
        yield
        return
    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, LOCK_NAME)
    me = {"pid": os.getpid(), "host": socket.gethostname(), "ts": time.time()}
    for attempt in (0, 1):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if attempt == 1:
                raise LockHeldError(
                    f"write lock at {path} is held; if the holder is known "
                    "dead on another host, remove the file manually"
                ) from None
            try:
                with open(path) as f:
                    holder = json.load(f)
            except (OSError, ValueError):
                holder = None  # mid-write or corrupt: treat as breakable
            # NON-reentrant, like Lucene's IndexWriter: a live holder —
            # including this very process (nested writers are a bug,
            # not a convenience) — means held
            if (
                holder is not None
                and holder.get("host") == me["host"]
                and _pid_alive(int(holder.get("pid", -1)))
            ):
                raise LockHeldError(
                    f"write lock at {path} held by live pid "
                    f"{holder['pid']} on {holder['host']}"
                ) from None
            if (
                holder is not None
                and holder.get("host") not in (me["host"], None)
            ):
                raise LockHeldError(
                    f"write lock at {path} held by {holder.get('pid')}@"
                    f"{holder.get('host')} — cross-host liveness is not "
                    "checkable; remove the file manually if it is stale"
                ) from None
            # same-host dead holder (or our own re-entry/corrupt file):
            # stale — break it and retry the exclusive create once
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
    try:
        os.write(fd, json.dumps(me).encode())
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
