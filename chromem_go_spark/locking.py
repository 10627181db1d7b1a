"""Cross-writer mutual exclusion for persistent collections.

The plain-Parquet persistence layer commits an upsert/delete as a
read-merge-write over the collection's data path.  Two concurrent
writers interleaving those sections lose updates (writer B's read
misses writer A's unflushed merge, B's write then clobbers it) — the
classic lost-update race a Delta/Iceberg MERGE avoids with optimistic
commit protocols.  Delta is not available in this environment, so the
same guarantee comes from pessimistic serialization: a lock file
created with ``O_CREAT | O_EXCL``, which is atomic on POSIX for every
local/NFSv4 filesystem and works across both threads and processes.

On a lakehouse deployment the collection layer swaps this for the table
format's native transaction (see Collection._upsert docstring); the
lock file is the single-filesystem analog, and the reference's
process-wide RWMutex (reference collection.go:16-29) is the
single-process analog of the same contract.

Crash safety: a writer that dies holding the lock leaves the file
behind; waiters treat a lock older than ``stale_after`` seconds as
abandoned and break it.  Breaking is itself racy-but-safe: after the
unlink every waiter re-contends on ``O_EXCL`` and exactly one wins.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class LockTimeout(TimeoutError):
    pass


@contextlib.contextmanager
def write_lock(
    lock_dir: str,
    name: str = ".write.lock",
    timeout: float = 60.0,
    stale_after: float = 300.0,
    poll: float = 0.05,
):
    """Hold ``<lock_dir>/<name>`` exclusively for the duration of the
    ``with`` block; blocks up to ``timeout`` seconds for a holder to
    release, breaking locks older than ``stale_after`` seconds."""
    os.makedirs(lock_dir, exist_ok=True)
    path = os.path.join(lock_dir, name)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                age = time.time() - os.stat(path).st_mtime
                if age > stale_after:
                    os.unlink(path)  # abandoned by a dead writer
                    continue
            except FileNotFoundError:
                continue  # holder released between open and stat
            if time.monotonic() >= deadline:
                raise LockTimeout(
                    f"could not acquire {path} within {timeout}s "
                    f"(held for {age:.0f}s)"
                ) from None
            time.sleep(poll)
    try:
        os.write(
            fd,
            json.dumps({"pid": os.getpid(), "acquired": time.time()}).encode(),
        )
        os.close(fd)
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(path)
