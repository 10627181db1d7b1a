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

Liveness vs safety:

- A HEARTBEAT thread refreshes the lock file's mtime every
  ``stale_after / 4`` seconds while held, so a merge that legitimately
  runs longer than ``stale_after`` is never mistaken for abandoned —
  only a writer whose PROCESS died (heartbeat stopped) goes stale.
- Breaking a stale lock is an atomic ``rename`` to a waiter-unique
  name: when several waiters decide the same lock is stale, exactly
  one rename succeeds and the losers re-contend — a stat-then-unlink
  break would let a second waiter delete the winner's FRESH lock.
- Each holder writes a unique token into the file and releases only if
  the token still matches, so a holder whose lock was (wrongly or
  rightly) broken can never delete a successor's lock.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
import uuid


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
    release.  Locks whose mtime stops advancing for ``stale_after``
    seconds (dead holder — live ones heartbeat) are broken atomically."""
    os.makedirs(lock_dir, exist_ok=True)
    path = os.path.join(lock_dir, name)
    token = uuid.uuid4().hex
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                age = time.time() - os.stat(path).st_mtime
            except FileNotFoundError:
                continue  # holder released between open and stat
            if age > stale_after:
                # Atomic break: exactly one waiter wins the rename of
                # this inode; the rest get ENOENT and re-contend.
                broken = f"{path}.broken.{uuid.uuid4().hex}"
                try:
                    os.rename(path, broken)
                except FileNotFoundError:
                    continue
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(broken)
                continue
            if time.monotonic() >= deadline:
                raise LockTimeout(
                    f"could not acquire {path} within {timeout}s "
                    f"(held for {age:.0f}s)"
                ) from None
            time.sleep(poll)
    stop = threading.Event()
    try:
        os.write(
            fd,
            json.dumps(
                {"pid": os.getpid(), "token": token, "acquired": time.time()}
            ).encode(),
        )
        os.close(fd)
    except OSError:
        # token never landed (ENOSPC, signal...): release the inode we
        # still provably own, or waiters stall until stale_after
        with contextlib.suppress(OSError):
            os.close(fd)
        with contextlib.suppress(FileNotFoundError):
            os.unlink(path)
        raise
    try:

        def beat() -> None:
            # refresh mtime so a LIVE long-running holder never looks
            # stale; a dead process stops beating and goes stale
            while not stop.wait(max(stale_after / 4.0, 0.05)):
                with contextlib.suppress(OSError):
                    os.utime(path)

        hb = threading.Thread(target=beat, daemon=True)
        hb.start()
        yield
    finally:
        stop.set()
        # Release only OUR lock.  A read-token-then-unlink release has a
        # window: between the token comparison and the unlink, a waiter
        # could break this lock as stale and re-acquire, and the unlink
        # would then delete the SUCCESSOR's live lock.  Claim the inode
        # atomically first (rename to a private name — exactly one of
        # {releaser, breaker} wins), then verify the token on the claimed
        # copy; on mismatch we claimed someone else's lock, so put it back.
        claimed = f"{path}.release.{token}"
        try:
            # Cheap pre-check: don't even attempt the claim when the file
            # already visibly belongs to a successor.
            with open(path) as f:
                if json.load(f).get("token") != token:
                    raise OSError("lock taken over by successor")
            os.rename(path, claimed)
        except OSError:
            pass  # already broken/released; nothing of ours remains
        except json.JSONDecodeError:
            pass  # unreadable lock: leave it for stale-break to clean up
        else:
            try:
                with open(claimed) as f:
                    owner = json.load(f).get("token")
            except (json.JSONDecodeError, OSError):
                owner = None
            if owner == token or owner is None:
                with contextlib.suppress(OSError):
                    os.unlink(claimed)
            else:
                # successor's live lock: restore it (rename is atomic and
                # cannot collide — the successor holds no file at `path`
                # while its inode sits at our private name)
                with contextlib.suppress(OSError):
                    os.rename(claimed, path)
