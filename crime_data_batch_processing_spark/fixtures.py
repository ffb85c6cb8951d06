"""Derived-fixture scratch management shared by every operator that
materializes state from a testdata table (CSV/JSON/ORC/binary copies,
the Derby JDBC database, rollup/zone-map/sketch tables).

Two invariants every fixture needs:

1. **Generation safety.** Scratch keys hash the absolute sf_dir AND
   each source table's (size, mtime) fingerprint: the round driver
   rewrites /root/testdata in place between rounds while /tmp can
   survive, and a fixture built from the previous generation would
   otherwise serve silently stale rows. A regeneration keys a fresh
   scratch dir and the fixture rebuilds. (Path-only hashing also
   prevents two sf trees with the same basename from sharing state.)

2. **Concurrency safety.** `build_once` elects exactly one builder
   per scratch dir across processes with an O_EXCL lockfile; losers
   wait for the completion marker, so a half-written fixture is never
   read (the idiom proven by the embedded-Derby loader, which is
   additionally single-JVM). The winner heartbeats the lockfile while
   building, so a LIVE long build is never mistaken for an orphaned
   lock; waiters only break a lock whose (ino, mtime) still match the
   stat that flagged it stale, so a refreshed or re-created lock is
   never unlinked by a racing waiter.
"""

from __future__ import annotations

import hashlib
import os
import threading
import time
from collections.abc import Callable


def scratch_dir(kind: str, sf_dir: str, *source_tables: str) -> str:
    """Scratch root for a fixture of `kind` derived from the given
    testdata tables."""
    h = hashlib.sha256(os.path.abspath(sf_dir).encode())
    for name in source_tables:
        p = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
        st = os.stat(p)
        h.update(f"|{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return f"/tmp/cdbp_{kind}/{h.hexdigest()[:16]}"


#: A lock whose mtime is older than this with no completion marker is
#: presumed orphaned (builder SIGKILLed / OOM-killed before its
#: finally-unlink). The winner re-touches the lock every HEARTBEAT_S,
#: so a live builder's lock can only look stale if its whole process
#: is frozen for STALE_LOCK_S — at which point breaking it is the
#: intended self-healing.
STALE_LOCK_S = 180
HEARTBEAT_S = 15


def _heartbeat(lockfile: str, stop: threading.Event) -> None:
    while not stop.wait(HEARTBEAT_S):
        try:
            os.utime(lockfile)
        except OSError:
            return  # lock broken from under us; builder's unlink will no-op


def _break_if_still_stale(lockfile: str, observed: os.stat_result) -> None:
    """Unlink the lock only if it is the SAME file (ino) with the SAME
    mtime we judged stale — a heartbeat refresh or a re-created lock
    from a newly elected builder makes this a no-op, closing the
    stat-old/unlink-new race."""
    try:
        cur = os.stat(lockfile)
        if (cur.st_ino, cur.st_mtime_ns) == (
            observed.st_ino,
            observed.st_mtime_ns,
        ):
            os.unlink(lockfile)
    except FileNotFoundError:
        pass


def build_once(base: str, build: Callable[[], None]) -> None:
    """Run `build()` exactly once per scratch dir across processes.

    Losers of the lockfile election wait for the winner's completion
    marker. The winner heartbeats the lock (mtime refresh) for the
    duration of the build; waiters treat a lock as dead only when its
    mtime has not advanced for STALE_LOCK_S, and their wait deadline
    extends whenever they observe a refresh, so arbitrarily long live
    builds neither get their lock broken nor time their waiters out.
    """
    marker = f"{base}/_BUILD_OK"
    while not os.path.exists(marker):
        os.makedirs(base, exist_ok=True)
        lockfile = f"{base}/_BUILD_LOCK"
        try:
            fd = os.open(lockfile, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            deadline = time.monotonic() + STALE_LOCK_S + 30
            last_seen: tuple[int, int] | None = None
            while not os.path.exists(marker):
                try:
                    st = os.stat(lockfile)
                except FileNotFoundError:
                    break  # holder finished or lock was broken: re-elect
                ident = (st.st_ino, st.st_mtime_ns)
                if ident != last_seen:
                    # fresh lock or heartbeat observed — restart the clock
                    last_seen = ident
                    deadline = time.monotonic() + STALE_LOCK_S + 30
                if time.time() - st.st_mtime > STALE_LOCK_S:
                    _break_if_still_stale(lockfile, st)
                    break
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"builder holding {lockfile} did not finish in time"
                    )
                time.sleep(0.25)
        else:
            stop = threading.Event()
            hb = threading.Thread(
                target=_heartbeat, args=(lockfile, stop), daemon=True
            )
            hb.start()
            try:
                build()
                open(marker, "w").close()
            finally:
                stop.set()
                hb.join(timeout=HEARTBEAT_S + 1)
                try:
                    # unlink ONLY our own lock: if this process froze
                    # past STALE_LOCK_S, a waiter broke the lock and a
                    # successor builder re-created it — an ino check
                    # against the fd we still hold keeps us from
                    # deleting the successor's LIVE lock (the winner-
                    # side twin of _break_if_still_stale)
                    if os.stat(lockfile).st_ino == os.fstat(fd).st_ino:
                        os.unlink(lockfile)
                except FileNotFoundError:
                    pass  # broken by a waiter while we were frozen
                finally:
                    os.close(fd)
            return
