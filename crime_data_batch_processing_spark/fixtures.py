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
   additionally single-JVM).
"""

from __future__ import annotations

import hashlib
import os
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


#: A lock older than this is presumed orphaned (builder SIGKILLed /
#: OOM-killed before its finally-unlink) and is broken by the next
#: caller. Builds here are tens of seconds at bench SF; 180s leaves
#: generous headroom while keeping a wedged fixture self-healing.
STALE_LOCK_S = 180


def build_once(base: str, build: Callable[[], None]) -> None:
    """Run `build()` exactly once per scratch dir across processes.

    Losers of the lockfile election wait for the winner's completion
    marker. A lock whose mtime exceeds STALE_LOCK_S with no marker is
    treated as a dead builder: it is removed (best-effort — racing
    removers are harmless, the O_EXCL retry re-elects) and the
    election re-runs, so a hard-killed process can never wedge every
    future run the way a permanent lock would.
    """
    marker = f"{base}/_BUILD_OK"
    while not os.path.exists(marker):
        os.makedirs(base, exist_ok=True)
        lockfile = f"{base}/_BUILD_LOCK"
        try:
            fd = os.open(lockfile, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            deadline = time.monotonic() + STALE_LOCK_S + 30
            while not os.path.exists(marker):
                try:
                    age = time.time() - os.stat(lockfile).st_mtime
                except FileNotFoundError:
                    break  # holder finished or lock was broken: re-elect
                if age > STALE_LOCK_S:
                    try:
                        os.unlink(lockfile)
                    except FileNotFoundError:
                        pass
                    break
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"builder holding {lockfile} did not finish in time"
                    )
                time.sleep(0.25)
        else:
            try:
                build()
                open(marker, "w").close()
            finally:
                os.close(fd)
                os.unlink(lockfile)
            return
