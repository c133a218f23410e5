"""Build-once persisted-artifact cache, shared by every served-index
operator family (vector ANN index, lexical postings index).

A deployment builds its serving artifacts once per corpus version and
serves queries from storage; locally the same economics are reproduced
with a per-user cache directory keyed on a content signature (data path +
parquet mtime + format/parameter version), so neither regenerated
testdata nor changed index code ever serves a stale artifact.

Concurrency/safety shape (three hazards, three answers):

- *racing builders*: each process builds into its own ``.build-*`` temp
  dir and atomically ``os.rename``\\ s it into place; the loser's rename
  fails (non-empty target), it discards its copy and uses the winner's —
  a COMPLETE marker can never cover a mixed two-writer artifact.
- *interrupted build*: the marker is written inside the temp dir BEFORE
  the rename, so the installed directory is complete by construction; a
  killed build leaves only an ignored temp dir.
- *pre-planted path*: everything lives under a per-user 0700 base
  directory whose ownership is verified — another local user cannot
  plant a poisoned artifact at the predictable location.
"""

from __future__ import annotations

from typing import Callable


def source_digest(*parts) -> str:
    """Short stable digest of code-defined semantics for artifact cache
    signatures: each part is either a literal string or an object whose
    ``inspect.getsource`` defines the cached artifact's behavior.  One
    definition for every consumer (postings index, live stream runs), so
    the digest idiom cannot drift between them."""
    import hashlib
    import inspect

    rendered = [p if isinstance(p, str) else inspect.getsource(p) for p in parts]
    return hashlib.md5("||".join(rendered).encode()).hexdigest()[:12]


def build_once_path(sig: str, prefix: str, build: Callable[[str], None]) -> str:
    """Deterministic on-disk location of the artifact identified by
    ``sig``; runs ``build(tmp_dir)`` exactly once per signature (across
    sessions AND processes) and returns the installed directory."""
    import getpass
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    digest = hashlib.md5(sig.encode()).hexdigest()[:16]
    try:
        user = getpass.getuser()
    except Exception:  # no passwd entry / env in minimal containers
        user = str(os.getuid())
    base = os.path.join(tempfile.gettempdir(), f"dream_spark_{prefix}_{user}")
    os.makedirs(base, mode=0o700, exist_ok=True)
    # O_NOFOLLOW: a pre-planted SYMLINK at the predictable path must fail
    # (ELOOP), never be followed — stat/chmod through a symlink would let
    # another user redirect the ownership check and the chmod to a target
    # of their choosing.  fstat/fchmod on the held fd close the TOCTOU
    # window between check and chmod.
    fd = os.open(base, os.O_RDONLY | os.O_NOFOLLOW | os.O_DIRECTORY)
    try:
        st = os.fstat(fd)
        if st.st_uid != os.getuid():
            raise RuntimeError(
                f"artifact cache dir {base!r} is owned by uid "
                f"{st.st_uid}, not us ({os.getuid()}) — refusing to load "
                "an artifact another user could have planted"
            )
        os.fchmod(fd, 0o700)  # exist_ok may have accepted weaker modes
    finally:
        os.close(fd)
    path = os.path.join(base, digest)
    marker = os.path.join(path, "COMPLETE")
    if not os.path.exists(marker):
        # per-digest advisory lock: without it, two processes that both
        # see the missing marker each run the full (expensive) build and
        # one copy is discarded — safe (the rename race below still
        # arbitrates) but wasteful for bench's parallel warm pool plus a
        # concurrent check run (r7 ADVICE).  The loser blocks until the
        # winner installs, then takes the marker fast path.
        import fcntl

        lock_fd = os.open(
            os.path.join(base, f".lock-{digest}"), os.O_CREAT | os.O_RDWR, 0o600
        )
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
            if not os.path.exists(marker):
                tmp = os.path.join(base, f".build-{digest}-{uuid.uuid4().hex[:8]}")
                try:
                    build(tmp)
                    with open(os.path.join(tmp, "COMPLETE"), "w") as f:
                        f.write("ok\n")
                except BaseException:
                    # a raising build (e.g. a live run's stream-drain
                    # timeout) must not leak its temp dir — for live
                    # runs that is a full parquet sink + checkpoint PER
                    # RETRY (r8 ADVICE)
                    shutil.rmtree(tmp, ignore_errors=True)
                    raise
                try:
                    os.rename(tmp, path)
                except OSError:
                    # lost the install race (a builder not holding this
                    # lock, e.g. pre-lock code, renamed first).  Its
                    # artifact is complete (marker precedes rename), so
                    # drop ours.
                    shutil.rmtree(tmp, ignore_errors=True)
                    if not os.path.exists(marker):
                        raise
        finally:
            os.close(lock_fd)  # releases the flock
    return path
