"""Single-writer enforcement for the persistent-store family (fpstore /
annstore / aggstore / invstore).

Every store in the family commits a write as *new generation files, then a
manifest/meta rewrite LAST*.  That discipline makes a crashed writer safe,
but two CONCURRENT writers are not: both can compute the same generation
number from the same directory listing, and the last meta writer silently
erases the other's commit (n_docs / gens divergence — ADVICE r3 #2).

``store_writer_lock`` closes that race on one host: an exclusive, blocking
``fcntl.flock`` on ``<store_dir>/.writer.lock`` held for the whole
ingest/compact (generation numbering + data files + meta commit).  A second
writer blocks until the first commits, then sees its committed meta and
numbers past it — two concurrent ingests serialize into two generations
instead of racing into one.

Multi-node contract (documented, not enforced): ``flock`` is only reliable
on a local filesystem.  A store directory on shared storage (NFS / object
store) must have ONE coordinating writer process — e.g. the crawl driver or
a single ``ray job`` — exactly like the manifest-last staging caveats in
clustered.py.  Readers never take the lock: search/read paths see only
COMMITTED generations by construction, so they are safe concurrent with a
writer.
"""

from __future__ import annotations

import contextlib
import fcntl
import os


def locked_writer(fn):
    """Decorator enforcing the single-writer contract on a public store
    write entry point (its ``store_dir`` parameter names the store)."""
    import functools
    import inspect

    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind(*args, **kwargs)
        with store_writer_lock(bound.arguments["store_dir"]):
            return fn(*args, **kwargs)

    return wrapper


@contextlib.contextmanager
def store_writer_lock(store_dir: str):
    """Exclusive writer lock for ``store_dir`` (blocking).  Reentrant-free:
    a writer must take it once at its public entry point only."""
    os.makedirs(store_dir, exist_ok=True)
    fd = os.open(os.path.join(store_dir, ".writer.lock"),
                 os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
