"""Shared crash-safety primitives for the durable stores.

One rule, applied everywhere a single small file is the commit point
(resume pointers, store manifests): write a temp file, flush + fsync
it, then rename over the target. A plain truncate-and-write leaves a
torn file if the writer dies mid-write — and a rename WITHOUT the
fsync can itself survive a power loss whose unflushed data blocks
never hit disk, yielding an empty committed file. Readers of a
pointer written this way always see either the old or the new
content, never a prefix.
"""

from __future__ import annotations

import os


def atomic_write_text(path: str, text: str) -> None:
    """Atomically replace `path` with `text` (tmp + fsync + rename)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(text)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
