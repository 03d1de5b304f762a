"""Content-fingerprinted scratch artifacts with stage-then-swap.

Three registered queries materialize a derived on-disk artifact once
per source-data fingerprint (a range-compacted layout, two
transaction-log tables). Round 6's review found the pattern
copy-pasted three times with drifting rigor (one copy hashed only the
head of the source file; one validated only the latest snapshot) — so
the staleness and crash-recovery semantics live here once:

- ``content_fingerprint``: size + ns-mtime + FIRST AND LAST 64 KiB
  digest of the source file, so a regenerated testdata file (even
  same-size within the same mtime second) gets a fresh artifact
  instead of silently serving stale rows;
- ``ensure_scratch``: build into a per-process stage dir, atomically
  rename into place; two concurrent builders (gate sim + pytest)
  never read a half-written artifact — the rename loser keeps the
  winner's identical copy; a CORRUPT survivor (e.g. a /tmp cleaner
  removed files) is replaced instead of failing forever.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Callable

_EDGE = 65536  # bytes hashed from each end of the source file


def content_fingerprint(src_path: str, extra: str = "") -> str:
    """12-hex-char fingerprint of a source file's identity + content
    edges (+ ``extra`` to separate artifacts derived differently from
    the same source)."""
    st = os.stat(src_path)
    h = hashlib.md5(
        f"{src_path}:{st.st_size}:{st.st_mtime_ns}:{extra}".encode()
    )
    with open(src_path, "rb") as f:
        h.update(f.read(_EDGE))
        if st.st_size > _EDGE:
            f.seek(-_EDGE, os.SEEK_END)
            h.update(f.read(_EDGE))
    return h.hexdigest()[:12]


def ensure_scratch(
    scratch_dir: str,
    build: Callable[[str], None],
    intact: Callable[[str], bool],
) -> None:
    """Make ``scratch_dir`` exist and satisfy ``intact``: build into a
    stage dir and atomically rename in, replacing a corrupt survivor,
    keeping a concurrent winner's identical copy."""
    if intact(scratch_dir):
        return
    stage = f"{scratch_dir}.stage.{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    try:
        build(stage)
    except BaseException:
        # a failed build must not leak a partial stage dir: the next
        # run is a new pid, so nothing would ever reclaim the orphan
        shutil.rmtree(stage, ignore_errors=True)
        raise
    for attempt in (1, 2):
        try:
            os.rename(stage, scratch_dir)
            return
        except OSError:
            if intact(scratch_dir):
                # a concurrent winner renamed an identical copy in:
                # keep theirs, drop ours
                shutil.rmtree(stage, ignore_errors=True)
                return
            # a corrupt survivor blocks the rename: replace it with
            # the freshly staged copy instead of failing forever
            shutil.rmtree(scratch_dir, ignore_errors=True)
            if attempt == 2:
                shutil.rmtree(stage, ignore_errors=True)
                raise
