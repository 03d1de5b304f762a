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
    """12-hex-char fingerprint of a source's identity + content edges
    (+ ``extra`` to separate artifacts derived differently from the
    same source). The source may be a single parquet FILE (testdata's
    shape) or a parquet DIRECTORY of part files (the derived .scale
    tables' shape): a directory fingerprints every part file's name,
    size, and ns-mtime plus the content edges of the first and last
    parts — a regenerated table (new mtimes) always re-fingerprints."""
    h = hashlib.md5(f"{src_path}:{extra}".encode())

    def _edges(path: str, size: int) -> None:
        with open(path, "rb") as f:
            h.update(f.read(_EDGE))
            if size > _EDGE:
                f.seek(-_EDGE, os.SEEK_END)
                h.update(f.read(_EDGE))

    if os.path.isdir(src_path):
        # recurse so hive-partitioned layouts (lang=en/part-*.parquet)
        # fingerprint their leaf FILES — a subdirectory entry must
        # never be opened (IsADirectoryError) nor statted in place of
        # its contents (stale-artifact hazard)
        entries: list[tuple[str, str, int, int]] = []
        for root, dirs, files in os.walk(src_path):
            dirs[:] = sorted(
                d for d in dirs if not d.startswith((".", "_"))
            )
            for n in sorted(files):
                if n.startswith((".", "_")):
                    continue
                p = os.path.join(root, n)
                pst = os.stat(p)
                rel = os.path.relpath(p, src_path)
                entries.append((rel, p, pst.st_size, pst.st_mtime_ns))
        for rel, _, size, mt in entries:
            h.update(f"{rel}:{size}:{mt}".encode())
        for _, p, size, _ in (
            (entries[0], entries[-1]) if entries else ()
        ):
            _edges(p, size)
    else:
        st = os.stat(src_path)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
        _edges(src_path, st.st_size)
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
