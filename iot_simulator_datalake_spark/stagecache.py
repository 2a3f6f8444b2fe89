"""Stage-once cache for derived physical layouts (partitioned copies,
skipping manifests, serving indexes): build once per source
fingerprint under the system temp dir, reuse across invocations.

Why it exists (ADVICE r4): per-call ``mkdtemp`` staging leaked disk
under bench warmup + timed passes + oracle sweeps AND let the staging
WRITE dominate the timed read path the queries are meant to measure.
Production semantics match: OPTIMIZE/ZORDER/ingest/index-build is a
one-time layout cost, the measured query is the scan that serves from
it.
"""

from __future__ import annotations

import hashlib
import shutil
import tempfile
import uuid
from pathlib import Path
from typing import Callable


def source_digest(sf_dir: str, table: str) -> str:
    """Fingerprint of one driver table's files (name+size+mtime) — the
    staging-cache key, so a regenerated testdata dir at the same path
    invalidates the cache instead of serving stale layouts."""
    root = Path(sf_dir) / f"{table}.parquet"
    h = hashlib.md5(str(Path(sf_dir).resolve()).encode())
    files = sorted(p for p in root.rglob("*") if p.is_file()) \
        if root.is_dir() else [root]
    for p in files:
        st = p.stat()
        h.update(f"|{p.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def stage_once(sf_dir: str, table: str, tag: str,
               build: Callable[[Path], None]) -> Path:
    """Build a derived layout ONCE per (source, tag) and reuse it.

    ``build`` receives a fresh directory and must write the complete
    layout (parquet + manifests) into it.  Publication is atomic
    (build into a tmp sibling, rename into place); a lost rename race
    defers to the winner's identical layout.  The ``_STAGED`` marker
    gates readers — an underscore name, so Spark's parquet listing
    ignores it like ``_SUCCESS``."""
    dest = (Path(tempfile.gettempdir()) / "lake_stage"
            / f"{tag}-{source_digest(sf_dir, table)}")
    if (dest / "_STAGED").exists():
        return dest
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_name(f"{dest.name}.tmp-{uuid.uuid4().hex[:8]}")
    build(tmp)
    (tmp / "_STAGED").write_text("ok\n")
    try:
        tmp.rename(dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return dest
