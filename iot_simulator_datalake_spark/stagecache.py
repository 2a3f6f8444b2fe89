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
import os
import shutil
import tempfile
import uuid
from pathlib import Path
from typing import Callable

_ROOT = "lake_stage"


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


def _recipe_digest(build: Callable) -> str:
    """Fingerprint of the BUILDER itself (bytecode + constants), so
    editing a layout recipe — clustering granularity, bloom sizing, a
    new manifest step — auto-invalidates the cache instead of relying
    on a hand-bumped tag (the round-5 bloom fix needed exactly that
    manual bump; this makes the next one automatic)."""
    code = build.__code__
    h = hashlib.md5(code.co_code)
    h.update(repr(code.co_consts).encode())
    h.update(repr(code.co_names).encode())
    return h.hexdigest()[:8]


def scratch_dir(sf_dir: str, table: str, tag: str) -> Path:
    """Deterministic-per-(source, process) scratch directory for sinks
    that OVERWRITE on every invocation (runtime-filter demos, stream
    drains).  Reuse within a process stops the old per-call ``mkdtemp``
    leak (bench warm + 3 timed passes = one process); the pid suffix
    keeps concurrent sessions from overwriting each other's dir while
    one of them is mid-read."""
    d = (Path(tempfile.gettempdir()) / _ROOT
         / f"{tag}-{source_digest(sf_dir, table)}-pid{os.getpid()}")
    d.mkdir(parents=True, exist_ok=True)
    return d


def stage_once(sf_dir: str, table: str, tag: str,
               build: Callable[[Path], None]) -> Path:
    """Build a derived layout ONCE per (source, recipe, tag) and reuse
    it.

    ``build`` receives a fresh directory and must write the complete
    layout (parquet + manifests) into it.  Publication is atomic
    (build into a tmp sibling, rename into place); a lost rename race
    defers to the winner's identical layout.  The ``_STAGED`` marker
    gates readers — an underscore name, so Spark's parquet listing
    ignores it like ``_SUCCESS``.  A build that raises cleans up its
    tmp sibling (a killed PROCESS can still orphan one; orphans are
    never read — no marker — and carry .tmp- names for manual sweeps).
    """
    dest = (Path(tempfile.gettempdir()) / _ROOT
            / (f"{tag}-{source_digest(sf_dir, table)}"
               f"-r{_recipe_digest(build)}"))
    if (dest / "_STAGED").exists():
        return dest
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_name(f"{dest.name}.tmp-{uuid.uuid4().hex[:8]}")
    try:
        build(tmp)
        (tmp / "_STAGED").write_text("ok\n")
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        tmp.rename(dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not (dest / "_STAGED").exists():
            raise  # not a lost race — surface the real failure
    return dest
