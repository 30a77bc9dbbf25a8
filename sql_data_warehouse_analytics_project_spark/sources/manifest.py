"""Generation-manifest commit protocol for path datasets — the atomic
publish that replaces every "move directories while nobody reads"
maintenance window (reference anchor: the transactional UPSERT/MERGE the
reference gets for free from PostgreSQL, ``sql/dml.py:96-337``; on a
filesystem/object-store warehouse the equivalent is a manifest pointer,
the core idea of Delta/Iceberg table formats, rebuilt here dependency-
free).

Layout of a MANAGED dataset rooted at ``root``::

    root/_MANIFEST.json            <- the ONE mutable file (atomic replace)
    root/_generations/g000001/     <- immutable-once-published data dirs
    root/_generations/g000002/

Both names start with ``_`` so Hadoop/Spark path filters ignore them: a
legacy ``spark.read.parquet(root)`` of a freshly migrated dataset still
sees the (stale but complete) pre-migration files at the root instead of
a mixed tree.

Protocol invariants:

- **Writers never mutate published data.** A rewrite (compaction, index
  update, overwrite) lands completely under a NEW generation directory,
  then :func:`publish` atomically replaces ``_MANIFEST.json``
  (``os.replace`` — readers of the pointer see the old or the new
  manifest, never a torn one).
- **Publish deletes nothing.** A reader that resolved the manifest
  before a publish keeps reading its complete, untouched generation.
  Space is reclaimed by the explicit :func:`vacuum` maintenance call,
  whose only contract is a grace period: readers must not hold a
  resolved generation across a vacuum (the same contract as Delta's
  ``VACUUM``). This is the ONLY remaining caveat — concurrent
  readers during publish are always safe.
- **Crash safety for free.** A crash mid-write leaves a garbage
  generation directory and the old manifest fully live; re-run the
  operation (it writes a fresh generation) and vacuum eventually
  removes the orphan. No restore/refold step exists because no partial
  state is ever reachable through the pointer.

A manifest may reference SEVERAL generations at once (``referenced``):
the doc-bucketed BM25 index points each bucket partition at the
generation that last rewrote it, so an incremental update writes only
the affected buckets yet still publishes atomically
(``llm/retrieval.py``).
"""

from __future__ import annotations

import json
import os
import shutil

MANIFEST_NAME = "_MANIFEST.json"
GENERATIONS_DIR = "_generations"


def manifest_path(root: str) -> str:
    return os.path.join(root.rstrip("/"), MANIFEST_NAME)


def generation_dir(root: str, gid: str) -> str:
    return os.path.join(root.rstrip("/"), GENERATIONS_DIR, gid)


def read_manifest(root: str) -> "dict | None":
    """The current manifest, or None for an unmanaged path."""
    try:
        with open(manifest_path(root)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def is_managed(root: str) -> bool:
    return os.path.isfile(manifest_path(root))


def resolve(root: str) -> str:
    """The directory readers should scan: the current generation of a
    managed dataset, the path itself otherwise. Reading THROUGH this
    function is what makes publishes invisible to readers — resolve
    once per logical read, then the snapshot is pinned."""
    m = read_manifest(root)
    if m is None:
        return root.rstrip("/")
    return generation_dir(root, m["current"])


def new_generation(root: str) -> "tuple[str, str]":
    """Allocate the next generation id and (created) directory. The id
    is seq-monotonic per dataset; nothing becomes visible until
    :func:`publish`."""
    m = read_manifest(root)
    seq = (int(m.get("seq", 0)) if m else 0) + 1
    gid = f"g{seq:06d}"
    gdir = generation_dir(root, gid)
    # a crashed earlier attempt may have left a partial dir at this seq
    shutil.rmtree(gdir, ignore_errors=True)
    os.makedirs(gdir)
    return gid, gdir


def publish(
    root: str,
    gid: str,
    *,
    extra: "dict | None" = None,
    referenced: "list[str] | None" = None,
) -> dict:
    """Atomically point the dataset at generation ``gid``.

    ``extra`` carries dataset-specific metadata (the BM25 scalars and
    bucket map live here). ``referenced`` lists EVERY generation the new
    manifest still reads from (defaults to ``[gid]``) — :func:`vacuum`
    keeps exactly these. Returns the manifest written."""
    seq = int(gid.lstrip("g"))
    m = {
        "current": gid,
        "seq": seq,
        "referenced": sorted(set(referenced or [gid])),
        "extra": extra or {},
    }
    tmp = manifest_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.replace(tmp, manifest_path(root))
    return m


def vacuum(root: str, *, prune_root: bool = True) -> "list[str]":
    """Reclaim space: delete generation directories the current manifest
    does not reference and (``prune_root``) stale pre-migration data
    files left at the root by :func:`migrate`-style adoptions. Returns
    the paths removed.

    MAINTENANCE CALL with a grace-period contract: a reader that
    resolved a generation before the latest publish and is still
    scanning it would lose its files — run vacuum only after in-flight
    readers have drained (publish itself never needs this; it deletes
    nothing)."""
    m = read_manifest(root)
    if m is None:
        return []
    root = root.rstrip("/")
    keep = set(m.get("referenced") or [m["current"]])
    removed: list[str] = []
    gen_root = os.path.join(root, GENERATIONS_DIR)
    for name in sorted(os.listdir(gen_root)) if os.path.isdir(gen_root) else []:
        if name not in keep:
            p = os.path.join(gen_root, name)
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
    if prune_root:
        for name in sorted(os.listdir(root)):
            if name in (MANIFEST_NAME, GENERATIONS_DIR):
                continue
            p = os.path.join(root, name)
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
            removed.append(p)
    return removed
