"""Index snapshot / restore — the Elasticsearch snapshot-API analog
(and Lucene's backup-a-commit-point discipline) for the persisted
parquet index layout (build/checkpoint.py):

- ``snapshot_index``: fsck-gates the live index (never snapshot a
  corrupt index — the backup would faithfully preserve the corruption),
  copies every stage directory plus ``_meta.json`` / ``_build_state``
  into a temp dir, writes a ``SNAPSHOT.json`` manifest with a per-file
  (size, md5) inventory, then atomically renames the temp dir into
  place — a crashed snapshot leaves only a ``.tmp-*`` dir, never a
  half-readable snapshot.
- ``restore_index``: verifies the manifest inventory byte-for-byte
  (every file present, size + md5 match — a bit-rotted or truncated
  snapshot is refused, not restored), copies into a temp dir beside the
  target, swaps atomically (old index moved aside, temp renamed in,
  old removed only after the rename succeeds), and fsck-gates the
  result.

Driver-side file ops by design: the persisted index is a directory
tree the driver owns (same trust model as the checkpoint machinery).
At object-store scale the copy step becomes a parallel distcp /
server-side copy and the md5 inventory maps onto object etags — the
manifest format and the verify-before-trust protocol are the part
that carries over unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Dict, List

SNAPSHOT_MANIFEST = "SNAPSHOT.json"
_COPY_TOP_FILES = ("_meta.json",)


def _md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _inventory(root: str) -> List[dict]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            if rel == SNAPSHOT_MANIFEST:
                continue
            out.append(
                {"path": rel, "bytes": os.path.getsize(p), "md5": _md5_file(p)}
            )
    out.sort(key=lambda e: e["path"])
    return out


def snapshot_index(spark, index_dir: str, snap_dir: str,
                   skip_fsck: bool = False) -> dict:
    """Snapshot ``index_dir`` into ``snap_dir`` (must not exist).
    Returns the manifest dict. Raises on fsck failure or an existing
    target."""
    index_dir = os.path.abspath(index_dir)
    snap_dir = os.path.abspath(snap_dir)
    if os.path.exists(snap_dir):
        raise FileExistsError(f"snapshot target exists: {snap_dir}")
    if not skip_fsck:
        from .fsck import fsck_index

        report = fsck_index(spark, index_dir)
        if not report["ok"]:
            bad = [c["name"] for c in report["checks"] if not c["ok"]]
            raise RuntimeError(
                f"refusing to snapshot an index that fails fsck: {bad}"
            )
    tmp = f"{snap_dir}.tmp-{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    try:
        copied = []
        for entry in sorted(os.listdir(index_dir)):
            src = os.path.join(index_dir, entry)
            if os.path.isdir(src):
                shutil.copytree(src, os.path.join(tmp, entry))
                copied.append(entry)
            elif entry in _COPY_TOP_FILES:
                shutil.copy2(src, os.path.join(tmp, entry))
                copied.append(entry)
        manifest = {
            "format": 1,
            "source_index": index_dir,
            "entries": copied,
            "files": _inventory(tmp),
        }
        manifest["n_files"] = len(manifest["files"])
        manifest["total_bytes"] = sum(f["bytes"] for f in manifest["files"])
        with open(os.path.join(tmp, SNAPSHOT_MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp, snap_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return manifest


def verify_snapshot(snap_dir: str) -> Dict[str, object]:
    """Check the snapshot's file inventory against its manifest ->
    {"ok": bool, "problems": [...], "manifest": dict}."""
    snap_dir = os.path.abspath(snap_dir)
    mpath = os.path.join(snap_dir, SNAPSHOT_MANIFEST)
    if not os.path.isfile(mpath):
        return {"ok": False, "problems": ["missing SNAPSHOT.json"],
                "manifest": None}
    with open(mpath) as f:
        manifest = json.load(f)
    problems = []
    want = {e["path"]: e for e in manifest.get("files", [])}
    have = {e["path"]: e for e in _inventory(snap_dir)}
    for p in sorted(set(want) - set(have)):
        problems.append(f"missing file: {p}")
    for p in sorted(set(have) - set(want)):
        problems.append(f"unexpected file: {p}")
    for p in sorted(set(want) & set(have)):
        if want[p]["bytes"] != have[p]["bytes"]:
            problems.append(
                f"size mismatch: {p} ({have[p]['bytes']} != {want[p]['bytes']})"
            )
        elif want[p]["md5"] != have[p]["md5"]:
            problems.append(f"md5 mismatch: {p}")
    return {"ok": not problems, "problems": problems, "manifest": manifest}


def restore_index(spark, snap_dir: str, index_dir: str,
                  skip_fsck: bool = False) -> dict:
    """Restore a verified snapshot into ``index_dir`` (replacing any
    existing index atomically). Returns the verify report. Raises on a
    failed inventory check or a failed post-restore fsck."""
    snap_dir = os.path.abspath(snap_dir)
    index_dir = os.path.abspath(index_dir)
    report = verify_snapshot(snap_dir)
    if not report["ok"]:
        raise RuntimeError(
            f"refusing to restore a snapshot that fails verification: "
            f"{report['problems'][:5]}"
        )
    tmp = f"{index_dir}.restore-tmp-{os.getpid()}"
    old = f"{index_dir}.pre-restore-{os.getpid()}"
    for p in (tmp, old):
        if os.path.exists(p):
            shutil.rmtree(p)
    shutil.copytree(snap_dir, tmp)
    os.remove(os.path.join(tmp, SNAPSHOT_MANIFEST))
    had_old = os.path.exists(index_dir)
    try:
        if had_old:
            os.rename(index_dir, old)
        os.rename(tmp, index_dir)
    except BaseException:
        # roll back: put the old index back if we moved it aside
        if had_old and not os.path.exists(index_dir) and os.path.exists(old):
            os.rename(old, index_dir)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if not skip_fsck:
        from .fsck import fsck_index

        fck = fsck_index(spark, index_dir)
        if not fck["ok"]:
            # the snapshot inventory passed but the restored index does
            # not parse as a valid index — never leave it installed:
            # put the previous one back, or (fresh target) remove it
            shutil.rmtree(index_dir, ignore_errors=True)
            if had_old:
                os.rename(old, index_dir)
            bad = [c["name"] for c in fck["checks"] if not c["ok"]]
            raise RuntimeError(f"restored index fails fsck: {bad}")
    if had_old:
        shutil.rmtree(old, ignore_errors=True)
    return report
