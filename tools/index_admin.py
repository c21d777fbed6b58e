"""ANN index store administration — the build job as a command.

The reference ships its BLAST index build as an operational task
(public ``bpaotu/otu/blast.py`` builds, the views only query); this is
that surface for the Spark engine:

    python tools/index_admin.py build [sf_dir]   # build + persist all
    python tools/index_admin.py list             # what the store holds
    python tools/index_admin.py prune --keep N   # evict oldest entries

``build`` prints the artifact manifest (name -> rows) as one JSON
line; a second ``build`` is read-only (idempotence is pytest-proven in
tests/test_round11.py). The store root honours
``$BPAOTU_ANN_INDEX_DIR``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _local_root() -> str:
    """list/prune are local-FS conveniences; accept a file:// root
    (the store itself goes through the Hadoop FileSystem API, so a
    non-file scheme needs a Spark-side prune — use _MAX_ENTRIES)."""
    from bpaotu_spark.ann.index_store import index_root

    root = index_root()
    if root.startswith("file://"):
        root = root[len("file://"):]
    return root


def _list() -> int:
    root = _local_root()
    if not os.path.isdir(root):
        print(json.dumps({"root": root, "entries": []}))
        return 0
    entries = []
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name)
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p)
            for f in fs
        )
        entries.append(
            {
                "entry": name,
                "bytes": size,
                "complete": os.path.exists(os.path.join(p, "_SUCCESS")),
                "mtime": int(os.path.getmtime(p)),
            }
        )
    print(json.dumps({"root": root, "entries": entries}, indent=1))
    return 0


def _prune(keep: int) -> int:
    root = _local_root()
    if not os.path.isdir(root):
        return 0
    entries = sorted(
        (os.path.join(root, d) for d in os.listdir(root)),
        key=os.path.getmtime,
    )
    removed = []
    for p in entries[: max(0, len(entries) - keep)]:
        shutil.rmtree(p, ignore_errors=True)
        removed.append(os.path.basename(p))
    print(json.dumps({"removed": removed, "kept": keep}))
    return 0


def _build(sf_dir: str) -> int:
    from bpaotu_spark.ann.index_store import build_ann_index, index_root
    from bpaotu_spark.session import get_session

    spark = get_session("index-admin")
    t0 = time.time()
    manifest = build_ann_index(spark, sf_dir)
    print(
        json.dumps(
            {
                "root": index_root(),
                "sf_dir": sf_dir,
                "build_sec": round(time.time() - t0, 3),
                "manifest": manifest,
            }
        )
    )
    return 0


def main(argv: list[str]) -> int:
    if not argv or argv[0] not in ("build", "list", "prune"):
        print(__doc__)
        return 2
    if argv[0] == "list":
        return _list()
    if argv[0] == "prune":
        keep = 16
        if "--keep" in argv:
            keep = int(argv[argv.index("--keep") + 1])
        return _prune(keep)
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    return _build(sf_dir)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
