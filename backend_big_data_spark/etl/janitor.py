"""Spark scratch-dir janitor — the reference's ``clean.py`` (SURVEY.md §0:
"OS temp-dir janitor (deletes Spark blockmgr-* dirs), not dataflow") as a
safe library function: dry-run by default, bounded to known Spark scratch
patterns, never follows symlinks."""

from __future__ import annotations

import os
import shutil

#: Directory-name prefixes Spark leaves in the local scratch dir
#: (``clean.py:6-14`` deletes blockmgr-*; spark-* covers driver temp).
SCRATCH_PREFIXES = ("blockmgr-", "spark-")


def clean_spark_scratch(base_dir: str, dry_run: bool = True) -> list[str]:
    """Remove (or list, when ``dry_run``) Spark scratch directories under
    ``base_dir``. Returns the affected paths."""
    hits: list[str] = []
    for name in sorted(os.listdir(base_dir)):
        path = os.path.join(base_dir, name)
        if not os.path.isdir(path) or os.path.islink(path):
            continue
        if any(name.startswith(p) for p in SCRATCH_PREFIXES):
            hits.append(path)
            if not dry_run:
                shutil.rmtree(path, ignore_errors=True)
    return hits
