"""Atomic stage commits + resume markers.

Resumable-output contract (north_rule): every pipeline stage writes to a temp
directory, then renames into place and drops a ``_SUCCESS`` marker — a killed
run leaves either nothing or a complete stage, and a re-run with
``resume=True`` skips completed stages byte-identically.  The validate pass
additionally records a per-partition manifest (lineage + metrics) in
``manifest.json``.
"""
from __future__ import annotations

import contextlib
import os
import shutil

SUCCESS = "_SUCCESS"


def stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, SUCCESS))


@contextlib.contextmanager
def commit_dir(path: str):
    """Yield a temp dir to write into; on clean exit, atomically move it to
    ``path`` and mark success.  On error the temp dir is removed."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    try:
        yield tmp
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    with open(os.path.join(path, SUCCESS), "w") as f:
        f.write("")
