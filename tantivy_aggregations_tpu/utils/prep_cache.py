"""Cross-process persistence of one-time device-prep artifacts.

Cube operands (ops/cube.py block histograms, packed piece sites, member
operands) and OrderedLayout permutations are pure functions of the index
CONTENTS — expensive to rebuild (10M-row argsorts, bincounts, device
scatter builds: ~100s across the 10 bench configs) but perfectly
reusable across processes. This module stores their HOST forms as .npz
files inside the index directory itself (`<index>/.prep_cache/`), keyed
by (format version, index epoch, shard count, operand key): the index
path + epoch uniquely identify the contents (every commit / delete /
merge bumps the epoch), so staleness is structural, not heuristic.

RAM indexes have no path -> no persistence (their prep is small). Set
TAT_PREP_CACHE=0 to disable entirely. Writes are atomic (tmp + replace);
any read error is treated as a miss. [VERDICT r3 #7: a warm serving
restart must not pay the one-time builds again.]
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np

#: bump when the stored format of ANY cached artifact changes
PREP_VERSION = 1

_DISABLED = os.environ.get("TAT_PREP_CACHE", "") == "0"


def _dir_of(path) -> str | None:
    if _DISABLED or path is None:
        return None
    return os.path.join(path, ".prep_cache")


def _file_for(dirpath: str, epoch: int, n_shards: int, key) -> str:
    tag = repr((PREP_VERSION, int(epoch), int(n_shards), key))
    h = hashlib.sha1(tag.encode()).hexdigest()
    return os.path.join(dirpath, f"{h}.npz")


def load(path, epoch: int, n_shards: int, key):
    """dict of host arrays previously saved under `key`, or None."""
    d = _dir_of(path)
    if d is None:
        return None
    f = _file_for(d, epoch, n_shards, key)
    if not os.path.exists(f):
        return None
    try:
        with np.load(f) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None  # corrupt/partial file: rebuild


def save(path, epoch: int, n_shards: int, key, arrays: dict) -> None:
    """Atomically persist a dict of host numpy arrays under `key`."""
    d = _dir_of(path)
    if d is None:
        return
    try:
        os.makedirs(d, exist_ok=True)
        f = _file_for(d, epoch, n_shards, key)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as fh:
                np.savez(fh, **{k: np.asarray(v)
                                for k, v in arrays.items()})
            os.replace(tmp, f)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
    except OSError:
        pass  # read-only index dir etc.: persistence is best-effort
