"""Content-keyed disk cache for large derived tables.

The colfac factor build is a pure function of the PSD and the pruned
IFT matrix, but costs ~24 s of host BLAS at 1024² (or a ~30 s
accelerator round-trip) on *every process start* — bench runs, the
validation dossier, probe scripts and production restarts all re-pay
it for byte-identical inputs. Stacks above :data:`MIN_BYTES` are
cached on disk keyed by a SHA-256 of the *input tables* (not config
params — content addressing cannot go stale), alongside JAX's own
compilation cache.

Layout: ``$FAST_TPU_CACHE_DIR`` (default
``~/.cache/jax_fast_tpu/tables``) / ``<name>-<hexdigest>.npy``.
Writes are atomic (tmp + rename) so concurrent processes can share the
directory; reads touch the file's mtime so eviction (directory capped
at :data:`MAX_BYTES`) is LRU. ``FAST_TPU_TABLE_CACHE=0`` disables the
cache entirely.
"""

import hashlib
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

MIN_BYTES = 64 << 20   # smaller stacks rebuild faster than they load
MAX_BYTES = 24 << 30   # directory cap; least-recently-used evicted


def enabled():
    return os.environ.get("FAST_TPU_TABLE_CACHE", "1") != "0"


def cache_dir():
    return os.environ.get(
        "FAST_TPU_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_fast_tpu/tables"))


def table_key(name, arrays, scalars=()):
    """SHA-256 over the content of ``arrays`` + a scalar tuple.

    Hashing the actual input tables (dtype, shape, bytes) rather than
    the config that produced them makes the key immune to any
    config -> table derivation changing underneath the cache.
    """
    h = hashlib.sha256()
    h.update(name.encode())
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    h.update(repr(tuple(scalars)).encode())
    return f"{name}-{h.hexdigest()}"


def load(key):
    """The cached array for ``key``, or None (miss, disabled, corrupt)."""
    if not enabled():
        return None
    path = os.path.join(cache_dir(), key + ".npy")
    try:
        arr = np.load(path)
    except FileNotFoundError:
        return None
    except Exception as e:  # corrupt/truncated file: drop and rebuild
        logger.warning("table cache: unreadable %s (%s); rebuilding",
                       path, e)
        try:
            os.remove(path)
        except OSError:
            pass
        return None
    try:
        os.utime(path)  # LRU touch
    except OSError:
        pass
    logger.info("table cache hit: %s (%.0f MB)", key, arr.nbytes / 1e6)
    return arr


def save(key, arr):
    """Store ``arr`` under ``key`` (no-op below MIN_BYTES / disabled)."""
    arr = np.asarray(arr)
    if not enabled() or arr.nbytes < MIN_BYTES:
        return
    d = cache_dir()
    path = os.path.join(d, key + ".npy")
    tmp = f"{path}.tmp{os.getpid()}"
    try:
        os.makedirs(d, exist_ok=True)
        with open(tmp, "wb") as f:  # np.save(path) would append '.npy'
            np.save(f, arr)
        os.replace(tmp, path)
    except OSError as e:  # full/readonly disk must never fail the build
        logger.warning("table cache: could not store %s (%s)", key, e)
        try:
            os.remove(tmp)
        except OSError:
            pass
        return
    _evict(d)


def _evict(d):
    try:
        entries = []
        with os.scandir(d) as it:
            for e in it:
                if e.is_file() and e.name.endswith(".npy"):
                    st = e.stat()
                    entries.append((st.st_mtime, st.st_size, e.path))
        total = sum(s for _, s, _ in entries)
        for _, size, path in sorted(entries):
            if total <= MAX_BYTES:
                break
            os.remove(path)
            total -= size
            logger.info("table cache: evicted %s (%.0f MB)",
                        os.path.basename(path), size / 1e6)
    except OSError as e:
        logger.warning("table cache: eviction scan failed (%s)", e)
