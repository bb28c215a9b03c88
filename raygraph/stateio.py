"""Shared-storage path layer for persisted engine state.

Every durable artifact the engine keeps between runs — checkpoint
manifests, dedup index epochs, deletion-vector sidecars, zone maps,
curation manifests, persisted ANN indexes — routes its filesystem
access through this module instead of ``os`` / ``glob`` / ``open``.
Paths are plain strings: a bare path ("/data/index") uses the local
filesystem via the exact ``os.*`` fast paths the engine always used;
a URL ("file:///data/index", "s3://bucket/index", "memory://x")
resolves through ``fsspec``, so the same index/manifest code runs
against shared object storage on a real multi-node cluster. (The
reference's only durable state is server-side dump contexts,
/root/reference/src/sharding.rs:86-137 — this engine made state
durable; this layer makes it SHARED.)

Commit protocol
---------------
Local filesystems commit with atomic ``os.rename`` (the engine's
original discipline). Object stores have NO atomic rename — a
"rename" is copy+delete, and a crash mid-copy would leave a
half-visible directory. There the protocol switches to MARKER COMMIT:

1. writers stage into ``_tmp-…`` exactly as before;
2. ``commit_dir`` copies the staged tree to its final name, then
   writes a zero-byte ``_COMMITTED`` marker INSIDE it as the LAST
   object (single-object PUT is atomic on every real store);
3. readers (``committed_dirs`` / ``is_committed``) treat a directory
   as existing only once the marker exists — a crash anywhere before
   the marker leaves an invisible, vacuumable partial.

Both modes ALSO write the marker on fresh commits (uniform layout);
local readers accept marker-less directories for pre-layer state
(rename already guaranteed their atomicity). Single JSON files
(manifests, sidecars, ``_meta.json``) use write-tmp-then-``os.replace``
locally and a direct single-object write remotely — object PUT
atomicity replaces rename atomicity.

The mode is chosen per-path from the filesystem protocol; tests force
``marker`` mode on local paths via :func:`set_commit_mode` to pin the
crash-window semantics without needing a real object store.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import posixpath
import shutil

COMMIT_MARKER = "_COMMITTED"


def _stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable without aiohttp.

    Ray's path/write machinery probes ``from
    fsspec.implementations.http import HTTPFileSystem`` and catches
    only ModuleNotFoundError; two CONCURRENT probes racing the
    (always-failing, aiohttp-less) import can see a half-initialized
    module and raise plain ImportError instead (bites the curation
    ``jobs`` thread pool). Installed once at import of the storage
    layer, on the importing thread; the sentinel class is never
    instantiated (no HTTP filesystems here)."""
    import sys
    import types

    try:
        import fsspec  # noqa: F401
    except ImportError:
        # fsspec itself absent: leave sys.modules alone so other
        # consumers get a real ModuleNotFoundError, not a fake module
        return
    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # pragma: no cover - sentinel only
        def __init__(self, *a, **k):
            raise ImportError(
                "fsspec HTTP filesystem unavailable: aiohttp is not "
                "installed (stateio installed an import sentinel)")

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


_stub_fsspec_http()

# protocols whose rename is atomic (commit = rename); everything else
# gets the marker protocol. Overridable for tests via set_commit_mode.
_ATOMIC_RENAME_PROTOCOLS = {"file", "local"}
_FORCED_MODE: str | None = None


def set_commit_mode(mode: str | None) -> None:
    """Force ``"rename"`` / ``"marker"`` commits regardless of
    protocol (``None`` restores per-protocol selection). Test hook —
    lets the marker crash-window semantics run against local paths."""
    global _FORCED_MODE
    if mode not in (None, "rename", "marker"):
        raise ValueError("mode must be None|rename|marker")
    _FORCED_MODE = mode


def is_url(path: str) -> bool:
    return "://" in path


def _fs(path: str):
    """(fsspec filesystem, protocol-stripped path) for a URL path."""
    import fsspec

    fs, root = fsspec.core.url_to_fs(path)
    return fs, root


def _protocol(path: str) -> str:
    return path.split("://", 1)[0] if is_url(path) else "file"


def commit_mode(path: str) -> str:
    if _FORCED_MODE is not None:
        return _FORCED_MODE
    return ("rename" if _protocol(path) in _ATOMIC_RENAME_PROTOCOLS
            else "marker")


def _reattach(path: str, inner: str) -> str:
    """Re-prefix a protocol-stripped path returned by fsspec (e.g. by
    ``glob``) so it stays a valid stateio path."""
    if not is_url(path):
        return inner
    proto = path.split("://", 1)[0]
    return f"{proto}://{inner.lstrip('/') if proto == 'memory' else inner}"


def join(base: str, *parts: str) -> str:
    if is_url(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


def relpath(path: str, start: str) -> str:
    """Path of ``path`` relative to ``start`` (protocol-stripped for
    URLs — relative paths have no protocol)."""
    if is_url(path) or is_url(start):
        return posixpath.relpath(
            _fs(path)[1] if is_url(path) else path,
            _fs(start)[1] if is_url(start) else start)
    return os.path.relpath(path, start)


def basename(path: str) -> str:
    return posixpath.basename(path.rstrip("/")) if is_url(path) \
        else os.path.basename(path)


def exists(path: str) -> bool:
    if not is_url(path):
        return os.path.exists(path)
    fs, root = _fs(path)
    return fs.exists(root)


def isdir(path: str) -> bool:
    if not is_url(path):
        return os.path.isdir(path)
    fs, root = _fs(path)
    return fs.isdir(root)


def makedirs(path: str) -> None:
    if not is_url(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, root = _fs(path)
    fs.makedirs(root, exist_ok=True)


def listdir(path: str) -> list[str]:
    """Sorted basenames (files + dirs); [] for a missing directory."""
    if not is_url(path):
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []
    fs, root = _fs(path)
    if not fs.isdir(root):
        return []
    return sorted(posixpath.basename(p.rstrip("/"))
                  for p in fs.ls(root, detail=False))


def rmtree(path: str) -> None:
    """Recursive delete, ignore-missing (shutil.rmtree ignore_errors
    analog)."""
    if not is_url(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    fs, root = _fs(path)
    try:
        fs.rm(root, recursive=True)
    except FileNotFoundError:
        pass


def remove(path: str) -> None:
    """Delete one file, ignore-missing."""
    if not is_url(path):
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
        return
    fs, root = _fs(path)
    try:
        fs.rm_file(root)
    except FileNotFoundError:
        pass


def glob(pattern: str) -> list[str]:
    """Sorted full paths (protocol re-attached for URL patterns);
    ``**`` recurses in both routes."""
    if not is_url(pattern):
        return sorted(_glob.glob(pattern, recursive=True))
    fs, root = _fs(pattern)
    return sorted(_reattach(pattern, p) for p in fs.glob(root))


def open_file(path: str, mode: str = "r"):
    if not is_url(path):
        return open(path, mode)
    fs, root = _fs(path)
    return fs.open(root, mode)


def read_json(path: str):
    with open_file(path) as fh:
        return json.load(fh)


def write_json_atomic(path: str, obj, **dump_kwargs) -> None:
    """All-or-nothing single-file JSON write: tmp + ``os.replace``
    locally; one direct object write remotely (single-object PUT is
    atomic — the object appears whole or not at all)."""
    if not is_url(path):
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(obj, fh, **dump_kwargs)
        os.replace(tmp, path)
        return
    fs, root = _fs(path)
    with fs.open(root, "w") as fh:
        json.dump(obj, fh, **dump_kwargs)


def write_text_atomic(path: str, text: str) -> None:
    if not is_url(path):
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    fs, root = _fs(path)
    with fs.open(root, "w") as fh:
        fh.write(text)


def rename(src: str, dst: str) -> None:
    """Same-store rename/move (NOT a commit primitive on object
    stores — use :func:`commit_dir` / :func:`write_json_atomic`)."""
    if not is_url(src):
        os.rename(src, dst)
        return
    fs, sroot = _fs(src)
    _, droot = _fs(dst)
    fs.mv(sroot, droot, recursive=True)


def commit_dir(tmp: str, final: str) -> None:
    """Commit a staged directory tree under its final name.

    rename mode: atomic ``os.rename`` (fails loudly if ``final``
    exists — the single-writer contract), then the marker is added
    inside (uniform layout). marker mode: copy the tree to ``final``,
    write the ``_COMMITTED`` marker LAST, then delete the staging dir
    — every crash window leaves either no ``final`` marker (invisible
    to readers) or a fully-committed dir plus vacuumable leftovers.
    """
    mode = commit_mode(final)
    if mode == "rename" and not is_url(final):
        os.rename(tmp, final)
        _write_marker(final)
        return
    if mode == "rename":
        fs, troot = _fs(tmp)
        _, froot = _fs(final)
        if _protocol(final) in _ATOMIC_RENAME_PROTOCOLS:
            # fsspec's mv → shutil.move would silently nest tmp INSIDE
            # an existing final; os.rename on the stripped path keeps
            # the loser's-commit-fails-loudly single-writer contract
            os.rename(troot, froot)
        else:
            if fs.exists(froot):
                raise FileExistsError(
                    f"commit target already exists: {final} "
                    "(concurrent writer? the index contract is "
                    "single-writer)")
            fs.mv(troot, froot, recursive=True)
        _write_marker(final)
        return
    # marker mode: the single-writer loudness rename gives for free —
    # a committed target means a concurrent writer won the epoch race;
    # refuse instead of silently merging trees (fs copy would)
    if is_committed(final):
        raise FileExistsError(
            f"commit target already committed: {final} "
            "(concurrent writer? the index contract is single-writer)")
    # an UNMARKED partial at final is a crashed earlier attempt; clear
    # it so the retry's copy can't merge in (and permanently commit)
    # that attempt's stale files — every commit starts from empty
    rmtree(final)
    # copy (visible but unmarked), mark, then clean
    _copy_tree(tmp, final)
    _write_marker(final)
    rmtree(tmp)


def _write_marker(dirpath: str) -> None:
    write_text_atomic(join(dirpath, COMMIT_MARKER), "")


def _copy_tree(src: str, dst: str) -> None:
    """Copy a staged tree (marker-mode commit body).

    Committed trees are expected to be METADATA-SIZED (index epochs,
    manifests, sidecars — KB-MB); bulk data flows through
    :func:`ray_write_parquet` directly, never through a staged commit.
    The remote route still copies files concurrently (a small thread
    pool over per-file get/put) so a tree of many small objects is
    bounded by object-store round-trips / pool-width, not their sum."""
    if not is_url(src) and not is_url(dst):
        shutil.copytree(src, dst, dirs_exist_ok=True)
        return
    from concurrent.futures import ThreadPoolExecutor

    sfs, sroot = _fs(src)
    dfs, droot = _fs(dst)
    files = sfs.find(sroot)

    def one(p: str) -> None:
        rel = posixpath.relpath(p, sroot)
        target = posixpath.join(droot, rel)
        dfs.makedirs(posixpath.dirname(target), exist_ok=True)
        with sfs.open(p, "rb") as r, dfs.open(target, "wb") as w:
            w.write(r.read())

    if len(files) <= 1:
        for p in files:
            one(p)
        return
    with ThreadPoolExecutor(max_workers=min(8, len(files))) as pool:
        # list() so the first failure propagates (a half-copied tree
        # stays unmarked and invisible — the crash-window contract)
        list(pool.map(one, files))


def is_committed(dirpath: str) -> bool:
    """A directory counts as committed when its marker exists — or,
    on local filesystems, when it merely exists (pre-layer state was
    committed by atomic rename and carries no marker)."""
    if exists(join(dirpath, COMMIT_MARKER)):
        return True
    return commit_mode(dirpath) == "rename" and isdir(dirpath)


def committed_dirs(parent: str, prefix: str) -> list[str]:
    """Sorted names of committed subdirectories matching ``prefix``
    (staging ``_tmp-…`` dirs and unmarked partials are invisible)."""
    return [d for d in listdir(parent)
            if d.startswith(prefix) and is_committed(join(parent, d))]


def data_files(dirpath: str, suffix: str = ".parquet") -> list[str]:
    """Sorted full paths of the payload files in a (committed)
    directory — markers and underscore-prefixed bookkeeping files are
    never payload."""
    return [join(dirpath, f) for f in listdir(dirpath)
            if f.endswith(suffix) and not f.startswith("_")]


# ------------------------------------------------------------- ray/pyarrow
# pyarrow resolves s3://, gcs://, hdfs:// URIs natively; file:// is
# normalized to a plain local path (Ray rejects file:// URIs inside
# path LISTS); anything else (memory://, custom test protocols) gets
# the fsspec handler wrapped for Ray Data / pyarrow.parquet calls.
_PA_NATIVE = {"s3", "s3a", "gs", "gcs", "hdfs"}


def _pa_fs_and_path(path: str):
    """(pyarrow filesystem or None, path for pyarrow). None filesystem
    means pyarrow can resolve the path/URI itself."""
    if not is_url(path) or _protocol(path) in _PA_NATIVE:
        return None, path
    if _protocol(path) in _ATOMIC_RENAME_PROTOCOLS:
        return None, _fs(path)[1]   # file:// → plain local path
    from pyarrow.fs import FSSpecHandler, PyFileSystem

    fs, root = _fs(path)
    return PyFileSystem(FSSpecHandler(fs)), root


def ray_read_parquet(paths, **kwargs):
    import ray.data as rd

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    pafs, norm = _pa_fs_and_path(first)
    if isinstance(paths, (list, tuple)):
        paths = [_pa_fs_and_path(p)[1] for p in paths]
    else:
        paths = norm
    if pafs is not None:
        kwargs.setdefault("filesystem", pafs)
    return rd.read_parquet(paths, **kwargs)


def ray_write_parquet(ds, path: str, **kwargs) -> None:
    pafs, root = _pa_fs_and_path(path)
    if pafs is not None:
        kwargs.setdefault("filesystem", pafs)
        ds.write_parquet(root, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


def pq_read_table(path: str, **kwargs):
    import pyarrow.parquet as pq

    pafs, root = _pa_fs_and_path(path)
    if pafs is not None:
        kwargs.setdefault("filesystem", pafs)
    return pq.read_table(root, **kwargs)


def pq_write_table(table, path: str, **kwargs) -> None:
    import pyarrow.parquet as pq

    pafs, root = _pa_fs_and_path(path)
    if pafs is not None:
        kwargs.setdefault("filesystem", pafs)
    pq.write_table(table, root, **kwargs)


def pq_read_metadata(path: str):
    import pyarrow.parquet as pq

    pafs, root = _pa_fs_and_path(path)
    if pafs is None:
        return pq.read_metadata(root)
    with pafs.open_input_file(root) as f:
        return pq.read_metadata(f)


def pq_read_schema(path: str):
    import pyarrow.parquet as pq

    pafs, root = _pa_fs_and_path(path)
    if pafs is None:
        return pq.read_schema(root)
    with pafs.open_input_file(root) as f:
        return pq.read_schema(f)
