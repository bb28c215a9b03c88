"""Entity linking — stateful actor-pool ``map_batches`` stage.

The analog of the reference's consumer thread pool with per-thread captured
state (C3, /root/reference/src/graph_loader.rs:387-399: ``parallelism``
threads each owning a channel + a clone of the callback state). Here the
state is heavier — an alias dictionary + a TF-IDF char-trigram index — so
it is built ONCE per actor in ``__init__`` and shared across batches:

    ds.map_batches(EntityLinker, fn_constructor_kwargs={"alias_ref": ref},
                   batch_format="pyarrow", batch_size=B, concurrency=(n, m))

The alias inventory is broadcast with ``ray.put`` on the driver and fetched
once per actor (never re-shipped per batch). Surfaces that miss the exact
dict fall back to trigram-cosine against the alias matrix; below-threshold
surfaces mint a deterministic key from the normalized surface itself, so
linking needs no cross-actor coordination and N- vs 4N-CPU runs produce
identical output.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]")

TRIGRAM_DIM = 4096  # hashing-trick feature space


def normalize_surfaces(s: pd.Series) -> pd.Series:
    """Lowercase, strip punctuation, collapse whitespace — the shared
    normalization between alias inventory and mention surfaces."""
    return (
        s.str.lower()
        .str.replace(_PUNCT, " ", regex=True)
        .str.replace(_WS, " ", regex=True)
        .str.strip()
    )


def minted_key(norm_surface: str) -> str:
    """Deterministic key for an out-of-inventory surface."""
    h = hashlib.sha1(norm_surface.encode()).hexdigest()[:12]
    return f"ent_{h}"


def _trigram_rows(strings: list[str], idf: np.ndarray | None = None) -> np.ndarray:
    """L2-normalized hashed char-trigram (TF or TF-IDF) matrix."""
    mat = np.zeros((len(strings), TRIGRAM_DIM), dtype="float32")
    for i, s in enumerate(strings):
        padded = f"  {s} "
        for j in range(len(padded) - 2):
            mat[i, zlib.crc32(padded[j : j + 3].encode()) % TRIGRAM_DIM] += 1.0
    if idf is not None:
        mat *= idf
    # np.linalg.norm on big float32 matrices is pathologically slow in this
    # numpy build; einsum row dot-products are ~100x faster
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))[:, None]
    norms[norms == 0] = 1.0
    mat /= norms
    return mat


class AliasIndex:
    """The linker's broadcast state: normalized alias dict + TF-IDF
    char-trigram matrix over the alias inventory.

    Build ONCE on the driver (:meth:`build`), ship with ``ray.put``; each
    linker actor fetches it zero-copy (the numpy matrix stays in the
    local object store). At inventories beyond one node's memory, shard
    the dict/matrix by first hash byte and give each actor one shard
    (SURVEY.md §2.7) — not needed at current scales.
    """

    __slots__ = ("alias_map", "alias_keys", "idf", "index")

    def __init__(self, alias_map, alias_keys, idf, index):
        self.alias_map = alias_map
        self.alias_keys = alias_keys
        self.idf = idf
        self.index = index

    @classmethod
    def build(cls, aliases: dict[str, str]) -> "AliasIndex":
        """Normalize the dict; the trigram matrix itself is built LAZILY
        (:meth:`ensure_matrix`) on the first fuzzy miss — the exact-hit
        fast path never pays for it, and the broadcast ships only the
        dict (MBs), not the dense matrix (GBs at large inventories)."""
        if aliases:
            norm = normalize_surfaces(pd.Series(list(aliases.keys()), dtype=object))
            norm_alias = dict(zip(norm, aliases.values()))
        else:
            norm_alias = {}
        alias_keys = np.array(list(norm_alias.values()), dtype=object)
        return cls(norm_alias, alias_keys, None, None)

    def ensure_matrix(self) -> None:
        if self.index is not None:
            return
        alias_list = list(self.alias_map)
        if not alias_list:
            self.idf = None
            self.index = np.zeros((0, TRIGRAM_DIM), dtype="float32")
            return
        df = np.zeros(TRIGRAM_DIM, dtype="float32")
        for a in alias_list:
            padded = f"  {a} "
            seen = {zlib.crc32(padded[j : j + 3].encode()) % TRIGRAM_DIM
                    for j in range(len(padded) - 2)}
            for h in seen:
                df[h] += 1.0
        self.idf = np.log((1.0 + len(alias_list)) / (1.0 + df)) + 1.0
        self.index = _trigram_rows(alias_list, self.idf)


class EntityLinker:
    """Callable class for ``map_batches`` (actor pool).

    Parameters
    ----------
    index_ref:
        ``{"ref": ray.ObjectRef}`` of a prebuilt :class:`AliasIndex`
        (broadcast once from the driver; wrapped in a dict so Ray does
        not resolve it eagerly as a constructor argument), or
    aliases:
        raw alias dict — the index is then built here (tests/local use).
    min_score:
        trigram-cosine acceptance threshold for fuzzy matches.
    """

    def __init__(self, index_ref=None, aliases: dict[str, str] | None = None,
                 min_score: float = 0.35):
        if index_ref is not None:
            import ray

            idx: AliasIndex = ray.get(index_ref["ref"])
        else:
            idx = AliasIndex.build(aliases or {})
        self.min_score = float(min_score)
        self._idx = idx
        self.alias_map = idx.alias_map
        self._miss_cache: dict[str, str] = {}

    # -- core -------------------------------------------------------------
    def link_surfaces(self, surfaces: pd.Series) -> tuple[np.ndarray, pd.Series]:
        """Vectorized surface -> (entity keys, normalized surfaces)."""
        norm = normalize_surfaces(surfaces)
        keys = norm.map(self.alias_map)
        miss = keys.isna()
        if miss.any():
            uniq = pd.unique(norm[miss])
            resolved = {}
            todo = [u for u in uniq if u not in self._miss_cache]
            if todo:
                # first fuzzy miss pays for the trigram matrix; the
                # exact-hit fast path never builds it
                self._idx.ensure_matrix()
            if todo and len(self._idx.index):
                q = _trigram_rows(list(todo), self._idx.idf)
                sims = q @ self._idx.index.T      # (n_miss, n_alias)
                best = sims.argmax(axis=1)
                scores = sims[np.arange(len(todo)), best]
                for s, b, sc in zip(todo, best, scores):
                    self._miss_cache[s] = (
                        str(self._idx.alias_keys[b]) if sc >= self.min_score
                        else minted_key(s)
                    )
            elif todo:
                for s in todo:
                    self._miss_cache[s] = minted_key(s)
            resolved = {u: self._miss_cache[u] for u in uniq}
            keys = keys.where(~miss, norm.map(resolved))
        return keys.to_numpy(dtype=object), norm

    # -- map_batches entry ------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        """RAW_TRIPLE batch -> LINKED_TRIPLE batch.

        Output surfaces are NORMALIZED (the linker computes the
        normalization anyway); downstream canonicalization and vertex
        naming consume them directly without re-normalizing.
        """
        subj_surface = batch.column("subj_surface").to_pandas()
        obj_surface = batch.column("obj_surface").to_pandas()
        subj, subj_norm = self.link_surfaces(subj_surface)
        obj, obj_norm = self.link_surfaces(obj_surface)
        cols = {
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
            "subj": pa.array(subj, pa.string()),
            "pred": batch.column("pred"),
            "obj": pa.array(obj, pa.string()),
            "subj_surface": pa.array(subj_norm, pa.string()),
            "obj_surface": pa.array(obj_norm, pa.string()),
            "conf": batch.column("conf"),
        }
        # passthrough columns (e.g. checkpoint part_id) survive linking
        for name in batch.schema.names:
            if name not in cols and name not in ("subj", "obj"):
                cols[name] = batch.column(name)
        return pa.table(cols)


# Worker-process-level linker cache for the TASK-based linking stage: a
# plain map_batches function scales with block count (no actor-pool sizing
# or ramp-up), and because Ray reuses worker processes, each process pays
# for ray.get(index) + EntityLinker construction exactly once.
_PROCESS_LINKERS: dict = {}


def make_linker_fn(index_ref: dict, min_score: float = 0.35):
    """Stateless-task variant of the linking stage.

    ``index_ref = {"ref": ray.put(AliasIndex.build(aliases))}``. The
    returned function is a normal ``map_batches`` fn; the heavy state is
    fetched zero-copy from the local object store and cached per worker
    process. Prefer this over the actor-pool form when the state is a
    read-only broadcast (the pool buys nothing and its sizing fights the
    read/write stages for CPUs); use the ``EntityLinker`` class directly
    as an actor pool when per-actor mutable state or GPU slots matter.
    """

    def link_batch(batch):
        key = (index_ref["ref"].hex(), min_score)
        lk = _PROCESS_LINKERS.get(key)
        if lk is None:
            lk = EntityLinker(index_ref=index_ref, min_score=min_score)
            _PROCESS_LINKERS[key] = lk
        return lk(batch)

    return link_batch
