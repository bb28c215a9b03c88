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
                 min_score: float = 0.35, shard_head: dict | None = None):
        self.min_score = float(min_score)
        self._miss_cache: dict[str, str] = {}
        self._head = shard_head
        if shard_head is not None:
            # sharded path: no whole-inventory state on this worker —
            # shards are fetched lazily per batch (SURVEY §7 M3)
            self._idx = None
            self.alias_map = None
            self._res_cache: dict[str, str] = {}
            return
        if index_ref is not None:
            import ray

            idx: AliasIndex = ray.get(index_ref["ref"])
        else:
            idx = AliasIndex.build(aliases or {})
        self._idx = idx
        self.alias_map = idx.alias_map

    # -- core -------------------------------------------------------------
    def _link_sharded(self, norm: pd.Series) -> np.ndarray:
        """Sharded resolution: exact lookups touch only the shards the
        batch's surfaces hash into; fuzzy misses scan the lazily-built
        per-shard matrices with the global-ordinal tie-break (see
        :class:`ShardedAliasIndex` for the exact-parity argument)."""
        head = self._head
        k = head["n_shards"]
        out_map: dict[str, str] = {}
        misses: list[str] = []
        by_shard: dict[int, list[str]] = {}
        for u in pd.unique(norm):
            hit = self._res_cache.get(u)
            if hit is not None:
                out_map[u] = hit
            else:
                by_shard.setdefault(
                    zlib.crc32(u.encode()) % k, []).append(u)
        for s, us in by_shard.items():
            amap = _shard_payload(head["shard_refs"][s])["map"]
            for u in us:
                key = amap.get(u)
                if key is not None:
                    out_map[u] = key
                    self._res_cache[u] = key
                else:
                    misses.append(u)
        if misses:
            idf = _head_idf(head)
            if idf is None:
                for u in misses:
                    out_map[u] = self._res_cache[u] = minted_key(u)
            else:
                q = _trigram_rows(misses, idf)
                best_sc = np.full(len(misses), -1.0, dtype="float32")
                best_ord = np.full(len(misses), np.iinfo("int64").max,
                                   dtype="int64")
                best_key = np.empty(len(misses), dtype=object)
                for s in range(k):
                    mat = _shard_matrix(head, s)
                    if not len(mat):
                        continue
                    sh = _shard_payload(head["shard_refs"][s])
                    sims = q @ mat.T
                    b = sims.argmax(axis=1)
                    sc = sims[np.arange(len(misses)), b]
                    ords = sh["ordinals"][b]
                    better = (sc > best_sc) | ((sc == best_sc)
                                               & (ords < best_ord))
                    best_sc = np.where(better, sc, best_sc)
                    best_ord = np.where(better, ords, best_ord)
                    if better.any():
                        best_key[better] = sh["keys"][b[better]]
                for i, u in enumerate(misses):
                    key = (str(best_key[i])
                           if best_sc[i] >= self.min_score
                           else minted_key(u))
                    out_map[u] = self._res_cache[u] = key
        return norm.map(out_map).to_numpy(dtype=object)

    def link_surfaces(self, surfaces: pd.Series) -> tuple[np.ndarray, pd.Series]:
        """Vectorized surface -> (entity keys, normalized surfaces)."""
        norm = normalize_surfaces(surfaces)
        if self._head is not None:
            return self._link_sharded(norm), norm
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


class ShardedAliasIndex:
    """Hash-sharded alias inventory — the SURVEY §7 M3 contract: the
    normalized alias dict is split into ``n_shards`` by
    ``crc32(norm) % n_shards``, each shard ``ray.put`` as its OWN
    object, and a worker deserializes only the shards its batch's
    surfaces actually hash into. The whole-index broadcast
    (:class:`AliasIndex`) kept a per-worker-process heap copy of the
    ENTIRE inventory (reference analog: per-consumer captured state,
    /root/reference/src/graph_loader.rs:394-397); here exact-path
    residency is 1/k per touched shard, and a cold shard is never
    fetched at all.

    Exact-parity contract with the whole index (pinned by
    ``tests/test_link.py::test_sharded_vs_whole_byte_identical``):

    - exact hits: the shard dicts partition ``alias_map`` — same
      lookups, same values.
    - fuzzy misses: IDF is GLOBAL — per-shard document-frequency
      partials folded on first use (float32 adds of 1.0 on integer
      partial sums are exact below 2²⁴ aliases, so shard fold order
      can't change a bit); per-shard trigram matrices are built
      lazily against that global IDF, and the cross-shard best is
      combined as (max score, tie → lowest GLOBAL ordinal), which
      replicates the whole-matrix ``argmax`` first-index rule. Equal
      trigram vectors tie at bitwise-equal scores, so the ordinal rule
      decides exactly as the single argmax would.
    - fuzzy residency caveat: a miss-heavy batch still scans every
      shard's matrix (brute-force cosine is inherently whole-inventory)
      — shards bound the EXACT path and let the object store page the
      fuzzy side; inventories beyond that want the LSH/IVF route
      (``ops/ann.py``).
    """

    @staticmethod
    def shard_of(norm_surface: str, n_shards: int) -> int:
        return zlib.crc32(norm_surface.encode()) % n_shards

    @classmethod
    def build_head(cls, aliases: dict[str, str], n_shards: int) -> dict:
        """Driver-side: normalize, shard, ``ray.put`` each shard.
        Returns the HEAD — a plain dict of shard ObjectRefs (kept
        inside a dict so Ray never eagerly resolves them as task
        args). Per-shard payload: exact-lookup dict + alias list in
        global insertion order + global ordinals + entity keys.
        """
        import ray

        if aliases:
            norm = normalize_surfaces(
                pd.Series(list(aliases.keys()), dtype=object))
            # same dedup rule as AliasIndex.build: first occurrence
            # keeps the position, last occurrence keeps the value
            norm_alias = dict(zip(norm, aliases.values()))
        else:
            norm_alias = {}
        shards = [{"map": {}, "aliases": [], "keys": [], "ordinals": []}
                  for _ in range(n_shards)]
        for i, (a, k) in enumerate(norm_alias.items()):
            sh = shards[zlib.crc32(a.encode()) % n_shards]
            sh["map"][a] = k
            sh["aliases"].append(a)
            sh["keys"].append(k)
            sh["ordinals"].append(i)
        refs = []
        for sh in shards:
            sh["keys"] = np.array(sh["keys"], dtype=object)
            sh["ordinals"] = np.array(sh["ordinals"], dtype="int64")
            refs.append(ray.put(sh))
        return {"n_shards": n_shards, "shard_refs": refs,
                "n_aliases": len(norm_alias)}


# Worker-process-level caches for sharded linking: payloads, lazily
# built per-shard matrices, and the global IDF — keyed by ObjectRef
# hex so every linker instance in the process shares one copy.
_SHARD_PAYLOADS: dict = {}
_SHARD_MATRICES: dict = {}
_HEAD_IDF: dict = {}


def _shard_payload(ref) -> dict:
    key = ref.hex()
    p = _SHARD_PAYLOADS.get(key)
    if p is None:
        import ray

        p = ray.get(ref)
        _SHARD_PAYLOADS[key] = p
    return p


def _head_key(head: dict) -> str:
    return head["shard_refs"][0].hex() if head["shard_refs"] else "<empty>"


def _head_idf(head: dict) -> np.ndarray | None:
    """Global IDF folded from per-shard df partials (first fuzzy miss
    pays it once per process). Exact parity with the whole-index df:
    presence counts are integers, so the shard fold order is
    irrelevant below 2²⁴ total aliases."""
    key = _head_key(head)
    if key in _HEAD_IDF:
        return _HEAD_IDF[key]
    df = np.zeros(TRIGRAM_DIM, dtype="float32")
    n_alias = 0
    for ref in head["shard_refs"]:
        sh = _shard_payload(ref)
        n_alias += len(sh["aliases"])
        for a in sh["aliases"]:
            padded = f"  {a} "
            seen = {zlib.crc32(padded[j:j + 3].encode()) % TRIGRAM_DIM
                    for j in range(len(padded) - 2)}
            for h in seen:
                df[h] += 1.0
    idf = (np.log((1.0 + n_alias) / (1.0 + df)) + 1.0) if n_alias \
        else None
    _HEAD_IDF[key] = idf
    return idf


def _shard_matrix(head: dict, s: int) -> np.ndarray:
    key = (_head_key(head), s)
    m = _SHARD_MATRICES.get(key)
    if m is None:
        sh = _shard_payload(head["shard_refs"][s])
        m = _trigram_rows(sh["aliases"], _head_idf(head)) \
            if sh["aliases"] else np.zeros((0, TRIGRAM_DIM),
                                           dtype="float32")
        _SHARD_MATRICES[key] = m
    return m


# Worker-process-level linker cache for the TASK-based linking stage: a
# plain map_batches function scales with block count (no actor-pool sizing
# or ramp-up), and because Ray reuses worker processes, each process pays
# for ray.get(index) + EntityLinker construction exactly once.
_PROCESS_LINKERS: dict = {}


def make_linker_fn(index_ref: dict | None, min_score: float = 0.35,
                   shard_head: dict | None = None):
    """Stateless-task variant of the linking stage.

    ``index_ref = {"ref": ray.put(AliasIndex.build(aliases))}`` for the
    whole-index path, or ``shard_head = ShardedAliasIndex.build_head``
    for the sharded one. The returned function is a normal
    ``map_batches`` fn; the heavy state is fetched zero-copy from the
    local object store and cached per worker process. Prefer this over
    the actor-pool form when the state is a read-only broadcast (the
    pool buys nothing and its sizing fights the read/write stages for
    CPUs); use the ``EntityLinker`` class directly as an actor pool
    when per-actor mutable state or GPU slots matter.
    """

    def link_batch(batch):
        if shard_head is not None:
            key = ("sharded", _head_key(shard_head), min_score)
        else:
            key = (index_ref["ref"].hex(), min_score)
        lk = _PROCESS_LINKERS.get(key)
        if lk is None:
            lk = EntityLinker(index_ref=index_ref, min_score=min_score,
                              shard_head=shard_head)
            _PROCESS_LINKERS[key] = lk
        return lk(batch)

    return link_batch
