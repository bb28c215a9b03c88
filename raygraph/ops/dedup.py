"""Deduplication operators (exact + near-dup families).

The reference's only dedup is the metadata-level smart-edge shard
anti-join (A4, /root/reference/src/sharding.rs:329-341) and sort+dedup of
collection lists (A2). A training-data engine needs data-level dedup; all
variants here follow the same scale discipline:

* per-batch partial work inside ``map_batches`` (vectorized numpy/pandas)
* ONE hash-partitioned groupby for the wide step
* candidate verification before any destructive decision (near-dup)
* connected components via union-find on the (provably small) candidate
  pair set — the pair set is bounded by LSH collisions, not corpus size.

Signatures use stable hashes — crc32 shingles (minhash) and 60-bit md5
token hashes (simhash, SQL-recomputable) — never Python ``hash()``
(which is per-process salted and would break determinism across Ray
workers).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

MERSENNE = (1 << 61) - 1

# null-group contract for every group-scoped dedup: null/NaN group
# values normalize to ONE sentinel group (they dedup among themselves,
# never silently against real groups, and never silently survive).
# Both the exact path (hash fold) and the LSH path (bucket key) use
# this same normalization — a raw pandas groupby would DROP NaN keys
# and null-group docs would never pair.
_NULL_GROUP = "\x00__null_group__"


def _group_key(s: pd.Series) -> pd.Series:
    """String group key with nulls mapped to the sentinel (the shared
    normalization of the null-group contract)."""
    out = s.astype(str)
    out[s.isna()] = _NULL_GROUP
    return out


def _check_bands(num_perm: int, bands: int) -> None:
    """Up-front parameter check shared by every minhash/LSH entry point:
    ``bands`` must evenly divide ``num_perm`` (each band hashes
    num_perm/bands signature rows). Without this, an odd combination
    (e.g. bands=48, num_perm=64) crashes deep inside the signature
    reshape with an opaque ValueError; here it's a clean domain error
    the CLI turns into one line + exit 2."""
    from raygraph.errors import InvalidParameterError

    if bands < 1 or num_perm < 1:
        raise InvalidParameterError(
            f"bands ({bands}) and num_perm ({num_perm}) must be >= 1")
    if num_perm % bands != 0:
        raise InvalidParameterError(
            f"bands ({bands}) must evenly divide num_perm ({num_perm}); "
            f"try bands in {[b for b in (4, 8, 16, 32, 64) if num_perm % b == 0]}")


# ------------------------------------------------------------------ exact
def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """sha1 of the exact content — the dedup key."""
    s = batch.column(text_col).to_pandas().fillna("")
    h = s.map(lambda t: hashlib.sha1(t.encode()).hexdigest())
    return batch.append_column("content_hash", pa.array(h, pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                group_col: str | None = None):
    """Exact dedup: hash-partition on content hash, keep the row with the
    smallest id per group (deterministic representative).

    Two-level: within-batch dedup first (partial), then ONE groupby with a
    built-in vectorized Min over a ``zero-padded-id \\x1f text`` composite
    (per-group Python over millions of tiny groups is the slow path).
    Integer ids are zero-padded to 20 digits so string Min == numeric min.

    ``group_col`` scopes the dedup (within a language / crawl snapshot,
    never across): the group value is folded into the content hash, so
    equal texts in different groups keep separate representatives. The
    output stays (id, text) — the group is a dedup KEY, not a carried
    column.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = add_content_hash(batch, text_col)
        df = t.to_pandas()
        if group_col is not None:
            df["content_hash"] = (
                _group_key(df[group_col]) + "\x1f" + df["content_hash"])
        df = df.sort_values(id_col).drop_duplicates("content_hash", keep="first")
        ids = df[id_col]
        packed = (
            ids.map("{:020d}".format) if ids.dtype.kind in "iu"
            else ids.astype(str)
        ) + "\x1f" + df[text_col].fillna("")
        return pa.table(
            {
                "content_hash": pa.array(df["content_hash"], pa.string()),
                "packed": pa.array(packed, pa.string()),
            }
        )

    def unpack(batch: pa.Table) -> pa.Table:
        s = batch.column("packed").to_pandas().str.split("\x1f", n=1)
        ids = s.str[0]
        as_int = ids.str.fullmatch(r"\d{20}").all()
        return pa.table(
            {
                id_col: pa.array(ids.astype("int64") if as_int else ids),
                text_col: pa.array(s.str[1], pa.string()),
            }
        )

    from ray.data.aggregate import Min

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("packed", alias_name="packed"))
        .map_batches(unpack, batch_format="pyarrow")
    )


# ---------------------------------------------------------------- shingles
# FNV-1a-style fold constants for the vectorized shingle hashes
_SHINGLE_P = np.uint64(1099511628211)
_SHINGLE_BASIS = np.uint64(14695981039346656037)


def _fold_windows(w: np.ndarray) -> np.ndarray:
    """Deduped polynomial hash per row of an (n_windows, k) uint-matrix:
    k vectorized mul-adds over all windows at once (wrapping uint64),
    replacing one Python-level crc32 call per window."""
    h = np.full(len(w), _SHINGLE_BASIS, dtype=np.uint64)
    for j in range(w.shape[1]):
        h *= _SHINGLE_P
        h += w[:, j]
    return np.unique(h)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Polynomial-hashed byte k-shingles (deduped, vectorized: the
    shingle windows are a stride view over the utf-8 bytes — no per-
    window Python call, no window materialization)."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) < k:  # short text: one shingle of the zero-padded bytes
        b = np.pad(b, (0, k - len(b)))
    return _fold_windows(np.lib.stride_tricks.sliding_window_view(b, k))


def char_window_hashes(texts, k: int = 5):
    """Batch char-shingle kernel: hashes of every byte k-window of every
    text in ONE vectorized pass over the concatenated utf-8 bytes.
    Returns ``(h, starts, counts)`` — doc i's window hashes are the view
    ``h[starts[i] : starts[i] + counts[i]]`` (NOT deduped: the signature
    min is idempotent over duplicates, so the per-doc unique-sort that
    dominates short-doc shingling is skipped; windows straddling a doc
    boundary exist in ``h`` but fall outside every doc's slice)."""
    enc = [(t or "").encode() for t in texts]
    enc = [e if len(e) >= k else e + b"\x00" * (k - len(e)) for e in enc]
    lens = np.fromiter(map(len, enc), dtype=np.int64, count=len(enc))
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    w = np.lib.stride_tricks.sliding_window_view(buf, k)
    h = np.full(len(w), _SHINGLE_BASIS, dtype=np.uint64)
    for j in range(k):
        h *= _SHINGLE_P
        h += w[:, j]
    starts = np.zeros(len(enc), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return h, starts, lens - k + 1


def word_ngrams(text: str, n: int = 3) -> set:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def word_shingles(text: str, n: int = 5) -> np.ndarray:
    """Hashed word n-shingles (order-sensitive windows, deduped).

    Prefer these over char shingles for small-vocabulary text: char
    5-gram sets saturate (two long docs over the same vocab approach
    Jaccard 1.0 without being duplicates), while word n-gram windows stay
    discriminative. Vectorized: one crc32 per TOKEN (cached per distinct
    token), then the n-token windows fold over the token-hash array —
    not one string join + crc32 per window."""
    toks = text.split()
    if not toks:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    cache: dict = {}
    th = np.fromiter(
        (cache.get(t) or cache.setdefault(t, zlib.crc32(t.encode()) + 1)
         for t in toks),
        dtype=np.uint64, count=len(toks))
    if len(th) < n:  # short doc: one shingle of the zero-padded tokens
        th = np.pad(th, (0, n - len(th)))
    return _fold_windows(np.lib.stride_tricks.sliding_window_view(th, n))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def ngram_jaccard_topk(
    ds,
    query_text: str,
    k: int = 10,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    exclude_id=None,
):
    """Top-k documents by word-n-gram Jaccard similarity to one query
    text — the n-gram-Jaccard dedup primitive exposed as a search.

    The query's n-gram set is broadcast ONCE (``ray.put``); each batch
    intersects against the local copy and emits at most its k best rows,
    so the driver merges ≤ k·#batches candidate rows and the corpus
    never leaves the cluster. Similarity is kept exact-integer —
    (n_inter, n_union, jaccard_bp = ⌊10^4·inter/union⌋) — so ordering
    and values are engine-independent and a SQL oracle reproduces them
    bit-for-bit. The gram inventory is a flat-array build (explode
    tokens once, n-1 vectorized str.cat passes, one drop_duplicates —
    the :func:`duplicate_ngram_stats` discipline), never a per-row
    Python set build; grams stay exact STRINGS so counts match the
    oracle with no hash-collision caveat.
    """
    import ray

    qset = word_ngrams(query_text, n)
    qref = ray.put(qset)
    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        "n_inter": pa.array([], pa.int64()),
        "n_union": pa.array([], pa.int64()),
        "jaccard_bp": pa.array([], pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        q: set = _ray.get(qref)
        lq = len(q)
        ids = batch.column(id_col).to_pandas().reset_index(drop=True)
        texts = batch.column(text_col).to_pandas().fillna("") \
            .reset_index(drop=True)
        if exclude_id is not None:
            keep = (ids != exclude_id).to_numpy()
            ids = ids[keep].reset_index(drop=True)
            texts = texts[keep].reset_index(drop=True)
        m = len(ids)
        if m == 0:
            return empty
        toks = texts.str.split()
        counts = toks.str.len().fillna(0).astype("int64").to_numpy()
        frames = []
        long = counts >= n
        if long.any():
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks[long]])
            di = np.repeat(np.nonzero(long)[0], counts[long])
            mt = len(flat) - n + 1
            # a window is a real n-gram only when it stays inside one
            # doc: one integer compare on the flat doc-index array
            valid = di[:mt] == di[n - 1:]
            gram = pd.Series(flat[:mt][valid])
            for j in range(1, n):
                gram = gram.str.cat(
                    pd.Series(flat[j:mt + j][valid]), sep=" ")
            frames.append(pd.DataFrame(
                {"di": di[:mt][valid], "g": gram.to_numpy()}))
        short = (counts > 0) & (counts < n)
        if short.any():
            # word_ngrams contract: a doc shorter than n tokens yields
            # the single gram " ".join(tokens)
            frames.append(pd.DataFrame({
                "di": np.nonzero(short)[0],
                "g": toks[short].str.join(" ").to_numpy()}))
        ng = np.zeros(m, dtype="int64")
        ni = np.zeros(m, dtype="int64")
        if frames:
            inv = pd.concat(frames, ignore_index=True).drop_duplicates()
            g_cnt = inv.groupby("di").size()
            ng[g_cnt.index.to_numpy()] = g_cnt.to_numpy()
            hit = inv[inv["g"].isin(q)]
            if len(hit):
                i_cnt = hit.groupby("di").size()
                ni[i_cnt.index.to_numpy()] = i_cnt.to_numpy()
        union = ng + lq - ni
        bp = np.where(union > 0,
                      (10_000 * ni) // np.where(union > 0, union, 1),
                      10_000)
        out = pd.DataFrame({id_col: ids, "n_inter": ni,
                            "n_union": union, "jaccard_bp": bp}) \
            .sort_values(["jaccard_bp", id_col],
                         ascending=[False, True]).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = ds.map_batches(partial, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (-r["jaccard_bp"], r[id_col]))
    return pd.DataFrame(cand[:k],
                        columns=[id_col, "n_inter", "n_union", "jaccard_bp"])


# ----------------------------------------------------------------- MinHash
class MinHasher:
    """num_perm universal-hash minhash signatures; coefficients derived
    from a fixed seed so every worker agrees. ``shingle`` selects the
    shingling: "char" (k-grams) or "word" (k-token windows)."""

    def __init__(self, num_perm: int = 64, seed: int = 42, shingle_k: int = 5,
                 shingle: str = "char"):
        rng = np.random.RandomState(seed)
        # a, b < 2^32 and shingle hashes are crc32 (< 2^32), so a*sh + b
        # fits uint64 EXACTLY — no silent mod-2^64 wrap before the Mersenne
        # reduction, preserving the universal-hash collision bounds the
        # LSH banding math relies on
        self.a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.shingle = shingle

    def shingle_hashes(self, text: str) -> np.ndarray:
        if self.shingle == "word":
            return word_shingles(text, self.shingle_k)
        return char_shingles(text, self.shingle_k)

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        # (num_perm, n_shingles) universal hashes, min over shingles.
        # (numpy's uint64 multiply has no SIMD path — the mul, not the
        # scalar %, dominates; parallelism comes from Ray blocks)
        vals = (np.outer(self.a, sh) + self.b[:, None]) % MERSENNE
        return vals.min(axis=1)

    # shingle slots per kernel chunk: num_perm × 8192 × 8 B = 4 MB @64
    # perms — the whole (mul, add, mod) working set stays in L2/L3, and
    # the preallocated buffer below is reused across chunks. The naive
    # one-big-matrix version paid ~10× in cold page faults on its
    # 100+ MB intermediates — per Ray TASK, since workers start cold.
    SIG_CHUNK = 8192

    def signatures(self, texts: list) -> np.ndarray:
        """(n_docs, num_perm) signatures for a whole batch: the
        universal-hash matrix is evaluated in cache-sized chunks into
        ONE preallocated buffer (np.multiply/add/mod with ``out=``),
        with a segmented min (np.minimum.reduceat) per chunk — the
        per-doc arithmetic loop of :meth:`signature` amortized across
        the batch. Bit-identical to per-doc :meth:`signature` (tested).
        """
        n = len(texts)
        out = np.empty((n, self.num_perm), dtype=np.uint64)
        if self.shingle == "char":
            # batch kernel: per-doc views into one window-hash array
            # (non-deduped — min over duplicate shingles is identical)
            allh, starts, counts = char_window_hashes(texts, self.shingle_k)
            sh_list = [allh[s:s + c] for s, c in zip(starts, counts)]
        else:
            sh_list = [self.shingle_hashes(t or "") for t in texts]
        lens = np.fromiter(map(len, sh_list), dtype=np.int64, count=n)
        chunk = self.SIG_CHUNK
        buf = np.empty((self.num_perm, chunk), dtype=np.uint64)
        a_col = self.a[:, None]
        b_col = self.b[:, None]
        mers = np.uint64(MERSENNE)

        def hash_into(seg: np.ndarray) -> np.ndarray:
            v = buf[:, : len(seg)]
            np.multiply(a_col, seg[None, :], out=v)
            np.add(v, b_col, out=v)
            np.mod(v, mers, out=v)
            return v

        start = 0
        while start < n:
            if lens[start] > chunk:
                # one oversized doc: running min over sub-chunks
                sh = sh_list[start]
                acc = np.full(self.num_perm, np.iinfo(np.uint64).max,
                              dtype=np.uint64)
                for off in range(0, len(sh), chunk):
                    v = hash_into(sh[off:off + chunk])
                    np.minimum(acc, v.min(axis=1), out=acc)
                out[start] = acc
                start += 1
                continue
            end, tot = start, 0
            while end < n and 0 < lens[end] and tot + lens[end] <= chunk:
                tot += lens[end]
                end += 1
            if end == start:  # empty-shingle doc (short/empty text)
                out[start] = np.full(self.num_perm,
                                     np.iinfo(np.uint64).max, np.uint64)
                start += 1
                continue
            v = hash_into(np.concatenate(sh_list[start:end]))
            starts = np.zeros(end - start, dtype=np.int64)
            np.cumsum(lens[start:end][:-1], out=starts[1:])
            out[start:end] = np.minimum.reduceat(v, starts, axis=1).T
            start = end
        return out


def minhash_bands(
    batch: pa.Table,
    hasher: MinHasher,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> pa.Table:
    """Per-batch: signature → (band_id, band_hash, doc_id) rows.

    Docs sharing any band bucket become candidate pairs after the
    groupby — the LSH trick (probability of sharing a band rises steeply
    with Jaccard similarity). Fully vectorized: batched signatures
    (:meth:`MinHasher.signatures`) and a uint64 polynomial fold over each
    band's rows instead of per-(doc, band) crc32 calls."""
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col)
    n = len(texts)
    rows_per_band = hasher.num_perm // bands
    sigs = hasher.signatures(texts).reshape(n, bands, rows_per_band)
    C = np.uint64(1099511628211)
    h = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rows_per_band):
        h = h * C + sigs[:, :, j]
    idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
    cols = {
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                            pa.int32()),
        "band_hash": pa.array(h.view(np.int64).ravel(), pa.int64()),
        "doc_id": ids.take(idx),
    }
    if group_col is not None:
        # group-scoped LSH: the group rides as an EXACT extra bucket
        # key (never hash-folded), so cross-group docs are never even
        # candidates; normalized via _group_key so null groups form one
        # sentinel bucket (same contract as the exact path — a raw NaN
        # key would be dropped by the pandas groupby and never pair)
        g = pa.array(_group_key(batch.column(group_col).to_pandas()),
                     pa.string())
        cols["grp"] = g.take(idx)
    return pa.table(cols)


BUCKET_PAIR_CAP = 512  # max ids per LSH bucket considered for pairing

# "auto" drop-strategy switchover: past this many VERIFIED duplicate
# pairs the driver union-find (broadcast path) is no longer "provably
# small" and minhash_dedup routes through the distributed
# component/anti-join path instead. At web-crawl dup rates (30-50%)
# the pair inventory is corpus-order, so the 100-TB default must never
# silently collect it (VERDICT r3 "What's wrong" #1). This fixed value
# is the FALLBACK when driver memory can't be read — the live bound is
# derived from it (:func:`auto_broadcast_max_pairs`).
AUTO_BROADCAST_MAX_PAIRS = 2_000_000

# driver-heap cost of one collected verified pair: the take_all row
# dict (two ids + dict/object overhead) plus its union-find parent
# entries — ~0.5 KB measured on int ids, more on long string ids, so
# round up.
AUTO_PAIR_BYTES = 512
# fraction of currently-available driver memory the collected pair
# inventory may occupy before "auto" routes to the distributed path
AUTO_HEAP_FRACTION = 0.05


def auto_broadcast_max_pairs() -> int:
    """Memory-derived "auto" switchover bound: the largest verified-pair
    inventory the driver union-find may collect, computed as
    ``available_memory × AUTO_HEAP_FRACTION / AUTO_PAIR_BYTES`` at call
    time. On a 128 GiB driver that's ~13M pairs; on a 4 GiB laptop
    ~400k — the bound tracks the machine instead of hard-coding one.
    Falls back to the fixed :data:`AUTO_BROADCAST_MAX_PAIRS` when
    available memory can't be read, and never drops below 100k (the
    distributed path's fixed overhead isn't worth it under that)."""
    try:
        import psutil

        avail = int(psutil.virtual_memory().available)
    except Exception:
        return AUTO_BROADCAST_MAX_PAIRS
    return max(100_000, int(avail * AUTO_HEAP_FRACTION) // AUTO_PAIR_BYTES)


def lsh_num_buckets(n_rows: int | None, bands: int = 16) -> int:
    """Shuffle bucket count for the LSH band exchange, sized to the band
    row volume (n_docs x bands): ~100k band rows per reduce task,
    floored at 16 so toy corpora do not pay 128 reduce tasks per
    shuffle, capped at 4096 (the same scheduler bound as
    materialize.adaptive_buckets). Pass the known corpus row count when
    you have it (parquet metadata); None keeps the legacy default."""
    if not n_rows:
        return 128
    return int(min(4096, max(16, (n_rows * bands) // 100_000)))


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket — the executable
    SPECIFICATION of the BUCKET_PAIR_CAP contract. The hot paths
    (minhash / winnow / jaccard / containment bucket reduces) run a
    vectorized capped self-merge that must emit exactly this pair set
    per bucket; a property pytest pins the equivalence. The cap guards
    a degenerate bucket from emitting O(n^2) pairs — an explicit
    coverage bound: docs beyond it in a single bucket are not paired
    (raise BUCKET_PAIR_CAP or the band width if that happens on real
    data).

    Outputs are typed like the input id column even when EMPTY (a
    single-id bucket): an untyped empty frame would become a null-typed
    Arrow block and poison downstream schema unification (joins)."""
    ids = sorted(g["doc_id"].unique())
    cap = BUCKET_PAIR_CAP
    out_a, out_b = [], []
    for i, a in enumerate(ids[:cap]):
        for b in ids[i + 1 : cap]:
            out_a.append(a)
            out_b.append(b)
    dt = g["doc_id"].dtype
    return pd.DataFrame({"id_a": pd.Series(out_a, dtype=dt),
                         "id_b": pd.Series(out_b, dtype=dt)})


# ---------------------------------------------------- bloom-guarded index
# Exact-index epoch layout v2: hashes land hash-BUCKETED
# (``epoch-NNNNN/bucket=B/*.parquet``) with a per-bucket Bloom filter
# sidecar (``_bloom.json``) committed atomically with the epoch. The
# increment path tests delta hashes against the blooms FIRST: rows
# negative in every epoch are definite survivors and never enter the
# anti-join; only bloom-positive rows join, and only the (epoch,
# bucket) dirs they actually hit are read. That turns the per-increment
# index cost from index-sized (read + shuffle every epoch's hashes)
# into touched-bucket-sized — at a 10^9-hash index and a mostly-new
# delta, ~FP-rate (<1%) of the index is read instead of all of it.
# False positives only cost a join lookup (verified exactly), so the
# survivor set is bit-identical to the unguarded path (pinned by
# pytest). v1 epochs (flat files, no sidecar) stay readable: their
# rows count as always-possible and their files always join.
INDEX_BUCKETS = 64          # bucket-count floor per v2 epoch
INDEX_ROWS_PER_BUCKET = 100_000   # target hashes per bucket (~4 MB)
INDEX_MAX_BUCKETS = 4096
BLOOM_BITS_PER_KEY = 16     # ~0.05% FP at k=11
BLOOM_K = 11
# bloom-positive rows at or under this bound resolve via direct
# per-bucket membership tasks (positive hashes driver-held, touched
# buckets read in parallel, no Dataset shuffle); above it they fall
# back to the hash-partitioned anti-join. Fallback when driver memory
# can't be read — the live bound is :func:`_pos_broadcast_max`.
POS_BROADCAST_MAX = 200_000
POS_BYTES_EACH = 256        # hash string + set/arrow overhead


def _pos_broadcast_max() -> int:
    """Memory-derived fast-path bound: how many bloom-positive rows the
    driver may hold for per-bucket membership resolution (2% of
    available memory at ~256 B each; floor 50k). Mirrors
    :func:`auto_broadcast_max_pairs` — the machine sets the bound, the
    constant is only the no-psutil fallback."""
    try:
        import psutil

        avail = int(psutil.virtual_memory().available)
    except Exception:
        return POS_BROADCAST_MAX
    return max(50_000, int(avail * 0.02) // POS_BYTES_EACH)


def _bloom_budget_bytes() -> int:
    """Cap on decoded bloom bytes held at once during an increment
    (10% of available memory; 1 GiB fallback). Epochs whose sidecars
    would exceed the remaining budget are treated as unguarded (v1
    semantics: rows stay possible, files always join) — correctness
    is untouched, only their pruning is lost. Binds only on indexes
    whose TOTAL key count approaches 10^10 (2 B/key); the intended
    remedy there is wider epochs after compaction, not more driver
    memory."""
    try:
        import psutil

        return int(psutil.virtual_memory().available * 0.10)
    except Exception:
        return 1 << 30


def _decode_bloom_metas(metas: list) -> tuple[dict, list]:
    """Decode per-epoch bloom sidecars under the byte budget: returns
    ``(blooms, effective_metas)`` where epochs that exceed the budget
    have their meta replaced by None (v1 semantics)."""
    import base64

    budget = _bloom_budget_bytes()
    blooms: dict = {}
    eff = list(metas)
    for ei, m in enumerate(metas):
        if m is None:
            continue
        need = sum((int(s["nbits"]) + 7) // 8
                   for s in m["buckets"].values())
        if need > budget:
            eff[ei] = None
            continue
        budget -= need
        for b, spec in m["buckets"].items():
            blooms[(ei, b)] = (
                int(spec["nbits"]),
                np.frombuffer(zlib.decompress(
                    base64.b64decode(spec["bits"])), np.uint8))
    return blooms, eff


def _epoch_bucket_count(n_rows: int | None) -> int:
    """Buckets for one epoch, sized so each holds
    ~``INDEX_ROWS_PER_BUCKET`` hashes: a bloom-positive delta row then
    costs one bucket read (~4 MB) instead of the whole epoch. Epochs
    at or under one bucket's worth of rows get exactly ONE bucket —
    reading them whole is already trivial, and the 64-dir layout +
    per-bucket bloom tasks would cost more than they prune. The count
    is persisted in the epoch's ``_bloom.json`` (readers never assume
    it), so the policy can change without invalidating old epochs."""
    if not n_rows:
        return INDEX_BUCKETS
    if n_rows <= INDEX_ROWS_PER_BUCKET:
        return 1
    return int(min(INDEX_MAX_BUCKETS,
                   max(INDEX_BUCKETS, n_rows // INDEX_ROWS_PER_BUCKET)))


def _hash_u64_pair(hashes: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 pairs from sha1 hex strings — the first 32 hex
    chars parsed as two big-endian u64s, fully vectorized (one C-level
    join + frombuffer, no per-row int())."""
    if not len(hashes):
        z = np.zeros(0, np.uint64)
        return z, z
    cat = "".join(hashes.str.slice(0, 32))
    raw = np.frombuffer(bytes.fromhex(cat), dtype=">u8").reshape(-1, 2)
    return (raw[:, 0].astype(np.uint64), raw[:, 1].astype(np.uint64))


def _bloom_positions(h1, h2, nbits: int, i: int):
    return (h1 + np.uint64(i) * h2) % np.uint64(nbits)


def _bloom_build(h1, h2, nbits: int) -> np.ndarray:
    bits = np.zeros((nbits + 7) // 8, np.uint8)
    for i in range(BLOOM_K):
        pos = _bloom_positions(h1, h2, nbits, i)
        np.bitwise_or.at(
            bits, (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
    return bits


def _bloom_test(bits: np.ndarray, nbits: int, h1, h2) -> np.ndarray:
    res = np.ones(len(h1), bool)
    for i in range(BLOOM_K):
        pos = _bloom_positions(h1, h2, nbits, i)
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        res &= ((byte >> (pos & np.uint64(7)).astype(np.uint8))
                & np.uint8(1)).astype(bool)
        if not res.any():
            break
    return res


def _u64_mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates band keys into bloom probes."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _band_key_u64(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 pairs for (band_id, band_hash) rows — the LSH
    band index's bloom/bucket key."""
    bh = batch.column("band_hash").to_numpy(zero_copy_only=False) \
        .astype(np.int64).view(np.uint64)
    bi = batch.column("band_id").to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    h1 = _u64_mix(bh * np.uint64(0x9E3779B97F4A7C15) + bi)
    return h1, _u64_mix(h1) | np.uint64(1)


def _id_key_u64(col) -> np.ndarray:
    """Deterministic uint64 key for a rep-id column (int or string) —
    pandas' stable hash (fixed hash_key, no PYTHONHASHSEED dependence)
    mixed once more. Writers bucket reps by it; readers recompute it
    for candidate ids to prune the reps read."""
    s = col.to_pandas() if hasattr(col, "to_pandas") else pd.Series(col)
    h = pd.util.hash_pandas_object(s, index=False) \
        .to_numpy().astype(np.uint64)
    return _u64_mix(h)


def _build_dir_blooms(dirpath: str, key_cols: list[str],
                      key_fn) -> dict:
    """Per-bucket bloom sidecar payload for a freshly-staged bucketed
    directory: one Ray task per ``bucket=B`` subdir reads its files,
    derives (h1, h2) via ``key_fn`` and returns the packed filter."""
    import base64

    import ray

    from raygraph import stateio

    @ray.remote
    def one(files: list[str]):
        tbl = pa.concat_tables(
            [stateio.pq_read_table(f, columns=key_cols) for f in files])
        h1, h2 = key_fn(tbl)
        nbits = max(256, BLOOM_BITS_PER_KEY * len(h1))
        return nbits, zlib.compress(_bloom_build(h1, h2, nbits).tobytes())

    refs = {}
    for name in stateio.listdir(dirpath):
        if name.startswith("bucket="):
            refs[name.split("=", 1)[1]] = one.remote(
                stateio.data_files(stateio.join(dirpath, name)))
    buckets = {}
    for b, r in refs.items():
        nbits, blob = ray.get(r)
        buckets[b] = {"nbits": nbits,
                      "bits": base64.b64encode(blob).decode()}
    return buckets


def _nested_data_files(d: str) -> list[str]:
    """Payload files of a possibly-bucketed directory: flat files (v1)
    plus one level of ``bucket=B/`` subdirs (v2)."""
    from raygraph import stateio

    out = stateio.data_files(d)
    for name in stateio.listdir(d):
        if name.startswith("bucket="):
            out += stateio.data_files(stateio.join(d, name))
    return out


def _exact_epoch_files(index_dir: str, epoch_name: str) -> list[str]:
    """All hash parquet files of one exact-index epoch, both layouts
    (v1 flat files + v2 ``bucket=B/`` subdirs)."""
    from raygraph import stateio

    return _nested_data_files(stateio.join(index_dir, epoch_name))


def _write_exact_epoch(sh_hashes, index_dir: str, epoch: int,
                       n_rows: int | None = None) -> None:
    """Stage + commit one v2 exact-index epoch: hashes bucketed by
    ``h1 % INDEX_BUCKETS``, per-bucket blooms built by Ray tasks (each
    reads only its bucket's freshly-staged files), ``_bloom.json``
    written into the staging dir so :func:`raygraph.stateio.commit_dir`
    makes epoch + sidecar atomic together."""
    from raygraph import stateio

    tmp = stateio.join(index_dir, f"_tmp-{epoch:05d}")
    final = stateio.join(index_dir, f"epoch-{epoch:05d}")
    stateio.rmtree(tmp)
    stateio.makedirs(tmp)
    n_buckets = _epoch_bucket_count(n_rows)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h1, _h2 = _hash_u64_pair(batch.column("content_hash")
                                 .to_pandas())
        return batch.append_column(
            "bucket", pa.array((h1 % np.uint64(n_buckets))
                               .astype(np.int64), pa.int64()))

    stateio.ray_write_parquet(
        sh_hashes.map_batches(add_bucket, batch_format="pyarrow"),
        tmp, partition_cols=["bucket"])

    meta = {"version": 2, "n_buckets": n_buckets, "k": BLOOM_K,
            "bits_per_key": BLOOM_BITS_PER_KEY,
            "buckets": _build_dir_blooms(
                tmp, ["content_hash"],
                lambda t: _hash_u64_pair(
                    t.column("content_hash").to_pandas()))}
    stateio.write_json_atomic(stateio.join(tmp, "_bloom.json"), meta)
    stateio.commit_dir(tmp, final)


def exact_dedup_incremental(delta, index_dir: str,
                            text_col: str = "text",
                            id_col: str = "doc_id"):
    """Cross-EPOCH exact dedup — the daily-crawl-increment pattern: a
    delta corpus is deduped within itself (:func:`exact_dedup`, min-id
    representative) and against a PERSISTED content-hash index, then
    the survivors' hashes are committed as a new index epoch. The base
    corpus is never rescanned: at 100 TB the index is one 40-byte hash
    per unique document, and each increment touches only delta-sized
    data plus one hash-keyed anti-join against the index Dataset
    (shuffled, never broadcast — the index outgrows a worker long
    before the corpus does).

    SINGLE-WRITER index: epoch numbering assumes one ingest process at
    a time — two concurrent commits would race one epoch number, and
    the loser's commit fails loudly rather than corrupting
    (same contract as :func:`minhash_dedup_incremental` and
    :func:`compact_dedup_index`).

    Index layout: ``<index_dir>/epoch-NNNNN/`` parquet directories,
    each holding a single ``content_hash`` string column. All index IO
    routes through :mod:`raygraph.stateio`, so ``index_dir`` may live
    on shared/object storage; commit is stage-to-``_tmp-…`` then
    :func:`raygraph.stateio.commit_dir` (atomic rename locally, marker
    commit on stores without atomic rename); a crashed run leaves only
    an uncommitted partial that later runs ignore, and re-running the
    same delta converges (every hash already known → empty epoch).

    Returns ``(survivors, epoch)``: the surviving delta rows
    (id, text — other columns are not carried) and the committed
    epoch number. Reference analog: resumable shard checkpoints,
    arangors-graph-exporter src/graph_loader.rs:193-206.
    """
    from raygraph import stateio
    from raygraph.ops.graph import _repaired

    from .relational import cogroup_join, dataset_arrow_schema

    surv = _repaired(exact_dedup(delta, text_col, id_col),
                     pa.schema([(id_col, dataset_arrow_schema(delta)
                                 .field(id_col).type),
                                (text_col, pa.string())]))

    def with_hash(batch: pa.Table) -> pa.Table:
        return add_content_hash(batch, text_col)

    sh = surv.map_batches(with_hash, batch_format="pyarrow")

    stateio.makedirs(index_dir)
    epochs = stateio.committed_dirs(index_dir, "epoch-")
    if epochs:
        sh = _index_anti_join(sh, index_dir, epochs, cogroup_join)
    sh = sh.materialize()

    epoch = int(epochs[-1].split("-")[1]) + 1 if epochs else 0
    # the epoch must commit even for a fully-deduped delta (0 rows —
    # it records "this delta ran"): _write_exact_epoch stages an empty
    # bucketed dir + empty bloom sidecar and commits it
    _write_exact_epoch(sh.select_columns(["content_hash"]), index_dir,
                       epoch, n_rows=sh.count())

    return sh.drop_columns(["content_hash"]), epoch


def _index_anti_join(sh, index_dir: str, epochs: list[str],
                     cogroup_join):
    """Drop delta rows whose content hash exists in the committed
    index — bloom-guarded: rows negative in every epoch's bucket bloom
    bypass the join entirely (they are definite survivors), and the
    join reads only the (epoch, bucket) dirs the positive rows hit.
    v1 epochs (no sidecar) make every row positive and contribute all
    their files — mixed indexes stay exact."""
    import ray

    from raygraph import stateio
    from raygraph.ops.graph import _repaired

    from .relational import dataset_arrow_schema

    metas = []
    for e in epochs:
        bp = stateio.join(index_dir, e, "_bloom.json")
        metas.append(stateio.read_json(bp) if stateio.exists(bp)
                     else None)

    blooms, metas = _decode_bloom_metas(metas)
    if all(m is None for m in metas):
        # pure-v1 index (or bloom budget exhausted): the original full
        # anti-join (list FILES explicitly — read_parquet expands a
        # single dir path but not directories inside a list argument)
        files = [f for e in epochs
                 for f in _exact_epoch_files(index_dir, e)]
        known = stateio.ray_read_parquet(files,
                                         columns=["content_hash"])
        return cogroup_join(sh, known, on="content_hash",
                            how="left_anti")

    bloom_ref = ray.put(blooms)
    nb_per_epoch = [None if m is None else int(m["n_buckets"])
                    for m in metas]
    has_v1 = any(m is None for m in metas)

    def classify(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bl = _ray.get(bloom_ref)
        h = batch.column("content_hash").to_pandas()
        h1, h2 = _hash_u64_pair(h)
        possible = np.full(len(h), has_v1)   # v1 rows: always possible
        for ei, nb in enumerate(nb_per_epoch):
            if nb is None:
                continue
            bucket = (h1 % np.uint64(nb)).astype(np.int64)
            for b in np.unique(bucket):
                spec = bl.get((ei, str(b)))
                if spec is None:
                    continue            # empty bucket: impossible
                idx = bucket == b
                possible[idx] |= _bloom_test(spec[1], spec[0],
                                             h1[idx], h2[idx])
        return batch.append_column("__possible",
                                   pa.array(possible, pa.bool_()))

    schema = dataset_arrow_schema(sh)
    tagged = sh.map_batches(classify,
                            batch_format="pyarrow").materialize()

    def split(keep_possible: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = batch.column("__possible")
            if not keep_possible:
                mask = pc.invert(mask)
            return batch.filter(mask).drop_columns(["__possible"])

        return fn

    neg = _repaired(tagged.map_batches(split(False),
                                       batch_format="pyarrow"), schema)
    pos = _repaired(tagged.map_batches(split(True),
                                       batch_format="pyarrow"), schema)
    n_pos = pos.count()
    if n_pos == 0:
        return neg

    import logging

    pos_bound = _pos_broadcast_max()
    logging.getLogger(__name__).info(
        "exact-index guard: %d bloom-positive of the delta "
        "(bound %d) -> %s", n_pos, pos_bound,
        "per-bucket tasks" if n_pos <= pos_bound
        else "anti-join over touched buckets")
    if n_pos <= pos_bound:
        # fast path for the production micro-batch shape: the positive
        # HASHES (true dups + the sub-0.1% bloom FPs) fit the driver,
        # so resolve membership with one parallel task per touched
        # (epoch, bucket) — each reads only its bucket's files and
        # checks the driver-supplied subset — and drop via one
        # broadcast is_in filter. No Dataset shuffle, no untouched
        # bucket read.
        import ray

        ph = pos.select_columns(["content_hash"]).to_pandas()[
            "content_hash"]
        h1, _h2 = _hash_u64_pair(ph)
        groups: dict = {}   # (ei, bucket|-1) -> set of hashes to check
        for ei, nb in enumerate(nb_per_epoch):
            if nb is None:     # v1 epoch: every positive, all files
                groups[(ei, -1)] = set(ph)
                continue
            bucket = (h1 % np.uint64(nb)).astype(np.int64)
            for b in np.unique(bucket):
                groups[(ei, int(b))] = set(ph[bucket == b])

        @ray.remote
        def check(files: list[str], hashes: set) -> set:
            from raygraph import stateio as _st

            found: set = set()
            for f in files:
                col = _st.pq_read_table(
                    f, columns=["content_hash"]).column("content_hash")
                found |= set(col.to_pylist()) & hashes
                if len(found) == len(hashes):
                    break
            return found

        refs = []
        for (ei, b), hashes in groups.items():
            if b == -1:
                files = _exact_epoch_files(index_dir, epochs[ei])
            else:
                files = stateio.data_files(stateio.join(
                    index_dir, epochs[ei], f"bucket={b}"))
            if files:
                refs.append(check.remote(files, hashes))
        known: set = set()
        for r in refs:
            known |= ray.get(r)
        if not known:
            return _repaired(neg.union(pos), schema)
        known_arr = pa.array(sorted(known), pa.string())

        def drop_known(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.invert(pc.is_in(
                batch.column("content_hash"), value_set=known_arr)))

        kept = pos.map_batches(drop_known, batch_format="pyarrow")
        return _repaired(neg.union(_repaired(kept, schema)), schema)

    # heavy-duplication fallback: hash-partitioned anti-join over the
    # touched buckets (plus every v1 epoch file)
    def hit_rows(batch: pa.Table) -> pa.Table:
        h1b, _ = _hash_u64_pair(batch.column("content_hash").to_pandas())
        eis, bks = [], []
        for ei, nb in enumerate(nb_per_epoch):
            if nb is None:
                continue
            u = np.unique(h1b % np.uint64(nb)).astype(np.int64)
            bks.extend(u.tolist())
            eis.extend([ei] * len(u))
        return pa.table({"ei": pa.array(eis, pa.int32()),
                         "bucket": pa.array(bks, pa.int64())})

    hits = pos.map_batches(hit_rows, batch_format="pyarrow") \
        .to_pandas().drop_duplicates()
    touched = set(zip(hits["ei"].astype(int), hits["bucket"].astype(int)))

    files = []
    for ei, e in enumerate(epochs):
        if metas[ei] is None:
            files += _exact_epoch_files(index_dir, e)
        else:
            d = stateio.join(index_dir, e)
            for name in stateio.listdir(d):
                if name.startswith("bucket=") and \
                        (ei, int(name.split("=", 1)[1])) in touched:
                    files += stateio.data_files(stateio.join(d, name))
    if not files:
        return _repaired(neg.union(pos), schema)
    known = stateio.ray_read_parquet(files, columns=["content_hash"])
    kept = cogroup_join(pos, known, on="content_hash", how="left_anti")
    return _repaired(neg.union(_repaired(kept, schema)), schema)


def lsh_bucket_stats(ds, num_perm: int = 64, bands: int = 16,
                     text_col: str = "text", id_col: str = "doc_id",
                     shingle: str = "char",
                     num_buckets: int | None = None,
                     group_col: str | None = None,
                     cap: int | None = None) -> dict:
    """Distributed LSH bucket-size profile — the observability for the
    ``BUCKET_PAIR_CAP`` skew defense: how big do band buckets actually
    get on this corpus, how many exceed the cap, and how many docs sit
    beyond it (i.e. are excluded from pairing in that bucket). The caps
    bound worst-case pair blowup under skew (a boilerplate page or hot
    group collapsing into one bucket); this reports whether that bound
    BINDS, so a deployment can raise the cap / band width on evidence
    instead of guessing.

    Shape: band rows → per-batch partial counts → ONE key-hashed count
    aggregation (bucket-count-sized, never pair-sized) → per-block
    scalar partials summed on the driver (block-count-sized). Returns
    ``{n_buckets, max_bucket_size, buckets_over_cap, docs_beyond_cap,
    cap}``.
    """
    from .relational import hash_aggregate

    _check_bands(num_perm, bands)
    hasher = MinHasher(num_perm=num_perm, shingle=shingle)
    band_keys = ["band_id", "band_hash"] + (
        ["grp"] if group_col is not None else [])
    the_cap = BUCKET_PAIR_CAP if cap is None else cap

    rows = ds.map_batches(
        lambda b: minhash_bands(b, hasher, bands, text_col, id_col,
                                group_col),
        batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(band_keys + ["doc_id"]).to_pandas() \
            .drop_duplicates()
        c = df.groupby(band_keys, sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(c, preserve_index=False)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(band_keys, sort=False)["n"].sum() \
            .reset_index()

    sizes = hash_aggregate(
        rows.map_batches(partial, batch_format="pyarrow"),
        band_keys, total, num_buckets=num_buckets or 64)

    def scalarize(batch: pa.Table) -> pa.Table:
        if "n" not in batch.schema.names or batch.num_rows == 0:
            return pa.table({"n_buckets": pa.array([0], pa.int64()),
                             "max_size": pa.array([0], pa.int64()),
                             "over_cap": pa.array([0], pa.int64()),
                             "beyond": pa.array([0], pa.int64())})
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_buckets": pa.array([len(n)], pa.int64()),
            "max_size": pa.array([int(n.max())], pa.int64()),
            "over_cap": pa.array([int((n > the_cap).sum())],
                                 pa.int64()),
            "beyond": pa.array(
                [int(np.clip(n - the_cap, 0, None).sum())],
                pa.int64()),
        })

    parts = sizes.map_batches(scalarize,
                              batch_format="pyarrow").take_all()
    return {
        "n_buckets": sum(p["n_buckets"] for p in parts),
        "max_bucket_size": max((p["max_size"] for p in parts),
                               default=0),
        "buckets_over_cap": sum(p["over_cap"] for p in parts),
        "docs_beyond_cap": sum(p["beyond"] for p in parts),
        "cap": the_cap,
    }


def minhash_candidates(ds, num_perm: int = 64, bands: int = 16,
                       text_col: str = "text", id_col: str = "doc_id",
                       shingle: str = "char",
                       num_buckets: int | None = None,
                       group_col: str | None = None):
    """Corpus Dataset → deduped candidate-pair Dataset (id_a < id_b).

    ``bands`` trades recall for bucket size: more bands (narrower rows per
    band) = higher recall for lower-similarity pairs but bigger buckets.
    Pair dedup across bands is a hash-bucketed vectorized distinct — one
    pandas ``drop_duplicates`` per bucket, never a Python call per pair.

    ``group_col`` scopes the dedup: the group value becomes an EXACT
    extra bucket key, so docs in different groups (languages, crawl
    snapshots) never pair — the "dedup within a snapshot, never
    across" curation control.
    """
    from .relational import hash_aggregate

    _check_bands(num_perm, bands)
    hasher = MinHasher(num_perm=num_perm, shingle=shingle)
    band_keys = ["band_id", "band_hash"] + (
        ["grp"] if group_col is not None else [])

    def bucket_pairs_many(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over ALL band buckets hashed to this task:
        # singleton buckets (the overwhelming majority) drop in one
        # transform("size") filter; the survivors pair via a capped
        # self-merge — no per-group Python even for colliding buckets
        keys = band_keys
        df = df.drop_duplicates(keys + ["doc_id"])
        sizes = df.groupby(keys)["doc_id"].transform("size")
        df = df[sizes >= 2]
        if df.empty:
            dt = df["doc_id"].dtype  # keep the id type even when empty
            return pd.DataFrame({"id_a": pd.Series([], dtype=dt),
                                 "id_b": pd.Series([], dtype=dt)})
        df = df.sort_values(keys + ["doc_id"], kind="mergesort")
        df = df[df.groupby(keys).cumcount() < BUCKET_PAIR_CAP]
        m = df.merge(df, on=keys, suffixes=("_l", "_r"))
        m = m[m["doc_id_l"] < m["doc_id_r"]]
        return pd.DataFrame({
            "id_a": m["doc_id_l"].to_numpy(),
            "id_b": m["doc_id_r"].to_numpy()}).drop_duplicates()

    nb = num_buckets or 128
    pairs = hash_aggregate(
        ds.map_batches(
            lambda b: minhash_bands(b, hasher, bands, text_col, id_col,
                                    group_col),
            batch_format="pyarrow",
        ),
        band_keys,
        bucket_pairs_many,
        num_buckets=nb,
    )
    # dedupe pairs that matched in several bands (pair volume is far
    # below band-row volume; a quarter of the buckets suffices)
    return hash_aggregate(pairs, ["id_a", "id_b"],
                          lambda df: df.drop_duplicates(),
                          num_buckets=max(8, nb // 4))


SIZES_BROADCAST_LIMIT = 2_000_000  # per-doc count rows; above this the
# containment finish joins sizes instead of broadcasting the dict
BROADCAST_PAIR_LIMIT = 50_000  # pairs; below this the endpoint-text
# lookup is a broadcast is_in filter (one corpus pass, ≤2×pairs rows to
# the driver) instead of two hash-shuffle joins — at LSH-typical
# candidate volumes the joins' exchange setup dwarfs the data movement


def attach_pair_texts(cand, ds, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Attach both endpoint texts to a candidate (id_a, id_b) pair
    Dataset — the in-cluster verify idiom shared by
    :func:`minhash_verified_pairs` and :func:`jaccard_threshold_pairs`.

    Two strategies on one contract (returns ``(joined, id_type)`` with
    ``__text_a`` / ``__text_b`` columns, or ``(None, None)`` when there
    are no candidates):

    - ≤ ``BROADCAST_PAIR_LIMIT`` pairs: collect the candidate id set
      (pair-volume-sized), semi-filter the corpus with one broadcast
      ``pc.is_in`` streaming pass, and map texts onto pairs from the
      broadcast id→text table. The corpus is read once and only
      matching rows (≤ 2×pairs) ever leave the cluster.
    - above the limit: two hash-partitioned ``Dataset.join``s — the
      join intermediates are pair-volume-sized (the provably small
      side) and nothing is driver-resident.
    """
    import ray

    from .relational import coerce_schema, compact_nonempty

    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return None, None
    sch = cand.schema()
    id_t = sch.types[sch.names.index("id_a")]

    if n_cand <= BROADCAST_PAIR_LIMIT:
        pairs_tbl = pa.concat_tables(
            [b for b in cand.iter_batches(batch_format="pyarrow")
             if b.num_rows],
        )
        import pyarrow.compute as pc

        need = pc.unique(pa.concat_arrays([
            pairs_tbl.column("id_a").combine_chunks().cast(id_t),
            pairs_tbl.column("id_b").combine_chunks().cast(id_t),
        ]))
        need_ref = ray.put(need)

        def semi(batch: pa.Table) -> pa.Table:
            import ray as _ray

            mask = pc.is_in(batch.column(id_col), value_set=_ray.get(need_ref))
            return batch.filter(mask)

        hits = pa.concat_tables(
            [b for b in ds.select_columns([id_col, text_col])
             .map_batches(semi, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if b.num_rows],
        )
        lookup = dict(zip(hits.column(id_col).to_pylist(),
                          hits.column(text_col).to_pylist()))
        lk_ref = ray.put(lookup)

        _MISS = object()

        def attach(batch: pa.Table) -> pa.Table:
            import ray as _ray

            lk: dict = _ray.get(lk_ref)
            ta = [lk.get(i, _MISS) for i in batch.column("id_a").to_pylist()]
            tb = [lk.get(i, _MISS) for i in batch.column("id_b").to_pylist()]
            # inner-join semantics: a pair whose endpoint id is absent
            # from the corpus drops (nulls in the corpus text survive)
            keep = pa.array([a is not _MISS and b is not _MISS
                             for a, b in zip(ta, tb)], pa.bool_())
            out = batch.append_column(
                "__text_a",
                pa.array([None if a is _MISS else a for a in ta],
                         pa.string()),
            ).append_column(
                "__text_b",
                pa.array([None if b is _MISS else b for b in tb],
                         pa.string()),
            )
            return out.filter(keep)

        import ray.data as _rd

        j = _rd.from_arrow(pairs_tbl).map_batches(
            attach, batch_format="pyarrow")
        return j, id_t
    # drop Ray-internal zero-row blocks (metadata-only), then a LAZY
    # coerce fuses into the join's upstream — no extra materialization
    cand = coerce_schema(
        compact_nonempty(cand),
        pa.schema([("id_a", id_t), ("id_b", id_t)]),
    )

    texts = ds.select_columns([id_col, text_col])
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    # one live aggregator actor per partition per join: size to the
    # candidate volume so toy inputs don't pay 32 actor spin-ups, while
    # big candidate sets still fan out to the cluster width
    nparts = max(2, min(cpus, n_cand // 25_000 + 4))

    def renamed(src, mapping):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [mapping.get(c, c) for c in batch.schema.names]
            )

        return src.map_batches(fn, batch_format="pyarrow")

    j = cand.join(
        renamed(texts, {id_col: "id_a", text_col: "__text_a"}),
        join_type="inner", num_partitions=nparts, on=("id_a",),
    )
    # the join ALSO emits schemaless blocks for empty output partitions
    # (and lazy ops skip empty blocks), so compact before chaining into
    # the second join — the intermediate is pairs+one text column, the
    # small side by construction
    j = compact_nonempty(j.materialize())
    if j is None:
        return None, None
    j = j.join(
        renamed(texts, {id_col: "id_b", text_col: "__text_b"}),
        join_type="inner", num_partitions=nparts, on=("id_b",),
    )
    return j, id_t


def minhash_verified_pairs(
    ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: str = "char",
    num_buckets: int | None = None,
    group_col: str | None = None,
):
    """LSH candidates → exact Jaccard verify, fully in-cluster: candidate
    texts are attached via two hash-partitioned ``Dataset.join``s and
    Jaccard runs inside ``map_batches`` — the corpus never streams
    through the driver. Returns the lazy verified (id_a, id_b) pair
    Dataset (the provably small side: true near-dups only), or ``None``
    when LSH produced no candidates. Shared front half of
    :func:`minhash_dedup` and :func:`near_dup_clusters`."""
    cand = minhash_candidates(ds, num_perm, bands, text_col, id_col,
                              shingle=shingle, num_buckets=num_buckets,
                              group_col=group_col)
    j, id_t = attach_pair_texts(cand, ds, text_col, id_col)
    if j is None:
        return None

    hasher = MinHasher(num_perm=num_perm, shingle=shingle)

    pair_schema = pa.schema([("id_a", id_t), ("id_b", id_t)])

    def verify(batch: pa.Table) -> pa.Table:
        if "__text_a" not in batch.schema.names:
            # zero-column empty partition straight out of the join
            return pair_schema.empty_table()
        ta = batch.column("__text_a").to_pylist()
        tb = batch.column("__text_b").to_pylist()
        cache: dict = {}
        pair_cache: dict = {}

        def sh(t):
            t = t or ""
            got = cache.get(t)
            if got is None:
                got = cache[t] = set(hasher.shingle_hashes(t).tolist())
            return got

        # pair-level memo on top of the per-text shingle cache: a
        # dup-heavy corpus repeats the SAME (text, text) comparison
        # across thousands of candidate pairs (every copy-pair of one
        # boilerplate body) — one set intersection per distinct pair,
        # not per candidate row
        def ok(a, b):
            key = (a, b)
            got = pair_cache.get(key)
            if got is None:
                got = pair_cache[key] = \
                    jaccard(sh(a), sh(b)) >= threshold
            return got

        keep = [ok(a, b) for a, b in zip(ta, tb)]
        return batch.filter(pa.array(keep, pa.bool_())).select(["id_a", "id_b"])

    return j.map_batches(verify, batch_format="pyarrow")


def _padded_id(col):
    """Zero-padded string form of an int id column (lexicographic min ==
    numeric min) — the label-propagation key shared by
    :func:`near_dup_clusters` and the distributed dedup drop path."""
    import pyarrow.compute as pc

    s = pc.cast(pc.cast(col, pa.int64()), pa.string())
    return pc.utf8_lpad(s, _CLUSTER_PAD, "0")


def _contract_pair_edges(edges):
    """Batch-local union-find CONTRACTION of a pair edge set: each task
    collapses its batch's pairs into (member, local_root) star edges —
    a clique of n docs (n·(n-1)/2 verified pairs, the near-dup shape)
    shrinks to n-1 edges before ANY shuffle. Connected components of
    the contracted graph equal those of the original (local roots stay
    connected to every member; cross-batch links survive through
    shared vertices), so min-label propagation downstream is
    unchanged — it just runs on a vertex-count-sized edge set instead
    of a pair-count-sized one. At crawl dup rates this is the
    difference between shuffling ~10M pair rows per round and ~1M.
    Expects/emits (_from, _to) string columns."""

    def contract(batch: pa.Table) -> pa.Table:
        a = batch.column("_from").to_pylist()
        b = batch.column("_to").to_pylist()
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a, b):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        out_f, out_t = [], []
        for x in parent:
            r = find(x)
            if r != x:
                out_f.append(x)
                out_t.append(r)
        return pa.table({"_from": pa.array(out_f, pa.string()),
                         "_to": pa.array(out_t, pa.string())})

    return edges.map_batches(contract, batch_format="pyarrow")


def _dedup_drop_distributed(ds, vp, id_col: str, cc_iters: int):
    """Survivor filter with NOTHING driver-sized (VERDICT r2 #2):
    verified pairs → min-label connected components (edge-sized
    shuffles) → drop set = members that are not their component min →
    one hash-partitioned left-outer join + null filter anti-joins the
    corpus against it. The drop set stays a Dataset end-to-end — the
    100 TB route where even the verified-duplicate inventory outgrows
    the driver; the broadcast path (default) is faster while it fits."""
    import pyarrow.compute as pc

    from .graph import connected_components
    from .relational import (_join_partitions, coerce_schema,
                             compact_nonempty, shuffle_join)

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"_from": _padded_id(batch.column("id_a")),
                         "_to": _padded_id(batch.column("id_b"))})

    comp = connected_components(
        _contract_pair_edges(
            vp.map_batches(to_edges, batch_format="pyarrow")),
        iters=cc_iters)
    comp = compact_nonempty(coerce_schema(comp, pa.schema(
        [("vertex", pa.string()), ("component", pa.string())]
    )).materialize())
    if comp is None:
        return ds

    def drops(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("vertex"),
                                      batch.column("component")))
        return pa.table({"__drop_v": t.column("vertex"),
                         "__dup": pa.array(np.ones(t.num_rows),
                                           pa.float64())})

    drop = compact_nonempty(coerce_schema(
        comp.map_batches(drops, batch_format="pyarrow"),
        pa.schema([("__drop_v", pa.string()), ("__dup", pa.float64())]),
    ).materialize())
    if drop is None:
        return ds

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column("__v", _padded_id(batch.column(id_col)))

    joined = shuffle_join(
        ds.map_batches(tag, batch_format="pyarrow"), drop,
        on="__v", right_on="__drop_v", how="left_outer",
        num_partitions=_join_partitions(),
    )

    keep_cols = list(ds.schema().names)

    def survivors(batch: pa.Table) -> pa.Table:
        if "__dup" not in batch.schema.names:
            # all-empty join side loses its columns (schema-repair rule)
            return batch.select(
                [c for c in keep_cols if c in batch.schema.names])
        return batch.filter(pc.is_null(batch.column("__dup"))) \
            .select(keep_cols)

    return joined.map_batches(survivors, batch_format="pyarrow")


def minhash_dedup(
    ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: str = "char",
    num_buckets: int | None = None,
    drop_strategy: str = "auto",
    cc_iters: int = 3,
    group_col: str | None = None,
    auto_max_pairs: int | None = None,
):
    """Full near-dedup: LSH candidates → in-cluster exact Jaccard verify
    (:func:`minhash_verified_pairs`) → duplicate clusters → survivors
    (min id per cluster).

    ``drop_strategy`` picks the cluster/filter backend; all produce
    identical survivor sets (equivalence pinned by
    ``tests/test_dedup.py::test_minhash_dedup_strategies_equivalent``):

    - ``"auto"`` (default): the verified-pair Dataset is materialized
      in the object store and COUNTED in-cluster; at or under
      ``auto_max_pairs`` (default: the memory-derived
      :func:`auto_broadcast_max_pairs`, logged at decision time) the
      broadcast path runs, past it the distributed path runs — the
      data AND the machine decide, so a heavily-duplicated crawl can
      never silently pull a pair inventory the driver heap can't hold.
    - ``"broadcast"``: verified pairs are collected for a driver
      union-find, the drop set comes back as one ``pc.is_in``
      broadcast filter — one corpus pass, no corpus shuffle. Right
      while the verified-duplicate inventory fits the driver.
    - ``"distributed"``: min-label components + anti-join via
      :func:`_dedup_drop_distributed` — nothing driver-sized, ever;
      ``cc_iters`` must cover the duplicate component diameter
      (verified clusters are near-cliques: 1-2 in practice; the
      driver path has no such bound).
    """
    import pyarrow.compute as pc

    from raygraph.errors import InvalidParameterError

    if drop_strategy not in ("auto", "broadcast", "distributed"):
        raise InvalidParameterError(
            "drop_strategy must be auto|broadcast|distributed, got "
            f"{drop_strategy!r}")
    vp = minhash_verified_pairs(ds, threshold, num_perm, bands,
                                text_col, id_col, shingle,
                                num_buckets=num_buckets,
                                group_col=group_col)
    if vp is None:
        return ds
    if drop_strategy == "auto":
        # count in-cluster (pairs stay in the object store; one
        # materialize serves both the count and whichever path wins)
        vp = vp.materialize()
        bound = (auto_broadcast_max_pairs() if auto_max_pairs is None
                 else auto_max_pairs)
        n_pairs = vp.count()
        drop_strategy = ("distributed" if n_pairs > bound
                         else "broadcast")
        import logging

        logging.getLogger(__name__).info(
            "near-dedup auto: %d verified pairs vs memory-derived "
            "bound %d -> %s", n_pairs, bound, drop_strategy)
    if drop_strategy == "distributed":
        return _dedup_drop_distributed(ds, vp, id_col, cc_iters)
    verified = vp.take_all()
    if not verified:
        return ds

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in verified:
        ra, rb = find(c["id_a"]), find(c["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    drop = sorted(x for x in parent if find(x) != x)
    if not drop:
        return ds
    drop_arr = pa.array(drop)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column(id_col), value_set=drop_arr))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def _prune_band_index(index_dir: str, epochs: list[str], delta_bands,
                      files_fn):
    """Bloom-guard for the LSH band index: drop delta band rows whose
    (band_id, band_hash) key cannot exist in any epoch (they can
    nominate no candidate) and restrict the index read to the
    ``bucket=B`` dirs the surviving rows hash into. Returns
    ``(band_files, pruned_delta_bands, fast_candidates)``:
    ``fast_candidates`` (an Arrow (id, rep_id) table) is non-None when
    the positive rows fit the driver and every epoch is guarded — the
    candidates were then resolved by one parallel hash-join task per
    touched (epoch, bucket) and the caller skips the Dataset band join
    entirely. v1 epochs (no ``_bands_bloom.json``) keep every delta
    row and contribute all their band files — mixed indexes stay
    exact; recall is untouched because a bloom NEGATIVE is definite
    absence."""
    import ray

    from raygraph import stateio
    from raygraph.ops.graph import _repaired

    from .relational import dataset_arrow_schema

    metas = []
    for e in epochs:
        p = stateio.join(index_dir, e, "_bands_bloom.json")
        metas.append(stateio.read_json(p) if stateio.exists(p)
                     else None)
    blooms, metas = _decode_bloom_metas(metas)
    if all(m is None for m in metas):
        return files_fn("bands"), delta_bands, None

    bloom_ref = ray.put(blooms)
    nb_per_epoch = [None if m is None else int(m["n_buckets"])
                    for m in metas]
    has_v1 = any(m is None for m in metas)

    def classify(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bl = _ray.get(bloom_ref)
        h1, h2 = _band_key_u64(batch)
        possible = np.full(len(h1), has_v1)
        for ei, nb in enumerate(nb_per_epoch):
            if nb is None:
                continue
            bucket = (h1 % np.uint64(nb)).astype(np.int64)
            for b in np.unique(bucket):
                spec = bl.get((ei, str(b)))
                if spec is None:
                    continue
                idx = bucket == b
                possible[idx] |= _bloom_test(spec[1], spec[0],
                                             h1[idx], h2[idx])
        return batch.append_column("__possible",
                                   pa.array(possible, pa.bool_()))

    schema = dataset_arrow_schema(delta_bands)
    tagged = delta_bands.map_batches(
        classify, batch_format="pyarrow").materialize()

    def keep_possible(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(batch.column("__possible")) \
            .drop_columns(["__possible"])

    pos = _repaired(tagged.map_batches(keep_possible,
                                       batch_format="pyarrow"), schema)
    n_pos = pos.count()
    if n_pos == 0:
        return ([f for ei, e in enumerate(epochs) if metas[ei] is None
                 for f in _nested_data_files(
                     stateio.join(index_dir, e, "bands"))],
                pos, None)

    import logging

    pos_bound = _pos_broadcast_max()
    logging.getLogger(__name__).info(
        "band-index guard: %d bloom-positive band rows (bound %d, "
        "v1 epochs: %s)", n_pos, pos_bound, has_v1)
    if n_pos <= pos_bound and not has_v1:
        # fast path (mirrors the exact index): the positive band rows
        # fit the driver, so resolve candidates with one parallel
        # hash-join task per touched (epoch, bucket) — each reads only
        # its bucket's band files against the driver-supplied subset —
        # and skip the Dataset band join entirely
        id_col = [n for n in schema.names
                  if n not in ("band_id", "band_hash")][0]
        pos_tab = pa.concat_tables(
            [t for t in ray.get(pos.to_arrow_refs()) if t.num_rows])
        h1, _ = _band_key_u64(pos_tab)

        @ray.remote
        def bucket_join(files: list[str], sub: pa.Table):
            import pandas as _pd

            idx = pa.concat_tables(
                [stateio.pq_read_table(
                    f, columns=["band_id", "band_hash", "rep_id"])
                 for f in files]).to_pandas()
            j = sub.to_pandas().merge(idx, on=["band_id", "band_hash"])
            return pa.Table.from_pandas(
                j[[id_col, "rep_id"]].drop_duplicates(),
                preserve_index=False)

        refs = []
        for ei, nb in enumerate(nb_per_epoch):
            bucket = (h1 % np.uint64(nb)).astype(np.int64)
            d = stateio.join(index_dir, epochs[ei], "bands")
            for b in np.unique(bucket):
                files = stateio.data_files(
                    stateio.join(d, f"bucket={b}"))
                if files:
                    refs.append(bucket_join.remote(
                        files, pos_tab.filter(
                            pa.array(bucket == b))))
        pairs = [ray.get(r) for r in refs]
        pairs = [t for t in pairs if t.num_rows]
        if not pairs:
            idt = pos_tab.schema.field(id_col).type
            cand = pa.table({id_col: pa.array([], idt),
                             "rep_id": pa.array([], idt)})
        else:
            cand = pa.concat_tables(pairs)
            cand = pa.Table.from_pandas(
                cand.to_pandas().drop_duplicates(),
                preserve_index=False)
        return [], pos, cand

    def hit_rows(batch: pa.Table) -> pa.Table:
        h1, _ = _band_key_u64(batch)
        eis, bks = [], []
        for ei, nb in enumerate(nb_per_epoch):
            if nb is None:
                continue
            u = np.unique(h1 % np.uint64(nb)).astype(np.int64)
            bks.extend(u.tolist())
            eis.extend([ei] * len(u))
        return pa.table({"ei": pa.array(eis, pa.int32()),
                         "bucket": pa.array(bks, pa.int64())})

    hits = pos.map_batches(hit_rows, batch_format="pyarrow") \
        .to_pandas().drop_duplicates()
    touched = set(zip(hits["ei"].astype(int),
                      hits["bucket"].astype(int)))
    band_files: list[str] = []
    for ei, e in enumerate(epochs):
        d = stateio.join(index_dir, e, "bands")
        if metas[ei] is None:
            band_files += _nested_data_files(d)
            continue
        for name in stateio.listdir(d):
            if name.startswith("bucket=") and \
                    (ei, int(name.split("=", 1)[1])) in touched:
                band_files += stateio.data_files(stateio.join(d, name))
    return band_files, pos, None


def _write_band_index(surv_bands, tmp: str, n_band_rows: int) -> None:
    """Stage the bands side of a near-dup epoch bucketed by the band
    key, build per-bucket blooms, and drop ``_bands_bloom.json`` into
    the staging dir (committed atomically with the epoch)."""
    from raygraph import stateio

    n_buckets = _epoch_bucket_count(n_band_rows)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h1, _ = _band_key_u64(batch)
        return batch.append_column(
            "bucket", pa.array((h1 % np.uint64(n_buckets))
                               .astype(np.int64), pa.int64()))

    stateio.ray_write_parquet(
        surv_bands.map_batches(add_bucket, batch_format="pyarrow"),
        stateio.join(tmp, "bands"), partition_cols=["bucket"])
    meta = {"version": 2, "n_buckets": n_buckets, "k": BLOOM_K,
            "bits_per_key": BLOOM_BITS_PER_KEY,
            "buckets": _build_dir_blooms(
                stateio.join(tmp, "bands"),
                ["band_id", "band_hash"], _band_key_u64)}
    stateio.write_json_atomic(
        stateio.join(tmp, "_bands_bloom.json"), meta)


def _write_reps_index(rep_rows_ds, tmp: str, n_reps: int) -> None:
    """Stage the reps side of a near-dup epoch bucketed by the stable
    rep-id hash (``_reps_meta.json`` records the bucket count), so an
    increment whose candidates are driver-held reads only the bucket
    dirs its candidate rep_ids land in instead of every rep."""
    from raygraph import stateio

    n_buckets = _epoch_bucket_count(n_reps)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = _id_key_u64(batch.column("rep_id"))
        return batch.append_column(
            "bucket", pa.array((k % np.uint64(n_buckets))
                               .astype(np.int64), pa.int64()))

    stateio.ray_write_parquet(
        rep_rows_ds.map_batches(add_bucket, batch_format="pyarrow"),
        stateio.join(tmp, "reps"), partition_cols=["bucket"])
    stateio.write_json_atomic(stateio.join(tmp, "_reps_meta.json"),
                              {"version": 2, "n_buckets": n_buckets})


def _prune_reps_files(index_dir: str, epochs: list[str],
                      cand_rep_ids, files_fn) -> list[str]:
    """Reps files needed to verify the given candidate rep ids:
    bucketed (v2) epochs contribute only the bucket dirs those ids
    hash into; v1 epochs contribute all their files. ``cand_rep_ids``
    None (candidates not driver-held) reads everything."""
    from raygraph import stateio

    if cand_rep_ids is None:
        return files_fn("reps")
    out: list[str] = []
    keys = None
    for e in epochs:
        mp = stateio.join(index_dir, e, "_reps_meta.json")
        d = stateio.join(index_dir, e, "reps")
        if not stateio.exists(mp):
            if stateio.isdir(d):
                out += _nested_data_files(d)
            continue
        nb = int(stateio.read_json(mp)["n_buckets"])
        if keys is None:
            keys = _id_key_u64(cand_rep_ids)
        for b in np.unique((keys % np.uint64(nb)).astype(np.int64)):
            out += stateio.data_files(stateio.join(d, f"bucket={b}"))
    return out


def compact_dedup_index(index_dir: str) -> dict:
    """Merge every epoch of an incremental-dedup index into ONE — the
    offline maintenance pass that keeps epoch counts bounded without
    touching the ingest path. Handles both layouts: exact
    (:func:`exact_dedup_incremental`, flat ``content_hash`` files) and
    near (:func:`minhash_dedup_incremental`, ``bands/`` + ``reps/``).

    Crash-safe BY SET SEMANTICS, not locking: the index is a set — a
    hash or band row present twice drops the same docs — so the commit
    order (write compacted tmp → rename it in as the NEXT epoch →
    delete the originals) leaves every crash window correct, merely
    uncompacted or temporarily duplicated. Re-running converges to a
    single epoch. IO routes through :mod:`raygraph.stateio` — the
    index may live on shared/object storage.
    """
    from raygraph import stateio
    from raygraph.ops.graph import _repaired

    from .relational import dataset_arrow_schema, hash_aggregate

    epochs = stateio.committed_dirs(index_dir, "epoch-")
    if len(epochs) <= 1:
        return {"epochs_in": len(epochs), "compacted": False}

    near = any(stateio.isdir(stateio.join(index_dir, e, "bands"))
               for e in epochs)

    def files(sub=None):
        out = []
        for e in epochs:
            if sub is None:
                out += _exact_epoch_files(index_dir, e)
                continue
            d = stateio.join(index_dir, e, sub)
            if stateio.isdir(d):
                out += _nested_data_files(d)
        return out

    def distinct(ds, keys, schema):
        # subset= on the keys: signature reps carry a LIST column,
        # which full-row drop_duplicates cannot hash
        return _repaired(
            hash_aggregate(
                ds, keys,
                lambda df: df.drop_duplicates(subset=keys)),
            schema)

    epoch = int(epochs[-1].split("-")[1]) + 1
    tmp = stateio.join(index_dir, f"_tmp-{epoch:05d}")
    final = stateio.join(index_dir, f"epoch-{epoch:05d}")
    stateio.rmtree(tmp)
    if near:
        bf, rf = files("bands"), files("reps")
        stateio.makedirs(stateio.join(tmp, "bands"))
        stateio.makedirs(stateio.join(tmp, "reps"))
        if bf:
            b = stateio.ray_read_parquet(
                bf, columns=["band_id", "band_hash", "rep_id"])
            sch = pa.schema([("band_id", pa.int32()),
                             ("band_hash", pa.int64()),
                             ("rep_id", dataset_arrow_schema(b)
                              .field("rep_id").type)])
            # compacted bands land bucketed + bloomed (the v1→v2
            # migration path, same as the exact layout)
            _write_band_index(
                distinct(b, ["band_id", "band_hash", "rep_id"], sch),
                tmp,
                n_band_rows=sum(stateio.pq_read_metadata(f).num_rows
                                for f in bf))
        if rf:
            r = stateio.ray_read_parquet(rf)
            # reps carry (rep_id, text) in text-verify indexes and
            # (rep_id, sig) in signature ones — take the schema as-is.
            # Read dropping any 'bucket' partition column so the
            # compacted rows re-bucket cleanly.
            sch = dataset_arrow_schema(r)
            if "bucket" in sch.names:
                keep = [n for n in sch.names if n != "bucket"]
                r = r.select_columns(keep)
                sch = pa.schema([sch.field(n) for n in keep])
            _write_reps_index(
                distinct(r, ["rep_id"], sch), tmp,
                n_reps=sum(stateio.pq_read_metadata(f).num_rows
                           for f in rf))
        stateio.commit_dir(tmp, final)
    else:
        hf = files()
        if hf:
            # compacted exact epochs land in the v2 bucketed+bloom
            # layout (regardless of input layout) — compaction is also
            # the v1→v2 migration path
            _write_exact_epoch(
                distinct(stateio.ray_read_parquet(
                    hf, columns=["content_hash"]),
                    ["content_hash"],
                    pa.schema([("content_hash", pa.string())])),
                index_dir, epoch,
                # metadata-only row estimate (pre-distinct upper
                # bound) — only sizes the bucket count
                n_rows=sum(stateio.pq_read_metadata(f).num_rows
                           for f in hf))
        else:
            stateio.makedirs(tmp)
            stateio.commit_dir(tmp, final)
    for e in epochs:
        stateio.rmtree(stateio.join(index_dir, e))
    return {"epochs_in": len(epochs), "compacted": True,
            "epoch": epoch, "layout": "near" if near else "exact"}


def minhash_dedup_incremental(delta, index_dir: str,
                              threshold: float = 0.8,
                              num_perm: int = 64, bands: int = 16,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              shingle: str = "char",
                              num_buckets: int | None = None,
                              drop_strategy: str = "auto",
                              verify: str = "text"):
    """Incremental NEAR-dup dedup — the production crawl pattern: a
    delta corpus is deduped against a PERSISTED LSH band index (and
    then within itself via :func:`minhash_dedup`) without rescanning
    the base corpus. Same verify discipline as the batch op: band
    collision only nominates a (delta doc, index rep) candidate; the
    drop requires exact shingle-set Jaccard >= ``threshold`` against
    the rep's text, so banding parameters tune recall, never
    precision.

    Index layout: ``<index_dir>/epoch-NNNNN/{bands,reps}/`` — ``bands``
    holds (band_id, band_hash, rep_id) rows, ``reps`` holds
    (rep_id, text) for the verify join. Epochs are append-only and the
    commit is atomic (tmp + rename); re-running a delta converges
    (every doc now collides with its own committed rep at Jaccard 1).

    Scale shape: delta bands join the index bands on the
    (band_id, band_hash) key — both sides shuffled, nothing broadcast;
    candidate texts attach via two id-keyed co-group joins (only
    candidate rows carry text); the verified drop set anti-joins the
    delta. Per increment the exchanged volume is delta-sized plus the
    candidate rows, never index-sized. Returns ``(survivors, epoch)``
    with survivors keeping ALL delta columns. Reference analogs:
    bounded co-bucketed comparison (arangors-graph-exporter
    src/graph_loader.rs:394-462), resumable shard checkpoints
    (src/graph_loader.rs:193-206).
    """
    from raygraph.ops.graph import _repaired
    from raygraph.errors import InvalidParameterError

    from .relational import (cogroup_join, dataset_arrow_schema,
                             hash_aggregate)

    if verify not in ("text", "signature"):
        raise InvalidParameterError("verify must be text|signature")
    _check_bands(num_perm, bands)
    hasher = MinHasher(num_perm=num_perm, shingle=shingle)
    id_type = dataset_arrow_schema(delta).field(id_col).type
    if pa.types.is_integer(id_type):
        id_type = pa.int64()

    from raygraph import stateio

    stateio.makedirs(index_dir)
    # the banding/verify parameters are part of the INDEX, not the
    # call: epochs written under different parameters would silently
    # stop colliding — pin them on first use, reject mismatches
    meta_path = stateio.join(index_dir, "_meta.json")
    meta = {"verify": verify, "num_perm": num_perm, "bands": bands,
            "shingle": shingle}
    if stateio.exists(meta_path):
        have = stateio.read_json(meta_path)
        if have != meta:
            raise InvalidParameterError(
                f"index {index_dir} was built with {have}, "
                f"called with {meta}")
    else:
        stateio.write_json_atomic(meta_path, meta)
    epochs = stateio.committed_dirs(index_dir, "epoch-")

    def files(sub):
        out = []
        for e in epochs:
            d = stateio.join(index_dir, e, sub)
            if stateio.isdir(d):
                out += _nested_data_files(d)
        return out

    def band_rows(batch: pa.Table) -> pa.Table:
        return minhash_bands(batch, hasher, bands, text_col, id_col)

    # the delta fans out to FOUR consumers (band rows for the index
    # join, the text/signature attach, the verified anti-join, the
    # within-delta dedup) — pin it once; and size every exchange to
    # the MEASURED delta instead of the legacy 128-bucket default (a
    # small daily increment was paying ~20 s of empty bucket tasks
    # across the six wide ops of an epoch)
    delta = delta.materialize()
    nb = num_buckets or lsh_num_buckets(delta.count(), bands)
    remaining = delta
    delta_bands = delta.map_batches(band_rows, batch_format="pyarrow")
    fast_cand = None
    if epochs:
        band_files, delta_bands, fast_cand = _prune_band_index(
            index_dir, epochs, delta_bands, files)
    else:
        band_files = []
    cand = None
    if fast_cand is not None:
        import ray.data as _rd

        if fast_cand.num_rows:
            cand = _repaired(
                _rd.from_arrow(fast_cand),
                pa.schema([(id_col, id_type), ("rep_id", id_type)]))
    elif band_files:
        idx_bands = stateio.ray_read_parquet(
            band_files, columns=["band_id", "band_hash", "rep_id"])
        cand = _repaired(
            hash_aggregate(
                cogroup_join(
                    delta_bands,
                    idx_bands, on=["band_id", "band_hash"],
                    how="inner", num_buckets=nb)
                .map_batches(lambda b: b.select([id_col, "rep_id"]),
                             batch_format="pyarrow"),
                [id_col, "rep_id"], lambda df: df.drop_duplicates(),
                num_buckets=nb),
            pa.schema([(id_col, id_type), ("rep_id", id_type)]))
    if cand is not None:
        if cand.count():
            if verify == "text":
                def dside(batch: pa.Table) -> pa.Table:
                    return pa.table({
                        id_col: batch.column(id_col).cast(id_type),
                        "__text_d": batch.column(text_col)
                        .cast(pa.string())})

                def rside(batch: pa.Table) -> pa.Table:
                    return pa.table({
                        "rep_id": batch.column("rep_id").cast(id_type),
                        "__text_r": batch.column("text")
                        .cast(pa.string())})

                d_field = ("__text_d", pa.string())
            else:
                # signature mode: the verify joins carry num_perm
                # int64s per row instead of the document text — the
                # storage-light 100-TB path; precision becomes the
                # minhash ESTIMATE of Jaccard (matching slots /
                # num_perm), not the exact shingle-set value
                def dside(batch: pa.Table) -> pa.Table:
                    texts = batch.column(text_col).to_pylist()
                    sigs = hasher.signatures(texts).astype("int64")
                    return pa.table({
                        id_col: batch.column(id_col).cast(id_type),
                        "__sig_d": pa.array(list(sigs),
                                            pa.list_(pa.int64()))})

                def rside(batch: pa.Table) -> pa.Table:
                    return pa.table({
                        "rep_id": batch.column("rep_id").cast(id_type),
                        "__sig_r": batch.column("sig")})

                d_field = ("__sig_d", pa.list_(pa.int64()))

            j = cogroup_join(cand,
                             delta.map_batches(dside,
                                               batch_format="pyarrow"),
                             on=id_col, num_buckets=nb)
            rep_files = _prune_reps_files(
                index_dir, epochs,
                fast_cand.column("rep_id") if fast_cand is not None
                else None, files)
            rtx = stateio.ray_read_parquet(rep_files or files("reps"))
            j = cogroup_join(
                _repaired(j, pa.schema([
                    (id_col, id_type), ("rep_id", id_type), d_field])),
                rtx.map_batches(rside, batch_format="pyarrow"),
                on="rep_id", num_buckets=nb)

            drop_schema = pa.schema([(id_col, id_type)])

            def verify_text(batch: pa.Table) -> pa.Table:
                if "__text_d" not in batch.schema.names:
                    return drop_schema.empty_table()
                td = batch.column("__text_d").to_pylist()
                tr = batch.column("__text_r").to_pylist()
                cache: dict = {}

                def sh(t):
                    t = t or ""
                    got = cache.get(t)
                    if got is None:
                        got = cache[t] = set(
                            hasher.shingle_hashes(t).tolist())
                    return got

                pair_cache: dict = {}  # memo per DISTINCT text pair

                def ok(a, b):
                    got = pair_cache.get((a, b))
                    if got is None:
                        got = pair_cache[(a, b)] = \
                            jaccard(sh(a), sh(b)) >= threshold
                    return got

                keep = [ok(a, b) for a, b in zip(td, tr)]
                return batch.filter(pa.array(keep, pa.bool_())) \
                    .select([id_col])

            def verify_sig(batch: pa.Table) -> pa.Table:
                if "__sig_d" not in batch.schema.names:
                    return drop_schema.empty_table()
                if batch.num_rows == 0:
                    return drop_schema.empty_table()
                a = np.vstack(batch.column("__sig_d")
                              .to_pandas().to_numpy())
                b = np.vstack(batch.column("__sig_r")
                              .to_pandas().to_numpy())
                matches = (a == b).sum(axis=1)
                keep = matches >= threshold * num_perm
                return batch.filter(pa.array(keep)).select([id_col])

            vfn = verify_text if verify == "text" else verify_sig
            dropped = _repaired(
                hash_aggregate(
                    j.map_batches(vfn, batch_format="pyarrow"),
                    [id_col], lambda df: df.drop_duplicates(),
                    num_buckets=nb),
                drop_schema)
            if dropped.count():
                remaining = cogroup_join(delta, dropped, on=id_col,
                                         how="left_anti",
                                         num_buckets=nb)

    surv = minhash_dedup(remaining, threshold, num_perm, bands,
                         text_col, id_col, shingle,
                         num_buckets=nb,
                         drop_strategy=drop_strategy).materialize()

    epoch = int(epochs[-1].split("-")[1]) + 1 if epochs else 0
    tmp = stateio.join(index_dir, f"_tmp-{epoch:05d}")
    final = stateio.join(index_dir, f"epoch-{epoch:05d}")
    stateio.rmtree(tmp)
    stateio.makedirs(stateio.join(tmp, "bands"))
    stateio.makedirs(stateio.join(tmp, "reps"))
    _write_band_index(
        surv.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(lambda b: pa.table({
            "band_id": b.column("band_id"),
            "band_hash": b.column("band_hash"),
            "rep_id": b.column(id_col).cast(id_type)}),
            batch_format="pyarrow"),
        tmp, n_band_rows=surv.count() * bands)

    if verify == "text":
        def rep_rows(batch: pa.Table) -> pa.Table:
            return pa.table({
                "rep_id": batch.column(id_col).cast(id_type),
                "text": batch.column(text_col).cast(pa.string())})
    else:
        def rep_rows(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            sigs = hasher.signatures(texts).astype("int64")
            return pa.table({
                "rep_id": batch.column(id_col).cast(id_type),
                "sig": pa.array(list(sigs), pa.list_(pa.int64()))})

    _write_reps_index(surv.map_batches(rep_rows,
                                       batch_format="pyarrow"),
                      tmp, n_reps=surv.count())
    stateio.commit_dir(tmp, final)

    return surv, epoch


_CLUSTER_PAD = 12  # zero-pad width: lexicographic min == numeric min


def near_dup_clusters(
    ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: str = "char",
    cc_iters: int = 3,
    num_buckets: int | None = None,
    group_col: str | None = None,
):
    """Duplicate-CLUSTER assignment: every document gets the min doc id
    of its verified near-dup connected component (singletons map to
    themselves) — the cluster inventory a curation pipeline keeps,
    where :func:`minhash_dedup` keeps only survivors.

    Fully distributed: verified pairs (:func:`minhash_verified_pairs`)
    become an edge set; components run as min-label propagation
    (:func:`raygraph.ops.graph.connected_components` — one edge-sized
    shuffle join per round, nothing pair- or corpus-sized on the
    driver); docs pick up their label via one left-outer hash join.
    Ids are zero-padded to ``_CLUSTER_PAD`` digits for the string-typed
    label propagation (lexicographic min == numeric min), so ids must
    be non-negative and < 10^12. ``cc_iters`` must cover the duplicate
    component diameter (verified clusters are near-cliques: diameter
    1-2 in practice)."""
    import pyarrow.compute as pc

    from .relational import (_join_partitions, coerce_schema,
                             compact_nonempty, shuffle_join)

    ids_only = ds.select_columns([id_col])
    vp = minhash_verified_pairs(ds, threshold, num_perm, bands,
                                text_col, id_col, shingle,
                                num_buckets=num_buckets,
                                group_col=group_col)

    def self_clusters(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(id_col),
                         "cluster_id": pc.cast(batch.column(id_col),
                                               pa.int64())})

    if vp is None:
        return ids_only.map_batches(self_clusters, batch_format="pyarrow")

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"_from": _padded_id(batch.column("id_a")),
                         "_to": _padded_id(batch.column("id_b"))})

    from .graph import connected_components

    comp = connected_components(
        _contract_pair_edges(
            vp.map_batches(to_edges, batch_format="pyarrow")),
        iters=cc_iters)
    comp = compact_nonempty(coerce_schema(comp, pa.schema(
        [("vertex", pa.string()), ("component", pa.string())]
    )).materialize())
    if comp is None:
        return ids_only.map_batches(self_clusters, batch_format="pyarrow")

    def pad_ids(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(id_col),
                         "vertex": _padded_id(batch.column(id_col))})

    joined = shuffle_join(
        ids_only.map_batches(pad_ids, batch_format="pyarrow"), comp,
        on="vertex", how="left_outer",
        num_partitions=_join_partitions(),
    )

    def finish(batch: pa.Table) -> pa.Table:
        if "component" not in batch.schema.names:
            return pa.schema([(id_col, pa.int64()),
                              ("cluster_id", pa.int64())]).empty_table()
        lab = pc.if_else(pc.is_null(batch.column("component")),
                         batch.column("vertex"), batch.column("component"))
        return pa.table({id_col: pc.cast(batch.column(id_col), pa.int64()),
                         "cluster_id": pc.cast(lab, pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow")


def jaccard_threshold_pairs(ds, threshold_bp: int = 8000,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            num_buckets: int | None = None):
    """AllPairs-style prefix-filtered set-similarity self-join: every
    pair of docs whose distinct-token Jaccard ≥ threshold_bp/10⁴, as
    (id_a, id_b, jaccard_bp) — exact (no LSH recall loss).

    Prefix filter (Chaudhuri/Bayardo): under ANY global total order on
    tokens, two sets with Jaccard ≥ t must share a token inside each
    set's first ``|x| - ceil(t·|x|) + 1`` tokens — so candidates are
    pairs sharing a PREFIX token (one token-keyed exchange of prefix
    rows, ~(1-t)·corpus tokens, never all-pairs). This implementation
    orders tokens by (md5(token), token): join-free and
    SQL-replayable; production rare-first df-ascending order shrinks
    candidate buckets further at the cost of a global df aggregate +
    join — same correctness either way. Verification attaches both
    texts via :func:`attach_pair_texts` (two hash-partitioned joins,
    in-cluster) and computes exact integer jaccard_bp =
    (10⁴·|∩|) // |∪|. Degenerate prefix-token buckets are bounded by
    ``BUCKET_PAIR_CAP`` with logged drops.
    """
    import hashlib

    from .relational import hash_aggregate

    def prefix_rows(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas()
        toks = s.str.strip().str.lower().str.split()
        ex = toks.explode().dropna()
        if ex.empty:
            return pa.table({"token": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64())})
        df = pd.DataFrame({"i": ex.index, "token": ex.to_numpy()}) \
            .drop_duplicates()
        uniq = pd.unique(df["token"])
        h = {t: hashlib.md5(t.encode("utf-8")).hexdigest() for t in uniq}
        df["h"] = df["token"].map(h)
        df = df.sort_values(["i", "h", "token"], kind="mergesort")
        df["rn"] = df.groupby("i").cumcount()
        c = df.groupby("i")["token"].transform("size")
        p = c - (threshold_bp * c + 9_999) // 10_000 + 1
        pref = df[df["rn"] < p]
        return pa.table({
            "token": pa.array(pref["token"].to_numpy(), pa.string()),
            id_col: pa.array(ids.loc[pref["i"]].to_numpy()),
        })

    def bucket_pairs_many(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized _bucket_pairs: (token, id) rows repeat across
        # batches, so distinct FIRST (cap must count distinct ids),
        # then cap on ascending ids and ONE self-merge per reduce call
        # instead of a Python loop per token group
        df = df.drop_duplicates(["token", id_col])
        sizes = df.groupby("token")[id_col].transform("size")
        df = df[sizes >= 2]
        if df.empty:
            dt = df[id_col].dtype
            return pd.DataFrame({"id_a": pd.Series([], dtype=dt),
                                 "id_b": pd.Series([], dtype=dt)})
        df = df.sort_values(["token", id_col], kind="mergesort")
        df = df[df.groupby("token").cumcount() < BUCKET_PAIR_CAP]
        m = df.merge(df, on="token", suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        return pd.DataFrame({
            "id_a": m[f"{id_col}_l"].to_numpy(),
            "id_b": m[f"{id_col}_r"].to_numpy()}).drop_duplicates()

    nb = num_buckets or 128
    pairs = hash_aggregate(
        ds.map_batches(prefix_rows, batch_format="pyarrow"),
        ["token"], bucket_pairs_many, num_buckets=nb)
    cand = hash_aggregate(pairs, ["id_a", "id_b"],
                          lambda df: df.drop_duplicates(),
                          num_buckets=max(8, nb // 4))

    j, id_t = attach_pair_texts(cand, ds, text_col, id_col)
    out_schema = pa.schema([("id_a", id_t or pa.int64()),
                            ("id_b", id_t or pa.int64()),
                            ("jaccard_bp", pa.int64())])
    if j is None:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    def verify(batch: pa.Table) -> pa.Table:
        if "__text_a" not in batch.schema.names:
            return out_schema.empty_table()
        cache: dict = {}

        def tokset(t):
            t = t or ""
            got = cache.get(t)
            if got is None:
                got = cache[t] = set(t.strip().lower().split())
            return got

        ta = batch.column("__text_a").to_pylist()
        tb = batch.column("__text_b").to_pylist()
        pair_cache: dict = {}  # one intersection per DISTINCT pair
        bp, keep = [], []
        for a, b in zip(ta, tb):
            v = pair_cache.get((a, b))
            if v is None:
                sa, sb = tokset(a), tokset(b)
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                v = (10_000 * inter) // union if union else 0
                pair_cache[(a, b)] = v
            ok = v >= threshold_bp
            keep.append(ok)
            if ok:
                bp.append(v)
        out = batch.filter(pa.array(keep, pa.bool_())) \
            .select(["id_a", "id_b"])
        return out.append_column("jaccard_bp", pa.array(bp, pa.int64()))

    return j.map_batches(verify, batch_format="pyarrow")


# ----------------------------------------------------------------- SimHash
SIMHASH_BITS = 60  # 60-bit md5 token hashes — SQL-computable (oracle parity)


def simhash64(tokens: list[str]) -> int:
    """Classic simhash over token hashes (60 bits: the token hash is the
    first 60 bits of md5 — ``text.token_hash60`` — so a DuckDB oracle can
    recompute the signature bit-for-bit)."""
    from .text import token_hash60

    if not tokens:
        return 0
    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    for t in tokens:
        h = np.uint64(token_hash60(t))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(SIMHASH_BITS):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Vectorized simhash over whitespace tokens: the md5 token hash runs
    once per UNIQUE token per batch; the ±1 bit accumulation is one
    (tokens × SIMHASH_BITS) numpy pass with per-doc segment sums (no
    per-row Python). Bit-exact with the scalar :func:`simhash64`
    reference (tested)."""
    from .text import token_hash60

    s = batch.column(text_col).to_pandas().fillna("")
    toks = s.str.split()
    lens = toks.str.len().fillna(0).astype("int64").to_numpy()
    n_docs = len(lens)
    total = int(lens.sum())
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    weights = (np.uint64(1) << shifts)
    if total:
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        uhash = np.fromiter((token_hash60(t) for t in uniq),
                            dtype=np.uint64, count=len(uniq))
        th = uhash[inv]
        bits = ((th[:, None] >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        acc = np.add.reduceat(bits, np.minimum(starts, total - 1), axis=0)
        acc[lens == 0] = 0
    else:
        acc = np.zeros((n_docs, SIMHASH_BITS), dtype=np.int64)
    out = ((acc > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    return pa.table({id_col: batch.column(id_col),
                     "simhash": pa.array(out.view(np.int64), pa.int64())})


def simhash_buckets(ds, prefix_bits: int = 16, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Bucket by the top ``prefix_bits`` of the simhash — docs in a bucket
    are near-dup candidates (verify with hamming distance downstream)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = simhash_batch(batch, text_col, id_col)
        v = np.asarray(t.column("simhash").to_numpy(zero_copy_only=False),
                       dtype=np.int64).view(np.uint64)
        bucket = (v >> np.uint64(SIMHASH_BITS - prefix_bits)).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count): one
    byte view + unpackbits pass, no per-element Python."""
    b = np.ascontiguousarray(v.astype(np.uint64)).view(np.uint8)
    return np.unpackbits(b.reshape(-1, 8), axis=1) \
        .sum(axis=1).astype(np.int64)


def simhash_hamming_pairs(ds, max_hamming: int = 3, bands: int = 4,
                          text_col: str = "text", id_col: str = "doc_id",
                          num_buckets: int | None = None):
    """Simhash near-dup similarity join: (id_a, id_b, hamming) for every
    pair whose 60-bit simhash signatures differ in ≤ ``max_hamming``
    bits (requires ``max_hamming < bands`` for exact recall).

    Candidates come from the pigeonhole banding trick: the signature is
    split into ``bands`` equal chunks, and a pair within ``bands - 1``
    differing bits must agree on at least one whole chunk — so
    candidates = docs sharing a (band_id, chunk value), ONE hash-bucketed
    exchange of bands × n rows instead of all-pairs. Verification
    (popcount of xor) runs vectorized inside the same reduce task, so
    only verified pair rows ever leave it; a final vectorized distinct
    collapses pairs caught by several bands. Degenerate chunk buckets
    are bounded by the same ``BUCKET_PAIR_CAP`` coverage discipline as
    :func:`_bucket_pairs`.
    """
    from .relational import hash_aggregate

    width = SIMHASH_BITS // bands
    mask = np.uint64((1 << width) - 1)

    def band_rows(batch: pa.Table) -> pa.Table:
        t = simhash_batch(batch, text_col, id_col)
        sig = np.asarray(t.column("simhash").to_numpy(zero_copy_only=False),
                         dtype=np.int64).view(np.uint64)
        ids = t.column(id_col)
        parts = []
        for b in range(bands):
            chunk = ((sig >> np.uint64(b * width)) & mask).view(np.int64)
            parts.append(pa.table({
                "band_id": pa.array(np.full(len(sig), b, dtype=np.int64)),
                "band_key": pa.array(chunk, pa.int64()),
                id_col: ids,
                "simhash": t.column("simhash"),
            }))
        return pa.concat_tables(parts)

    def verified_pairs(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["band_id", "band_key"])[id_col] \
            .transform("size")
        df = df[sizes >= 2]
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64"),
        })
        if df.empty:
            return empty
        outs = [empty]
        for _, g in df.groupby(["band_id", "band_key"], sort=False):
            g = g.drop_duplicates(id_col).sort_values(id_col)
            if len(g) > BUCKET_PAIR_CAP:
                print(f"simhash_hamming_pairs: bucket overflow, dropping "
                      f"{len(g) - BUCKET_PAIR_CAP} ids "
                      f"(cap={BUCKET_PAIR_CAP})")
                g = g.head(BUCKET_PAIR_CAP)
            ids = g[id_col].to_numpy(dtype=np.int64)
            sig = g["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
            ia, ib = np.triu_indices(len(g), k=1)
            ham = _popcount64(sig[ia] ^ sig[ib])
            keep = ham <= max_hamming
            outs.append(pd.DataFrame({"id_a": ids[ia[keep]],
                                      "id_b": ids[ib[keep]],
                                      "hamming": ham[keep]}))
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    nb = num_buckets or 128
    pairs = hash_aggregate(
        ds.map_batches(band_rows, batch_format="pyarrow"),
        ["band_id", "band_key"], verified_pairs, num_buckets=nb)
    return hash_aggregate(pairs, ["id_a", "id_b"],
                          lambda df: df.drop_duplicates(),
                          num_buckets=max(8, nb // 4))


def simhash_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Simhash-exact dedup: group docs by identical 64-bit simhash, keep
    (min id, group size) per group — one vectorized signature pass + ONE
    groupby with built-in Min/Count aggregates.

    Contract (SQL-oracle-able): simhash is a deterministic function of
    the whitespace-token MULTISET, so groups ≡ token-multiset groups
    (modulo ~n²/2^64 collisions) — the DuckDB oracle groups by the sorted
    token list and must produce identical (doc_id, n_dups) rows.
    """
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = simhash_batch(batch, text_col, id_col)
        df = t.to_pandas().groupby("simhash", as_index=False).agg(
            **{id_col: (id_col, "min"), "__n": (id_col, "size")}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def drop_key(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, "n_dups"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("simhash")
        .aggregate(Min(id_col, alias_name=id_col),
                   Sum("__n", alias_name="n_dups"))
        .map_batches(drop_key, batch_format="pyarrow")
    )


# ----------------------------------------------- embedding cosine near-dup
def embedding_near_dup_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Near-duplicate pairs by embedding cosine: random-hyperplane LSH
    bucket (sign pattern of ``n_planes`` projections) → exact cosine
    within bucket. One groupby; hyperplanes derived from a fixed seed.

    A degenerate bucket (zero vectors, near-dup-heavy corpora) is capped
    at ``BUCKET_PAIR_CAP`` ids — same coverage-bound discipline as
    :func:`_bucket_pairs`: docs beyond the cap (deterministically the
    highest ids) are not paired; raise the cap or ``n_planes`` if real
    data trips it."""
    from .vecops import vectors_to_numpy

    planes_holder: dict = {}

    def add_bucket(batch: pa.Table) -> pa.Table:
        vecs = vectors_to_numpy(batch.column(vec_col), np.float32)
        if "p" not in planes_holder:
            rng = np.random.RandomState(seed)
            planes_holder["p"] = rng.randn(vecs.shape[1], n_planes).astype(np.float32)
        signs = (vecs @ planes_holder["p"]) > 0
        bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(bucket, pa.int64()),
                vec_col: batch.column(vec_col),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > BUCKET_PAIR_CAP:
            n_dropped = len(g) - BUCKET_PAIR_CAP
            print(f"embedding_near_dup_pairs: bucket over cap, dropping "
                  f"{n_dropped} ids (cap={BUCKET_PAIR_CAP})")
            g = g.sort_values(id_col).head(BUCKET_PAIR_CAP)
        ids = g[id_col].to_numpy()
        vecs = np.stack(g[vec_col].to_numpy())
        norms = np.sqrt(np.einsum("ij,ij->i", vecs, vecs))[:, None]
        norms[norms == 0] = 1
        v = vecs / norms
        sims = v @ v.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ia][keep], ids[ib][keep]),
                "id_b": np.maximum(ids[ia][keep], ids[ib][keep]),
                "cosine": np.round(sims[ia, ib][keep].astype("float64"), 6),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def _lev_banded(a: np.ndarray, b: np.ndarray, k: int) -> int:
    """Levenshtein distance of two uint8 code arrays, exact up to ``k``
    (returns k+1 when the true distance exceeds it). Row DP with the
    insert chain folded by a running-min scan, so every row is O(len)
    numpy — no per-cell Python."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la == 0 or lb == 0:
        return max(la, lb)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (b != a[i - 1]))
        cur = np.minimum.accumulate(cur - idx) + idx
        if cur.min() > k:
            return k + 1
        prev = cur
    return int(prev[-1])


def edit_distance_pairs(ds, max_dist: int = 2, prefix: int = 16,
                        window: int = 64, id_col: str = "doc_id",
                        text_col: str = "text", num_buckets: int = 64):
    """Banded edit-distance similarity join: pairs of docs whose texts
    share a ``prefix``-char block AND whose last-``window``-char tails
    are within ``max_dist`` Levenshtein edits (the standard
    prefix-blocking + bounded-verify shape for tail-edit near-dups;
    edits inside the first ``prefix`` chars place the copies in
    different blocks and are out of contract, as is any pair differing
    only beyond the tail window).

    One vectorized projection pass, then ONE prefix-block-bucketed
    shuffle; inside a bucket only blocks with ≥2 members generate
    pairs (vectorized count filter first), capped at
    ``BUCKET_PAIR_CAP`` ids per block with the same logged-drop
    discipline as the LSH pair generators. Verify cost is O(window ·
    max_dist) numpy per candidate pair.
    """
    from .relational import hash_aggregate

    def project(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        return pa.table({
            id_col: batch.column(id_col),
            "pk": pa.array(s.str.slice(0, prefix), pa.string()),
            "tail": pa.array(s.str.slice(-window), pa.string()),
        })

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df["pk"].value_counts()
        df = df[df["pk"].isin(cnt[cnt >= 2].index)]
        out_a, out_b, out_d = [], [], []
        if len(df):
            df = df.sort_values(["pk", id_col], kind="mergesort",
                                ignore_index=True)
            pk = df["pk"].to_numpy()
            ids = df[id_col].to_numpy()
            tails = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                     for t in df["tail"]]
            starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
            ends = np.r_[starts[1:], len(df)]
            for a, b in zip(starts, ends):
                hi = min(b, a + BUCKET_PAIR_CAP)   # logged-drop cap
                for i in range(a, hi):
                    for j in range(i + 1, hi):
                        d = _lev_banded(tails[i], tails[j], max_dist)
                        if d <= max_dist:
                            out_a.append(ids[i])
                            out_b.append(ids[j])
                            out_d.append(d)
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype="int64"),
            "id_b": pd.Series(out_b, dtype="int64"),
            "dist": pd.Series(out_d, dtype="int64"),
        })

    return hash_aggregate(ds.map_batches(project, batch_format="pyarrow"),
                          ["pk"], bucket_pairs, num_buckets=num_buckets)


def sentence_dedup_stats(ds, text_col: str = "text",
                         group_col: str = "source"):
    """Sub-document (sentence-granularity) exact-duplication profile per
    ``group_col``: total sentences, distinct sentences, and the
    duplicated share in basis points.

    The curation move behind it: corpus-level near-dup often hides
    SENTENCE-level boilerplate (headers, license blurbs) that survives
    whole-doc dedup — this measures how much is there before paying for
    a rewrite pass. Sentences split on the literal ``". "`` delimiter,
    space-trimmed, empties dropped (bit-identical to the SQL oracle's
    ``string_split`` + ``trim``).

    Scale shape: flat explode inside ``map_batches`` (rows grow ~20x
    but stay block-local), ONE pair-hash exchange counting occurrences
    per (group, sentence) — the memory-bounding step, distinct
    sentences per bucket is the scaling unit — then a tiny per-group
    sum. No joins, nothing driver-sized beyond #groups rows.
    """
    from .relational import hash_aggregate, preagg_sum

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        s = df[text_col].str.split(". ", regex=False).explode()
        g = df[group_col].reindex(s.index)
        s = s.str.strip(" ")
        keep = s != ""
        part = (pd.DataFrame({"g": g[keep], "sent": s[keep]})
                .groupby(["g", "sent"], as_index=False)
                .size().rename(columns={"size": "n"}))
        part["n"] = part["n"].astype("int64")
        return pa.Table.from_pandas(part, preserve_index=False)

    cnt = hash_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["g", "sent"],
        lambda df: df.groupby(["g", "sent"], as_index=False)["n"].sum())

    tot = preagg_sum(cnt, ["g"], {"n_sentences": "n"}, counts="n_distinct")

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["dup_bp"] = (10_000 * (df["n_sentences"] - df["n_distinct"])
                        ) // df["n_sentences"]
        df = df.rename(columns={"g": group_col})
        return pa.Table.from_pandas(
            df[[group_col, "n_sentences", "n_distinct", "dup_bp"]],
            preserve_index=False)

    return tot.map_batches(finish, batch_format="pyarrow")


def sorted_neighborhood_pairs(ds, key_col: str, id_col: str = "doc_id",
                              window: int = 3, n_tiles: int = 16):
    """Sorted-neighborhood blocking — the classic record-linkage
    candidate generator (Hernández & Stolfo): sort the corpus by a
    blocking key, slide a ``window``-row neighborhood, and emit every
    in-window pair. Complements MinHash/LSH blocking: catches near-typo
    neighbors that shingle bands miss when edits hit every shingle.

    Distributed shape (no global sort materialization): the global
    rank is the two-phase :func:`~raygraph.ops.relational.
    ordered_prefix_sum` scan over a constant-1 column ordered by
    ``(key_col, id_col)`` (exact range tiles, tile offsets are the only
    driver state); each row then fans out ``window`` probe rows
    ``rank + j`` and one int-keyed shuffle join aligns them with their
    neighbors — O(window · n) rows exchanged, never a pairwise product.

    Returns (id_a, id_b, gap) with id_a the earlier row in sort order
    and gap = rank distance in [1, window].
    """
    from .relational import ordered_prefix_sum, shuffle_join, \
        _join_partitions

    import ray.data as rd

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("gap", pa.int64())])

    def one(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch.column(key_col),
            "i": batch.column(id_col),
            "__one": pa.array(np.ones(batch.num_rows, dtype="int64")),
        })

    ranked = ordered_prefix_sum(
        ds.map_batches(one, batch_format="pyarrow"),
        "k", "__one", n_tiles=n_tiles, out="rn", tie_cols=("i",))

    from raygraph.ops.graph import _repaired

    probe_schema = pa.schema([("id_a", pa.int64()), ("gap", pa.int64()),
                              ("t", pa.int64())])

    def probes(df: pd.DataFrame) -> pa.Table:
        outs = []
        for j in range(1, window + 1):
            outs.append(pd.DataFrame({
                "id_a": df["i"], "gap": np.int64(j),
                "t": df["rn"] + j}))
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    left = _repaired(ranked.map_batches(probes, batch_format="pandas"),
                     probe_schema)
    right = _repaired(
        ranked.map_batches(
            lambda df: pa.Table.from_pandas(
                pd.DataFrame({"id_b": df["i"], "rn": df["rn"]}),
                preserve_index=False),
            batch_format="pandas"),
        pa.schema([("id_b", pa.int64()), ("rn", pa.int64())]))

    if left.count() == 0 or right.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    j = shuffle_join(left, right, on="t", right_on="rn",
                     num_partitions=_join_partitions(right.count()))
    return _repaired(
        j.map_batches(
            lambda b: pa.table({"id_a": b.column("id_a"),
                                "id_b": b.column("id_b"),
                                "gap": b.column("gap")}),
            batch_format="pyarrow"),
        out_schema)


def _es_tok_frame(batch: pa.Table, text_col: str,
                  id_col: str) -> pd.DataFrame:
    """(doc, toks) frame under the parity tokenizer — shared by the
    ExactSubstr stats and removal operators."""
    s = batch.column(text_col).to_pandas().fillna("")
    toks = s.str.strip().str.lower().str.split()
    return pd.DataFrame({
        "doc": batch.column(id_col).to_pandas(),
        "toks": toks,
    })


def _exact_substr_hits(ds, L: int, text_col: str, id_col: str):
    """Stages 1-3 of the ExactSubstr shape (see
    :func:`duplicate_ngram_stats`): gram inventory → duplicated-gram
    keys → left_semi-marked occurrences. Returns the hits Dataset
    (gh, doc, pos), possibly empty-but-typed."""
    import ray.data as rd

    from raygraph.ops.graph import _repaired

    from .relational import (_join_partitions, hash_aggregate,
                             shuffle_join)

    def grams(batch: pa.Table) -> pa.Table:
        # flat-array gram build: no per-doc groupby, no group shifts —
        # doc-boundary validity is one integer compare on the flat doc
        # array, gram text is L-1 vectorized str.cat passes
        df = _es_tok_frame(batch, text_col, id_col)
        counts = df["toks"].str.len().fillna(0).astype("int64") \
            .to_numpy()
        total = int(counts.sum())
        empty = pa.table({"gh": pa.array([], pa.string()),
                          "doc": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if total < L:
            return empty
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in df["toks"]
             if len(t)])
        docs_arr = np.repeat(df["doc"].to_numpy(dtype="int64"), counts)
        starts = np.cumsum(counts) - counts
        pos_all = np.arange(total, dtype="int64") \
            - np.repeat(starts, counts)
        m = total - L + 1
        valid = docs_arr[:m] == docs_arr[L - 1:]
        if not valid.any():
            return empty
        gram = pd.Series(flat[:m][valid])
        for k in range(1, L):
            gram = gram.str.cat(
                pd.Series(flat[k:m + k][valid]), sep=" ")
        return pa.table({
            "gh": pa.array(gram, pa.string()),
            "doc": pa.array(docs_arr[:m][valid], pa.int64()),
            "pos": pa.array(pos_all[:m][valid], pa.int64()),
        })

    gram_schema = pa.schema([("gh", pa.string()), ("doc", pa.int64()),
                             ("pos", pa.int64())])
    # one materialize, not _repaired's two: grams() emits an explicit
    # schema even for empty batches, and the all-empty case is short-
    # circuited below before any join sees it
    occ = ds.map_batches(grams, batch_format="pyarrow").materialize()
    if occ.count() == 0:
        return rd.from_arrow(gram_schema.empty_table())

    # duplicated gram keys in ONE gh-keyed exchange: per-batch (gh, doc)
    # dedup is the map-side combiner, the bucket reduce counts distinct
    # docs per gram and keeps >= 2 — fused from the former two-exchange
    # chain (pair distinct, then count) whose second shuffle and two
    # _repaired materialize rounds were pure fixed cost
    def pair_partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["gh", "doc"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def dup_keys(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.drop_duplicates().groupby("gh")["doc"].nunique()
        return pd.DataFrame({"gh": nd.index[nd.to_numpy() >= 2]})

    dupset = _repaired(
        hash_aggregate(occ.map_batches(pair_partial,
                                       batch_format="pyarrow"),
                       ["gh"], dup_keys),
        pa.schema([("gh", pa.string())]))

    if dupset.count() == 0:
        return rd.from_arrow(gram_schema.empty_table())
    return _repaired(
        shuffle_join(occ, dupset, on="gh", right_on="gh",
                     how="left_semi",
                     num_partitions=_join_partitions(occ.count())),
        gram_schema)


def duplicate_ngram_stats(ds, L: int = 8, text_col: str = "text",
                          id_col: str = "doc_id"):
    """Exact-substring duplication profile (the ExactSubstr discipline
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", 2021, re-expressed at token-n-gram grain): an L-token
    window that appears in >= 2 distinct documents marks every token
    position it covers in EVERY document as duplicated; per doc we
    report how much of it is covered.

    Distributed shape — never a pairwise product, never a suffix array
    on one node:

    1. gram inventory: per-batch VECTORIZED n-gram build (explode
       tokens, 7 group-shifts, one string concat); the gram STRING is
       its own exchange key — an 8-token gram is about as wide as a
       hex md5, so hashing would buy nothing and cost ~1 µs/gram →
       (gh, doc, pos) rows;
    2. duplicated grams: one pair-hash distinct (gh, doc) exchange,
       per-gh doc counts (combiner preagg), filter >= 2 — gram-sized;
    3. one left_semi shuffle join marks duplicate occurrences;
    4. coverage: ONE doc-hash exchange of the hit positions, then a
       vectorized interval-union fold per doc (equal-length windows:
       union = sum(min(L, gap)) over sorted distinct positions) — no
       x L row fan-out, no (doc, idx) distinct.

    Returns (doc_id, n_tokens, n_dup_tokens, dup_bp) with dup_bp =
    (10000 * covered) // n_tokens (0 for empty docs).
    """
    from .relational import (_join_partitions, hash_aggregate,
                             shuffle_join)

    from raygraph.ops.graph import _repaired

    import ray.data as rd

    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_tokens", pa.int64()),
        ("n_dup_tokens", pa.int64()), ("dup_bp", pa.int64())])

    def counts(batch: pa.Table) -> pa.Table:
        df = _es_tok_frame(batch, text_col, id_col)
        return pa.table({
            id_col: pa.array(df["doc"], pa.int64()),
            "n_tokens": pa.array(df["toks"].str.len()
                                 .fillna(0).astype("int64"), pa.int64()),
        })

    tokn = _repaired(ds.map_batches(counts, batch_format="pyarrow"),
                     pa.schema([(id_col, pa.int64()),
                                ("n_tokens", pa.int64())]))

    hits = _exact_substr_hits(ds, L, text_col, id_col)

    def union_len(df: pd.DataFrame) -> pd.DataFrame:
        # coverage = interval-union length of the [pos, pos+L) windows:
        # with equal-length windows and sorted distinct positions the
        # union is sum(min(L, next_pos - pos)) (+L for each doc's last
        # position) — one vectorized pass, no x L row fan-out, no
        # (doc, idx) distinct exchange
        df = df.drop_duplicates().sort_values(["doc", "pos"],
                                              kind="mergesort")
        doc = df["doc"].to_numpy(dtype="int64")
        pos = df["pos"].to_numpy(dtype="int64")
        nxt = np.empty_like(pos)
        nxt[:-1], nxt[-1] = pos[1:], pos[-1] + L
        same = np.empty(len(pos), dtype=bool)
        same[:-1], same[-1] = doc[1:] == doc[:-1], False
        piece = np.where(same, np.minimum(L, nxt - pos), L)
        out = pd.DataFrame({"doc": doc, "n_dup_tokens": piece}) \
            .groupby("doc", as_index=False)["n_dup_tokens"].sum()
        out["n_dup_tokens"] = out["n_dup_tokens"].astype("int64")
        return out

    if hits.count() == 0:
        percov = rd.from_arrow(
            pa.schema([("doc", pa.int64()),
                       ("n_dup_tokens", pa.int64())]).empty_table())
    else:
        # doc-hash buckets co-locate every position of a doc, so the
        # per-bucket fold is exact; exchange = hit rows x 1, not x L
        percov = _repaired(
            hash_aggregate(hits.select_columns(["doc", "pos"]),
                           ["doc"], union_len),
            pa.schema([("doc", pa.int64()),
                       ("n_dup_tokens", pa.int64())]))

    if percov.count() == 0:
        def zero(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            z = pa.array(np.zeros(n, dtype="int64"))
            return pa.table({id_col: batch.column(id_col),
                             "n_tokens": batch.column("n_tokens"),
                             "n_dup_tokens": z, "dup_bp": z})
        return _repaired(tokn.map_batches(zero, batch_format="pyarrow"),
                         out_schema)

    j = shuffle_join(tokn, percov, on=id_col, right_on="doc",
                     how="left_outer",
                     num_partitions=_join_partitions(tokn.count()))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df.columns = [id_col, "n_tokens", "n_dup_tokens"]
        nd_ = df["n_dup_tokens"].fillna(0).astype("int64")
        nt = df["n_tokens"].astype("int64")
        bp = np.where(nt > 0, (10000 * nd_) // nt.replace(0, 1), 0)
        return pa.table({
            id_col: pa.array(df[id_col], pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_dup_tokens": pa.array(nd_, pa.int64()),
            "dup_bp": pa.array(bp.astype("int64"), pa.int64()),
        })

    return _repaired(j.map_batches(finish, batch_format="pyarrow"),
                     out_schema)


def clean_duplicate_ngrams(ds, L: int = 8, text_col: str = "text",
                           id_col: str = "doc_id", num_buckets: int = 64):
    """ExactSubstr REMOVAL (the action Lee et al. 2021 actually take):
    drop every token covered by an L-token window that appears in >= 2
    documents; return the cleaned corpus as
    (doc_id, n_kept, clean_text) with clean_text the space-joined
    surviving lowercased tokens in position order ('' when nothing
    survives).

    Shape: stages 1-3 shared with :func:`duplicate_ngram_stats`
    (:func:`_exact_substr_hits`), then ONE doc-hash co-group of the
    corpus with its hit-start lists — docs and their hits meet in the
    same bucket, the covered mask is a vectorized diff-array cumsum per
    doc, and only hit STARTS are exchanged (never a × L fan-out).
    """
    from raygraph.ops.graph import _repaired

    from .relational import hash_aggregate

    hits = _exact_substr_hits(ds, L, text_col, id_col)

    def docs_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc": batch.column(id_col).cast(pa.int64()),
            "text": batch.column(text_col).cast(pa.string()),
            "pos": pa.nulls(batch.num_rows, pa.int64()),
        })

    def hits_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc": batch.column("doc"),
            "text": pa.nulls(batch.num_rows, pa.string()),
            "pos": batch.column("pos"),
        })

    both = ds.map_batches(docs_side, batch_format="pyarrow").union(
        hits.map_batches(hits_side, batch_format="pyarrow"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc, g in df.groupby("doc", sort=False):
            texts = g.loc[g["pos"].isna(), "text"]
            if texts.empty:        # hits for a doc outside this input
                continue
            toks = str(texts.iloc[0] or "").strip().lower().split()
            n = len(toks)
            starts = g.loc[g["pos"].notna(), "pos"] \
                .to_numpy(dtype="int64")
            if n and len(starts):
                cov = np.zeros(n + 1, dtype=np.int64)
                np.add.at(cov, starts, 1)
                np.add.at(cov, np.minimum(n, starts + L), -1)
                keep_mask = np.cumsum(cov[:n]) == 0
                kept = [t for t, k in zip(toks, keep_mask) if k]
            else:
                kept = toks
            rows.append({"doc_id": int(doc), "n_kept": len(kept),
                         "clean_text": " ".join(kept)})
        out = pd.DataFrame(rows,
                           columns=["doc_id", "n_kept", "clean_text"])
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_kept"] = out["n_kept"].astype("int64")
        out["clean_text"] = out["clean_text"].astype(str)
        return out

    return _repaired(
        hash_aggregate(both, ["doc"], fold, num_buckets=num_buckets),
        pa.schema([("doc_id", pa.int64()), ("n_kept", pa.int64()),
                   ("clean_text", pa.string())]))


def line_dedup(ds, min_df: int = 2, text_col: str = "text",
               id_col: str = "doc_id", num_buckets: int = 64,
               group_col: str | None = None):
    """Cross-document LINE dedup — the CCNet / RefinedWeb curation
    staple (Wenzek et al. 2020 §3.1): a normalized line (space/tab/CR
    strip + lowercase) that occurs in >= ``min_df`` DISTINCT documents
    is boilerplate (nav bars, cookie banners, license footers) and is
    dropped from EVERY document; empty-after-normalize lines are never
    counted and never dropped. Complements
    :func:`clean_duplicate_ngrams` (token n-gram grain) and
    :func:`sentence_dedup_stats` (stats only, no rewrite) — this is
    the REMOVAL at line grain, returning the cleaned corpus.

    Distributed shape (the ExactSubstr discipline, line-keyed):

    1. line inventory: per-batch vectorized split/explode →
       (lk, doc, idx) rows, idx the 0-based line position;
    2. boilerplate keys: ONE lk-keyed exchange — per-batch (lk, doc)
       distinct is the combiner, the bucket reduce counts distinct
       docs per key and keeps >= min_df;
    3. one left_semi shuffle join marks hit (doc, idx) positions —
       only INT positions travel, never line text;
    4. ONE doc-hash co-group of the corpus with its hit positions
       re-splits the original text and reassembles survivors in
       order (the :func:`clean_duplicate_ngrams` fold idiom).

    Returns (doc_id, n_lines, n_dropped, clean_text) with clean_text
    the newline-joined surviving ORIGINAL (un-normalized) lines (''
    when nothing survives). ``group_col`` scopes the df count and the
    drop to the group (per-DOMAIN boilerplate: a nav bar repeats
    within its site — a global min_df would also strip legitimate
    cross-site phrases). Reference analog: sub-document rewrite
    fidelity, arangors-graph-exporter src/graph_loader.rs:394-462
    (bounded co-located comparison, never all-pairs).
    """
    import ray.data as rd

    from raygraph.ops.graph import _repaired

    from .relational import (_join_partitions, dataset_arrow_schema,
                             hash_aggregate, shuffle_join)

    # id-type-agnostic: web-scale corpora key on string ids (URLs) as
    # often as ints — carry the input id type end to end
    in_schema = dataset_arrow_schema(ds)
    id_type = in_schema.field(id_col).type
    if pa.types.is_integer(id_type):
        id_type = pa.int64()

    grouped = group_col is not None
    occ_fields = [("lk", pa.string()), ("doc", id_type),
                  ("idx", pa.int64())]
    if grouped:
        # grp is a KEY, normalized via _group_key (string + null
        # sentinel) — the shared null-group contract; a raw NaN key
        # would vanish in the pandas groupby count and null-group
        # lines would never be boilerplate
        occ_fields.append(("grp", pa.string()))
    occ_schema = pa.schema(occ_fields)

    def line_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pandas()
        txt = batch.column(text_col).to_pandas().fillna("")
        ls = txt.str.split("\n")
        counts = ls.str.len().astype("int64").to_numpy()
        total = int(counts.sum())
        if total == 0:
            return occ_schema.empty_table()
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in ls if len(t)])
        docs_arr = np.repeat(ids.to_numpy(), counts)
        starts = np.cumsum(counts) - counts
        idx_all = np.arange(total, dtype="int64") \
            - np.repeat(starts, counts)
        lk = pd.Series(flat).str.strip(" \t\r").str.lower()
        keep = (lk != "").to_numpy()
        cols = {
            "lk": pa.array(lk[keep], pa.string()),
            "doc": pa.array(docs_arr[keep], id_type),
            "idx": pa.array(idx_all[keep], pa.int64())}
        if grouped:
            g = np.repeat(
                _group_key(batch.column(group_col).to_pandas())
                .to_numpy(), counts)
            cols["grp"] = pa.array(g[keep], pa.string())
        return pa.table(cols)

    occ = ds.map_batches(line_rows, batch_format="pyarrow").materialize()

    out_schema = pa.schema([
        ("doc_id", id_type), ("n_lines", pa.int64()),
        ("n_dropped", pa.int64()), ("clean_text", pa.string())])

    def docs_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc": batch.column(id_col).cast(id_type),
            "text": batch.column(text_col).cast(pa.string()),
            "idx": pa.nulls(batch.num_rows, pa.int64())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc, g in df.groupby("doc", sort=False):
            texts = g.loc[g["idx"].isna(), "text"]
            if texts.empty:        # hits for a doc outside this input
                continue
            lines = str(texts.iloc[0] or "").split("\n")
            drop = set(g.loc[g["idx"].notna(), "idx"].astype("int64"))
            kept = [ln for i, ln in enumerate(lines) if i not in drop]
            rows.append({"doc_id": doc, "n_lines": len(lines),
                         "n_dropped": len(drop),
                         "clean_text": "\n".join(kept)})
        out = pd.DataFrame(
            rows, columns=["doc_id", "n_lines", "n_dropped",
                           "clean_text"])
        for c in ("n_lines", "n_dropped"):
            out[c] = out[c].astype("int64")
        out["clean_text"] = out["clean_text"].astype(str)
        return out

    def finish(hits):
        both = ds.map_batches(docs_side, batch_format="pyarrow")
        if hits is not None:
            def hits_side(batch: pa.Table) -> pa.Table:
                return pa.table({
                    "doc": batch.column("doc"),
                    "text": pa.nulls(batch.num_rows, pa.string()),
                    "idx": batch.column("idx")})

            both = both.union(
                hits.map_batches(hits_side, batch_format="pyarrow"))
        return _repaired(
            hash_aggregate(both, ["doc"], fold,
                           num_buckets=num_buckets), out_schema)

    if occ.count() == 0:
        return finish(None)

    key_cols = ["grp", "lk"] if grouped else ["lk"]

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + ["doc"]).to_pandas() \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def dup_keys(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.drop_duplicates().groupby(key_cols)["doc"].nunique()
        return nd.index[nd.to_numpy() >= min_df].to_frame(index=False)

    dupset = _repaired(
        hash_aggregate(occ.map_batches(pair_partial,
                                       batch_format="pyarrow"),
                       ["lk"], dup_keys, num_buckets=num_buckets),
        pa.schema([occ_schema.field(c) for c in key_cols]))
    if dupset.count() == 0:
        return finish(None)

    hits = _repaired(
        shuffle_join(occ, dupset, on=key_cols, right_on=key_cols,
                     how="left_semi",
                     num_partitions=_join_partitions(occ.count())),
        occ_schema)
    return finish(hits)


def winnow_dup_pairs(ds, min_shared: int = 3, n: int = 3,
                     window: int = 4, text_col: str = "text",
                     id_col: str = "doc_id",
                     num_buckets: int | None = None):
    """Near-duplicate pairs by SHARED WINNOWING FINGERPRINTS — the MOSS
    shape (Schleimer et al. 2003 §4): docs sharing >= ``min_shared``
    selected fingerprints are flagged. Complements minhash-LSH: the
    winnowing guarantee makes recall DETERMINISTIC for any shared run
    of ``window + n - 1`` tokens (>= min_shared windows ⇒ flagged),
    where band-LSH recall is probabilistic.

    Shape (same exchange discipline as minhash_candidates):
    per-doc fingerprint kernel (zero exchange) → ONE pair-hash distinct
    (doc, fp) exchange → fp-bucket pairing (BUCKET_PAIR_CAP-guarded) →
    one (id_a, id_b) combiner count. Returns (id_a, id_b, shared) with
    id_a < id_b and shared >= min_shared.
    """
    import pyarrow.compute as pc

    from raygraph.ops.graph import _repaired

    from .relational import hash_aggregate
    from .text import winnow_fp_rows

    nb = num_buckets or 128

    fps = ds.map_batches(
        lambda b: winnow_fp_rows(b, n, window, text_col, id_col),
        batch_format="pyarrow")
    # winnow_fp_rows is distinct per batch, not globally — one
    # pair-hash exchange makes (doc, fp) globally distinct
    fpd = _repaired(
        hash_aggregate(fps, [id_col, "fp"],
                       lambda df: df.drop_duplicates(), num_buckets=nb),
        pa.schema([(id_col, pa.int64()), ("fp", pa.int64())]))

    def bucket_pairs_many(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("fp")[id_col].transform("size")
        df = df[sizes >= 2]
        if df.empty:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64")})
        # vectorized _bucket_pairs: fpd is globally (doc, fp)-distinct
        # so ids within an fp group are unique — cap on ascending ids,
        # ONE self-merge builds every within-fp pair (id_a < id_b).
        # NO cross-fp dedup: each fp bucket's pair is one shared
        # fingerprint — the downstream count is the shared-fp count
        df = df.sort_values(["fp", id_col], kind="mergesort")
        df = df[df.groupby("fp").cumcount() < BUCKET_PAIR_CAP]
        m = df.merge(df, on="fp", suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        return pd.DataFrame({
            "id_a": m[f"{id_col}_l"].to_numpy().astype("int64"),
            "id_b": m[f"{id_col}_r"].to_numpy().astype("int64")})

    pairs = _repaired(
        hash_aggregate(fpd, ["fp"], bucket_pairs_many, num_buckets=nb),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]))

    def precount(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["id_a", "id_b"], as_index=False).size()
        g["shared"] = g.pop("size").astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def sum_shared(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["id_a", "id_b"],
                          as_index=False)["shared"].sum()

    # pair-keyed count via the int64-bucket hash_aggregate, not a
    # multi-key Ray groupby().aggregate — same measured win as
    # containment_pairs
    shared = _repaired(
        hash_aggregate(
            pairs.map_batches(precount, batch_format="pyarrow"),
            ["id_a", "id_b"], sum_shared, num_buckets=nb),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("shared", pa.int64())]))

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("shared"), min_shared))

    return _repaired(
        shared.map_batches(keep, batch_format="pyarrow"),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("shared", pa.int64())]))


# ------------------------------------ embedding-space corpus curation
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540) prunes semantic
# duplicates inside embedding clusters; D4 (Tirumala et al. 2023,
# arXiv:2308.12284) additionally prunes the most PROTOTYPICAL points
# (nearest the cluster centroid). Both below use a deterministic,
# SQL-replayable clustering — the sign pattern of the first
# ``n_sign_dims`` embedding dimensions (an axis-aligned LSH; swap in
# ops.cluster.kmeans assignments for production semantics) — and an
# exact-integer quantization q = floor(v * scale) so every cosine is
# computed from identical int-valued doubles on the Ray side and in
# the DuckDB oracle: products/sums stay < 2^53, so float64 arithmetic
# is EXACT and reduction-order-free.
def _sign_bucket_q(batch: pa.Table, n_sign_dims: int, scale: int,
                   vec_col: str, id_col: str) -> pa.Table:
    """(id, bucket, q) stage: bucket = little-endian sign bits of the
    first ``n_sign_dims`` dims (>= 0 → 1); q = floor(v·scale) int64."""
    from .vecops import vectors_to_numpy

    vecs = vectors_to_numpy(batch.column(vec_col), np.float64)
    signs = vecs[:, :n_sign_dims] >= 0
    bucket = (signs * (1 << np.arange(n_sign_dims))).sum(axis=1) \
        .astype(np.int64)
    q = np.floor(vecs * scale).astype(np.int64)
    return pa.table({
        id_col: batch.column(id_col),
        "bucket": pa.array(bucket, pa.int64()),
        "q": pa.array(list(q), pa.list_(pa.int64())),
    })


def semdedup_survivors(ds, tau_e4: int = 9200, n_sign_dims: int = 6,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id"):
    """SemDeDup: keep one exemplar per set of semantic duplicates.

    Within each sign bucket, a row is DROPPED iff some lower-id row in
    the same bucket has round(cosine, 4) >= tau_e4/10⁴ (greedy
    keep-lowest-id — the paper keeps one random exemplar; lowest id
    makes it deterministic). Dominance rule, not transitive closure:
    a chain a~b~c with a≁c drops both b and c. Returns the survivor
    rows ``(id, bucket)``.

    Scale shape: one stateless quantize+bucket pass → ONE bucket-keyed
    groupby; pairwise cosines only within a bucket, capped at
    ``BUCKET_PAIR_CAP`` rows (excess ids — deterministically the
    highest — are kept unexamined and survive; raise ``n_sign_dims``
    ∝ log n so buckets stay small). Quantization at 10⁶ keeps every
    dot product exactly representable (64 dims · 10¹² ≪ 2⁵³)
    regardless of corpus size."""
    tau = tau_e4 / 10_000.0

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        if len(g) > BUCKET_PAIR_CAP:
            print(f"semdedup_survivors: bucket over cap "
                  f"(cap={BUCKET_PAIR_CAP}); excess ids kept unexamined")
        over = g.iloc[BUCKET_PAIR_CAP:]
        g = g.iloc[:BUCKET_PAIR_CAP]
        Q = np.stack(g["q"].to_numpy()).astype(np.float64)
        G = Q @ Q.T
        n = np.sqrt(np.diag(G))
        n[n == 0] = 1.0
        sims = np.round(G / np.outer(n, n), 4)
        lower = np.tril(sims >= tau, k=-1)
        kept = ~lower.any(axis=1)
        out = g.loc[kept, [id_col, "bucket"]]
        if len(over):
            out = pd.concat([out, over[[id_col, "bucket"]]],
                            ignore_index=True)
        return out

    staged = ds.map_batches(
        lambda b: _sign_bucket_q(b, n_sign_dims, 1_000_000,
                                 vec_col, id_col),
        batch_format="pyarrow")
    return staged.groupby("bucket").map_groups(
        survivors, batch_format="pandas")


def prototype_prune_topk(ds, k: int = 3, n_sign_dims: int = 4,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id"):
    """D4-style prototype pruning: per cluster, flag the ``k`` points
    most prototypical (highest cosine to the cluster centroid) — the
    redundant "easy" core SSL-prototype pruning removes. Returns the
    PRUNE LIST ``(id, bucket, proto)``, proto = round(cos(q, Σq), 4);
    cosine is scale-invariant, so the exact integer SUM vector stands
    in for the mean and no division ever happens before the cosine.

    Ties on rounded proto break by ascending id (mirrors the SQL
    window ``ORDER BY proto DESC, id``). Quantization at 10³ keeps
    dot products against a bucket-sum vector exact to bucket sizes of
    ~10⁴ rows (3·10⁵·10³·64 ≪ 2⁵³); beyond that, order-dependent
    ulp noise can appear under the 4-dp rounding — size
    ``n_sign_dims`` so buckets stay under that."""
    def prune(g: pd.DataFrame) -> pd.DataFrame:
        Q = np.stack(g["q"].to_numpy()).astype(np.float64)
        ctr = Q.sum(axis=0)
        nc = np.sqrt(ctr @ ctr)
        nq = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        nq[nq == 0] = 1.0
        proto = np.round((Q @ ctr) / (nq * (nc if nc else 1.0)), 4)
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "bucket": g["bucket"].to_numpy(),
            "proto": proto,
        }).sort_values(["proto", id_col],
                       ascending=[False, True]).head(k)
        return out

    staged = ds.map_batches(
        lambda b: _sign_bucket_q(b, n_sign_dims, 1_000,
                                 vec_col, id_col),
        batch_format="pyarrow")
    return staged.groupby("bucket").map_groups(
        prune, batch_format="pandas")


def containment_pairs(ds, threshold_e6: int = 800_000, n: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_buckets: int | None = None):
    """Asymmetric near-duplicate pairs by exact n-gram CONTAINMENT
    (Broder 1997's containment score c(A,B) = |A∩B| / |A| over word
    n-gram sets) — the quote / subsumption detector: a short document
    embedded verbatim inside a long one has LOW Jaccard (the symmetric
    ops miss it) but containment ≈ 1 on the short side, which is the
    "drop the quoted snippet, keep the superset" curation rule.

    Shape — counting, never comparing texts: per-batch distinct
    (doc, gram) rows → ONE pair-hash distinct exchange → gram-bucket
    pairing emits ONE ROW PER SHARED GRAM (no cross-gram dedup, the
    winnow_dup_pairs idiom), so a (id_a, id_b) combiner count IS the
    exact intersection size; per-doc gram counts are one more combiner
    exchange and two pair-keyed joins attach them. No document text
    ever crosses the wire after the gram pass. Exact whenever no gram
    bucket exceeds ``BUCKET_PAIR_CAP`` (a df-capped gram stops pairing
    beyond the cap — the repo's standard coverage bound; raise the cap
    or n if real data trips it).

    Returns ``(id_a, id_b, inter, n_a, n_b, cont_a_e6, cont_b_e6)``
    with ``id_a < id_b`` and ``max(cont) ≥ threshold_e6``; the
    containments are exact integers ``10⁶·inter // |side|``, so a SQL
    oracle replays them bit for bit.

    Reference analog: the smart-edge anti-join dedup of
    arangors-graph-exporter (src/graph_loader.rs:394-462) — pairwise
    comparison bounded to co-bucketed keys, never all-pairs.
    """
    import pyarrow.compute as pc

    from raygraph.ops.graph import _repaired

    from .relational import (_join_partitions, hash_aggregate,
                             preagg_sum, shuffle_join)
    from .text import _doc_ngrams

    nb = num_buckets or 128
    out_schema = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("inter", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64()),
        ("cont_a_e6", pa.int64()), ("cont_b_e6", pa.int64())])

    def gram_rows(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        ids = batch.column(id_col).to_pandas()
        grams = _doc_ngrams(s, n)
        if not len(grams):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "ngram": pa.array([], pa.string())})
        out = pd.DataFrame({
            id_col: ids.loc[grams.index].to_numpy(),
            "ngram": grams["ngram"].to_numpy(),
        }).drop_duplicates()
        out[id_col] = out[id_col].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    gd = _repaired(
        hash_aggregate(ds.map_batches(gram_rows, batch_format="pyarrow"),
                       [id_col, "ngram"],
                       lambda df: df.drop_duplicates(), num_buckets=nb),
        pa.schema([(id_col, pa.int64()), ("ngram", pa.string())]))

    def bucket_pairs_many(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("ngram")[id_col].transform("size")
        df = df[sizes >= 2]
        if df.empty:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64")})
        # vectorized _bucket_pairs: cap per gram on ascending ids, ONE
        # self-merge builds every within-gram pair (id_a < id_b). NO
        # cross-gram dedup: each gram's pair row is one shared gram —
        # the downstream count IS |A∩B|
        df = df.sort_values(["ngram", id_col], kind="mergesort")
        df = df[df.groupby("ngram").cumcount() < BUCKET_PAIR_CAP]
        m = df.merge(df, on="ngram", suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        return pd.DataFrame({
            "id_a": m[f"{id_col}_l"].to_numpy().astype("int64"),
            "id_b": m[f"{id_col}_r"].to_numpy().astype("int64")})

    def precount(batch: pa.Table) -> pa.Table:
        # per-block combiner: a pair sharing k grams of one gram-bucket
        # collapses to one row before the pair-keyed exchange
        df = batch.to_pandas()
        g = df.groupby(["id_a", "id_b"], as_index=False).size()
        g["inter"] = g.pop("size").astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def sum_inter(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["id_a", "id_b"], as_index=False)["inter"].sum()

    # pair-keyed count via hash_aggregate (ONE int64-bucket sort), not a
    # multi-key Ray groupby().aggregate — measured ~10x faster at this
    # row shape
    inter = _repaired(
        hash_aggregate(
            _repaired(
                hash_aggregate(gd, ["ngram"], bucket_pairs_many,
                               num_buckets=nb),
                pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
            ).map_batches(precount, batch_format="pyarrow"),
            ["id_a", "id_b"], sum_inter, num_buckets=nb),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("inter", pa.int64())]))
    if inter.count() == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    sizes = _repaired(
        preagg_sum(gd.select_columns([id_col]), [id_col], {},
                   counts="ng"),
        pa.schema([(id_col, pa.int64()), ("ng", pa.int64())]))

    n_docs_with_grams = sizes.count()
    if n_docs_with_grams <= SIZES_BROADCAST_LIMIT:
        # the per-doc gram-count table fits the driver: ride it into
        # the finish pass as a broadcast map (two ints per doc) — the
        # same two-strategy contract as attach_pair_texts
        import ray

        sdf = sizes.to_pandas()
        ng_ref = ray.put(dict(zip(sdf[id_col].astype("int64"),
                                  sdf["ng"].astype("int64"))))

        def finish_bc(batch: pa.Table) -> pa.Table:
            import ray as _ray

            if batch.num_rows == 0:
                return out_schema.empty_table()
            ngm = _ray.get(ng_ref)
            df = batch.to_pandas()
            iv = df["inter"].to_numpy().astype("int64")
            na = df["id_a"].map(ngm).to_numpy().astype("int64")
            nb_ = df["id_b"].map(ngm).to_numpy().astype("int64")
            ca = (1_000_000 * iv) // na
            cb = (1_000_000 * iv) // nb_
            keep = np.maximum(ca, cb) >= threshold_e6
            out = pd.DataFrame({
                "id_a": df["id_a"], "id_b": df["id_b"], "inter": iv,
                "n_a": na, "n_b": nb_,
                "cont_a_e6": ca, "cont_b_e6": cb,
            })[keep]
            for c in out.columns:
                out[c] = out[c].astype("int64")
            return pa.Table.from_pandas(out, preserve_index=False)

        return _repaired(
            inter.map_batches(finish_bc, batch_format="pyarrow"),
            out_schema)

    def ren(suffix):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({f"__d{suffix}": batch.column(id_col),
                             f"n_{suffix}": batch.column("ng")})
        return fn

    j = shuffle_join(inter,
                     sizes.map_batches(ren("a"), batch_format="pyarrow"),
                     on="id_a", right_on="__da",
                     num_partitions=_join_partitions())
    j = shuffle_join(
        _repaired(j, pa.schema([("id_a", pa.int64()),
                                ("id_b", pa.int64()),
                                ("inter", pa.int64()),
                                ("n_a", pa.int64())])),
        sizes.map_batches(ren("b"), batch_format="pyarrow"),
        on="id_b", right_on="__db", num_partitions=_join_partitions())

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return out_schema.empty_table()
        iv = df["inter"].to_numpy().astype("int64")
        ca = (1_000_000 * iv) // df["n_a"].to_numpy().astype("int64")
        cb = (1_000_000 * iv) // df["n_b"].to_numpy().astype("int64")
        keep = np.maximum(ca, cb) >= threshold_e6
        out = pd.DataFrame({
            "id_a": df["id_a"], "id_b": df["id_b"], "inter": iv,
            "n_a": df["n_a"], "n_b": df["n_b"],
            "cont_a_e6": ca, "cont_b_e6": cb,
        })[keep]
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return _repaired(j.map_batches(finish, batch_format="pyarrow"),
                     out_schema)


def dedup_safe_kfold(ds, k: int = 5, text_col: str = "text",
                     id_col: str = "doc_id", labels=None):
    """Leakage-free K-fold assignment: every duplicate CLUSTER lands in
    one fold, so a train/eval split can never put one copy of a
    document in train and its duplicate in eval (the classic dedup
    leakage that inflates benchmark scores; cf. Lee et al. 2021 §6).

    Default mode needs ZERO exchange: the fold is a pure function of
    the content — ``fold = md5(text)-int60 % k`` — so exact duplicates
    agree by construction and the assignment is identical at any
    parallelism, epoch, or retry (the repo's content-keyed
    determinism idiom). Pass ``labels`` (a ``(vertex, component)``
    Dataset from :func:`near_dup_clusters`, vertex = zero-padded id)
    to fold by NEAR-dup component instead: one id-keyed shuffle join
    attaches the component, fold = md5(component) % k, rows without a
    component fold by their own id. The input id type is carried
    end-to-end (integers normalize to int64, strings pass through —
    the repo's id-type convention, same as ``line_dedup``); integer
    ids match zero-padded labels from :func:`near_dup_clusters`,
    string ids match their labels verbatim.

    Returns ``(id_col, fold)``.
    """
    import hashlib

    def content_fold(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_pandas().fillna("")
        folds = t.map(lambda s: int(
            hashlib.md5(s.encode()).hexdigest()[:15], 16) % k)
        return pa.table({
            id_col: batch.column(id_col),
            "fold": pa.array(folds.astype("int64"), pa.int64()),
        })

    if labels is None:
        return ds.map_batches(content_fold, batch_format="pyarrow")

    import pyarrow.compute as pc

    from raygraph.ops.graph import _repaired

    from .relational import (_join_partitions, dataset_arrow_schema,
                             shuffle_join)

    id_type = dataset_arrow_schema(ds).field(id_col).type
    int_ids = pa.types.is_integer(id_type)
    out_id_type = pa.int64() if int_ids else pa.string()

    def tag(batch: pa.Table) -> pa.Table:
        col = batch.column(id_col)
        return pa.table({
            id_col: pc.cast(col, out_id_type),
            "__v": (_padded_id(col) if int_ids
                    else pc.cast(col, pa.string())),
        })

    joined = shuffle_join(
        ds.map_batches(tag, batch_format="pyarrow"), labels,
        on="__v", right_on="vertex", how="left_outer",
        num_partitions=_join_partitions())

    def comp_fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if "component" not in df.columns:
            df["component"] = None
        key = df["component"].where(df["component"].notna(),
                                    df[id_col].astype(str))
        folds = key.map(lambda s: int(
            hashlib.md5(str(s).encode()).hexdigest()[:15], 16) % k)
        ids = (pa.array(df[id_col].astype("int64"), pa.int64())
               if int_ids
               else pa.array(df[id_col].astype(str), pa.string()))
        return pa.table({
            id_col: ids,
            "fold": pa.array(folds.astype("int64"), pa.int64()),
        })

    return _repaired(joined.map_batches(comp_fold, batch_format="pyarrow"),
                     pa.schema([(id_col, out_id_type),
                                ("fold", pa.int64())]))
