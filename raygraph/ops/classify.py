"""Distributed multinomial Naive Bayes text classifier (fit + score).

The standard data-curation quality classifier (the fastText-style
"wiki-vs-crawl" gate of CCNet / GPT-3 / LLaMA data pipelines,
Joulin et al. 2016 "Bag of Tricks for Efficient Text Classification"),
re-expressed Ray-Data-first with this repo's exact-integer oracle
contract:

* tokens   — lowercased whitespace tokens (the ``_TOKS_CTE`` parity
  tokenizer used across the text ops);
* vocab    — top-``vocab_size`` corpus tokens by frequency (ties →
  token ASC), i.e. :func:`raygraph.ops.text.build_vocab`; out-of-vocab
  tokens are ignored at fit AND score time, which is what bounds the
  model at ``vocab_size × n_classes`` no matter the corpus;
* fit      — per-batch token-count partials → one ``preagg_sum``
  exchange keyed (label, token): the only thing shuffled is the
  vocab-bounded count table, never documents;
* model    — add-one-smoothed log-likelihoods as exact int64:
  ``ll_e6 = floor(1e6 * ln((c + 1) / (T + V)))`` per (label, token)
  and ``prior_e6 = floor(1e6 * ln(n_label / N))`` per label, each
  term floored INDEPENDENTLY before any summation (the repo's proven
  per-term-floor-then-integer-sum idiom), so a DuckDB oracle replays
  the scores bit for bit;
* score    — the model is a (V × C) int64 matrix riding the task
  closure (broadcast once per worker); scoring a batch is one token
  explode + one ``np.add.at`` gather-sum — no shuffle at all. Predicted
  class = argmax(score), ties → lexicographically smallest label
  (np.argmax first-max over label-ASC columns == SQL
  ``ORDER BY score DESC, label ASC``).

Scale shape: fit moves O(vocab × classes) rows through one combiner
exchange; score is embarrassingly parallel with a constant broadcast.
Reference analog: the per-consumer projection/validation stage of
arangors-graph-exporter (src/graph_loader.rs:394-462) — stateful
per-batch transform with a small captured table.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE_E6 = 1_000_000


def nb_fit(ds, label_col: str = "label", text_col: str = "text",
           vocab_size: int = 256):
    """Fit the classifier; returns ``(ll_df, priors_df, vocab_df)``.

    ``ll_df``:     (label, token, ll_e6) — one row per class × vocab
                   token, including zero-count (smoothed-only) cells.
    ``priors_df``: (label, prior_e6, n_docs).
    ``vocab_df``:  build_vocab's (token, token_id, n).

    All three are vocab/class-bounded driver frames (the broadcast
    small side); documents never leave the cluster.
    """
    from .relational import preagg_sum
    from .text import build_vocab

    vocab = build_vocab(ds, size=vocab_size, text_col=text_col)
    vset = set(vocab["token"])

    def label_token_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        labels = batch.column(label_col).to_pandas()
        toks = s.str.strip().str.lower().str.split()
        ex = pd.DataFrame({
            "label": labels.repeat(
                toks.str.len().fillna(0).astype(int)).values,
            "token": toks.explode().dropna().values,
        })
        ex = ex[ex["token"].isin(vset)]
        g = ex.groupby(["label", "token"], as_index=False).size() \
              .rename(columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def label_doc_counts(batch: pa.Table) -> pa.Table:
        g = (batch.to_pandas().groupby(label_col, as_index=False).size()
             .rename(columns={"size": "n_docs", label_col: "label"}))
        g["n_docs"] = g["n_docs"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = preagg_sum(
        ds.map_batches(label_token_counts, batch_format="pyarrow"),
        ["label", "token"], {"c": "c"}).to_pandas()
    docs = preagg_sum(
        ds.map_batches(label_doc_counts, batch_format="pyarrow"),
        ["label"], {"n_docs": "n_docs"}).to_pandas()

    V = len(vocab)
    n_total = int(docs["n_docs"].sum())
    labels = sorted(docs["label"].tolist())

    # dense (label × vocab) grid so zero-count cells carry the smoothed
    # log-likelihood too — exactly the oracle's CROSS JOIN grid
    grid = pd.MultiIndex.from_product(
        [labels, vocab["token"].tolist()], names=["label", "token"]
    ).to_frame(index=False)
    grid = grid.merge(counts, on=["label", "token"], how="left")
    grid["c"] = grid["c"].fillna(0).astype("int64")
    totals = grid.groupby("label")["c"].sum().to_dict()
    grid["ll_e6"] = [
        math.floor(SCALE_E6 * math.log((int(c) + 1) /
                                       (int(totals[lb]) + V)))
        for lb, c in zip(grid["label"], grid["c"])
    ]
    grid["ll_e6"] = grid["ll_e6"].astype("int64")

    priors = docs.sort_values("label").reset_index(drop=True)
    priors["prior_e6"] = [
        math.floor(SCALE_E6 * math.log(int(n) / n_total))
        for n in priors["n_docs"]
    ]
    priors["prior_e6"] = priors["prior_e6"].astype("int64")
    return (grid[["label", "token", "c", "ll_e6"]],
            priors[["label", "prior_e6", "n_docs"]], vocab)


def nb_score(ds, ll_df: pd.DataFrame, priors_df: pd.DataFrame,
             text_col: str = "text", id_col: str = "doc_id"):
    """Score every document; returns a Dataset of
    (id_col, pred, score_e6) with the exact-int64 winning score.

    The (V × C) log-likelihood matrix and C-vector of priors ride the
    task closure — broadcast once per worker, gathered per batch with
    one vectorized ``np.add.at``. Zero-token docs score prior-only.
    """
    labels = sorted(priors_df["label"].tolist())
    lidx = {lb: i for i, lb in enumerate(labels)}
    tokens = ll_df["token"].unique().tolist()
    tidx = {t: i for i, t in enumerate(tokens)}
    L = np.zeros((len(tokens), len(labels)), dtype=np.int64)
    L[ll_df["token"].map(tidx).to_numpy(),
      ll_df["label"].map(lidx).to_numpy()] = ll_df["ll_e6"].to_numpy()
    pr = (priors_df.set_index("label").loc[labels, "prior_e6"]
          .to_numpy().astype(np.int64))
    label_arr = np.array(labels, dtype=object)

    def score(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        n = len(s)
        toks = s.str.strip().str.lower().str.split()
        reps = toks.str.len().fillna(0).astype(int)
        ex = pd.DataFrame({
            "row": np.repeat(np.arange(n, dtype=np.int64), reps.values),
            "token": toks.explode().dropna().values,
        })
        ex["vid"] = ex["token"].map(tidx)
        ex = ex.dropna(subset=["vid"])
        sums = np.tile(pr, (n, 1))
        if len(ex):
            np.add.at(sums, ex["row"].to_numpy().astype(np.int64),
                      L[ex["vid"].to_numpy().astype(np.int64)])
        best = np.argmax(sums, axis=1)          # first max ⇒ label ASC tie
        return pa.table({
            id_col: batch.column(id_col),
            "pred": pa.array(label_arr[best].tolist(), pa.string()),
            "score_e6": pa.array(sums[np.arange(n), best], pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def fit_stump(ds, x_col: str, y_col: str):
    """Fit a binary decision stump (one CART split, Breiman et al.
    1984): the threshold t minimizing weighted Gini impurity of the
    split ``x <= t`` vs ``x > t`` for a 0/1 label.

    Exact-integer spec: minimizing weighted Gini equals maximizing
    ``S(t) = Σ_k cl_k²/nl + Σ_k cr_k²/nr``; the ranking key is
    ``s_e12 = (10^12 · (Σcl²·nr + Σcr²·nl)) // (nl·nr)`` — one floor
    divide over exact products (Python ints here, HUGEINT in the
    oracle) — argmax ties → smallest threshold. Degenerate splits
    (empty right side) are excluded.

    Scale shape: the only exchange is a combiner preagg keyed by
    DISTINCT FEATURE VALUE (bin upstream if x is continuous-unbounded);
    prefix sums + the argmax run on that bounded grid.
    Returns a 1-row DataFrame (threshold, s_e12, nl, nr).
    """
    from .relational import preagg_sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[[x_col, y_col]]
        g = df.groupby(x_col, as_index=False).agg(
            c1=(y_col, "sum"), n=(y_col, "size"))
        g["c1"] = g["c1"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = preagg_sum(ds.map_batches(partial, batch_format="pyarrow"),
                     [x_col], {"c1": "c1", "n": "n"}).to_pandas()
    cnt = cnt.sort_values(x_col).reset_index(drop=True)
    t1 = int(cnt["c1"].sum())
    tn = int(cnt["n"].sum())
    best = None
    l1 = ln = 0
    for x, c1, n in zip(cnt[x_col], cnt["c1"], cnt["n"]):
        l1 += int(c1)
        ln += int(n)
        nl, nr = ln, tn - ln
        if nr == 0:
            continue
        sl = l1 * l1 + (nl - l1) * (nl - l1)
        r1 = t1 - l1
        sr = r1 * r1 + (nr - r1) * (nr - r1)
        s_e12 = (10**12 * (sl * nr + sr * nl)) // (nl * nr)
        key = (-s_e12, x)
        if best is None or key < best[0]:
            best = (key, {"threshold": x, "s_e12": s_e12,
                          "nl": nl, "nr": nr})
    row = best[1] if best else {"threshold": 0, "s_e12": 0,
                                "nl": 0, "nr": 0}
    out = pd.DataFrame([row])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def nearest_centroid_confusion(ds, vec_col: str = "embedding",
                               id_col: str = "vec_id",
                               label_col: str = "label"):
    """Nearest-centroid (Rocchio) probe over an embedding column: fit
    per-label centroids, assign every vector to its nearest centroid
    by cosine, return the confusion matrix ``(label, pred, n)`` — the
    cheap linear-probe-style quality check for an embedding space.

    Exact-integer discipline: vectors quantize to q = floor(v·10³);
    a label's centroid is the integer SUM vector (cosine is scale-
    invariant, so the mean never needs dividing) accumulated via ONE
    (label, dim)-keyed combiner exchange — L×d rows total, the only
    shuffle. The L×d int matrix broadcasts in the task closure; the
    assign pass is stateless (argmax of round(cos,4)·2¹⁰ − label, so
    ties break toward the smaller label exactly as the SQL window
    replay). Dot products stay < 2⁵³ to ~10⁶ rows/label at d=64;
    beyond that the centroid norm picks up order-dependent ulps under
    the 4-dp rounding (negligible in practice, noted for honesty).
    """
    from .relational import preagg_sum
    from .vecops import vectors_to_numpy

    def partials(batch: pa.Table) -> pa.Table:
        v = vectors_to_numpy(batch.column(vec_col), np.float64)
        q = np.floor(v * 1_000.0).astype(np.int64)
        lab = batch.column(label_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"label": np.repeat(lab, q.shape[1]),
                           "dim": np.tile(np.arange(q.shape[1]),
                                          len(lab)),
                           "s": q.ravel()})
        g = df.groupby(["label", "dim"], as_index=False)["s"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    ctr_df = preagg_sum(ds.map_batches(partials, batch_format="pyarrow"),
                        ["label", "dim"], {"s": "s"}).to_pandas()
    labels = np.sort(ctr_df["label"].unique())
    d = int(ctr_df["dim"].max()) + 1
    ctr = np.zeros((len(labels), d), dtype=np.float64)
    pos = {int(l): i for i, l in enumerate(labels)}
    ctr[[pos[int(l)] for l in ctr_df["label"]],
        ctr_df["dim"].to_numpy()] = ctr_df["s"].to_numpy()
    nc = np.sqrt(np.einsum("ij,ij->i", ctr, ctr))
    nc[nc == 0] = 1.0
    lab_arr = labels.astype(np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        v = vectors_to_numpy(batch.column(vec_col), np.float64)
        q = np.floor(v * 1_000.0)
        nq = np.sqrt(np.einsum("ij,ij->i", q, q))
        nq[nq == 0] = 1.0
        # exact integer dots, ONE division by the norm product — the
        # same operand shape the SQL cosine evaluates
        cos = np.round((q @ ctr.T) / np.outer(nq, nc), 4)
        key = (np.rint(cos * 10_000).astype(np.int64) << 10) \
            - lab_arr[None, :]
        pred = lab_arr[key.argmax(axis=1)]
        return pa.table({
            "label": pa.array(
                batch.column(label_col).to_numpy(zero_copy_only=False)
                .astype(np.int64), pa.int64()),
            "pred": pa.array(pred, pa.int64()),
        })

    return preagg_sum(ds.map_batches(assign, batch_format="pyarrow"),
                      ["label", "pred"], {}, counts="n")


def nb_class_score(ds, ll_df: pd.DataFrame, priors_df: pd.DataFrame,
                   class_label: str, text_col: str = "text",
                   id_col: str = "doc_id",
                   keep_cols: tuple[str, ...] = ()):
    """Per-document exact-int64 NB score for ONE class — the binary-
    gate / ranking view of :func:`nb_score` (score documents by "how
    much does this look like the target slice", the CCNet/GPT-3 usage
    where only the wiki-like class's log-odds matter).

    Returns a Dataset of ``(id_col, *keep_cols, score_e6)``. Same
    broadcast-closure / zero-shuffle shape as ``nb_score``: the class's
    V-vector of floored log-likelihoods rides the task closure, each
    batch is one token explode + one 1-D ``np.add.at`` gather-sum.
    """
    sub = ll_df[ll_df["label"] == class_label]
    if not len(sub):
        raise ValueError(f"unknown class label {class_label!r}")
    tokens = sub["token"].tolist()
    tidx = {t: i for i, t in enumerate(tokens)}
    vec = sub["ll_e6"].to_numpy().astype(np.int64)
    prior = int(priors_df.set_index("label")
                .loc[class_label, "prior_e6"])

    def score(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        n = len(s)
        toks = s.str.strip().str.lower().str.split()
        reps = toks.str.len().fillna(0).astype(int)
        ex = pd.DataFrame({
            "row": np.repeat(np.arange(n, dtype=np.int64), reps.values),
            "token": toks.explode().dropna().values,
        })
        ex["vid"] = ex["token"].map(tidx)
        ex = ex.dropna(subset=["vid"])
        sums = np.full(n, prior, dtype=np.int64)
        if len(ex):
            np.add.at(sums, ex["row"].to_numpy().astype(np.int64),
                      vec[ex["vid"].to_numpy().astype(np.int64)])
        cols = {id_col: batch.column(id_col)}
        for c in keep_cols:
            cols[c] = batch.column(c)
        cols["score_e6"] = pa.array(sums, pa.int64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def roc_auc(ds, pos_col: str, score_col: str = "score_e6",
            group_cols: Sequence[str] = ()):
    """Exact (optionally grouped) ROC-AUC via the Mann–Whitney
    rank-sum identity with half-credit ties:

        AUC = (#{pos>neg pairs} + ties/2) / (n_pos · n_neg)
        auc_e6 = (10⁶·(2·pairs_gt + ties)) // (2·n_pos·n_neg)

    Scale shape: ONE combiner exchange keyed
    ``(*group_cols, score, is_pos)`` — per-batch value-count partials,
    so the exchange (and the driver frame) is bounded by the number of
    DISTINCT scores per group, never the row count (integer e6 scores
    from the NB family keep this tight; quantize continuous scores
    first). The pair counts are folded in Python ints — exact past
    int64 at any corpus size. Groups missing a class are omitted
    (AUC undefined). Ties in score get the standard half credit, so
    a constant scorer is 0.5 exactly.

    Reference analog: the exporter's per-collection count aggregation
    (src/graph_loader.rs:514-559) — tiny keyed summaries of a big scan.
    """
    from .relational import preagg_sum

    gcols = list(group_cols)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__pos"] = df[pos_col].astype(bool)
        g = df.groupby(gcols + [score_col, "__pos"], as_index=False) \
            .size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    vc = preagg_sum(ds.map_batches(partial, batch_format="pyarrow"),
                    gcols + [score_col, "__pos"], {"n": "n"}).to_pandas()
    piv = vc.pivot_table(index=gcols + [score_col], columns="__pos",
                         values="n", fill_value=0,
                         aggfunc="sum").reset_index()
    for want in (True, False):
        if want not in piv.columns:
            piv[want] = 0
    piv = piv.rename(columns={True: "np_", False: "nn_"}) \
        .sort_values(gcols + [score_col], ignore_index=True)

    out = []
    keys = piv.groupby(gcols, sort=True) if gcols else [((), piv)]
    for key, sub in keys:
        sub = sub.sort_values(score_col, ignore_index=True)
        pairs_gt = ties = cumneg = 0
        n_pos = int(sub["np_"].sum())
        n_neg = int(sub["nn_"].sum())
        if n_pos == 0 or n_neg == 0:
            continue
        for np_s, nn_s in zip(sub["np_"], sub["nn_"]):
            pairs_gt += int(np_s) * cumneg
            ties += int(np_s) * int(nn_s)
            cumneg += int(nn_s)
        auc_e6 = (1_000_000 * (2 * pairs_gt + ties)) \
            // (2 * n_pos * n_neg)
        row = dict(zip(gcols, key if isinstance(key, tuple) else (key,)))
        row.update({"n_pos": n_pos, "n_neg": n_neg, "auc_e6": auc_e6})
        out.append(row)
    res = pd.DataFrame(out,
                       columns=gcols + ["n_pos", "n_neg", "auc_e6"])
    for c in ("n_pos", "n_neg", "auc_e6"):
        res[c] = res[c].astype("int64")
    return res.sort_values(gcols or ["auc_e6"], ignore_index=True)


def prf_per_class(ds, truth_col: str = "label", pred_col: str = "pred"):
    """Per-class precision / recall / F1 from ONE ``(truth, pred)``
    confusion combiner exchange — the standard eval summary for the
    curation classifiers, exact-integer e6:

        prec_e6 = 10⁶·tp // (tp + fp)     (0 when the class is never
        rec_e6  = 10⁶·tp // (tp + fn)      predicted / never true)
        f1_e6   = 2·10⁶·tp // (2·tp + fp + fn)

    The confusion matrix is C² rows no matter the corpus size; the
    metric fold is Python-int exact. Classes = union of truth and
    predicted labels, sorted ASC.
    """
    from .relational import preagg_sum

    conf = preagg_sum(ds, [truth_col, pred_col], {},
                      counts="n").to_pandas()
    classes = sorted(set(conf[truth_col]) | set(conf[pred_col]))
    by_truth = conf.groupby(truth_col)["n"].sum().to_dict()
    by_pred = conf.groupby(pred_col)["n"].sum().to_dict()
    diag = conf[conf[truth_col] == conf[pred_col]] \
        .set_index(truth_col)["n"].to_dict()
    rows = []
    for c in classes:
        tp = int(diag.get(c, 0))
        fp = int(by_pred.get(c, 0)) - tp
        fn = int(by_truth.get(c, 0)) - tp
        prec = (1_000_000 * tp) // (tp + fp) if tp + fp else 0
        rec = (1_000_000 * tp) // (tp + fn) if tp + fn else 0
        f1 = (2_000_000 * tp) // (2 * tp + fp + fn) \
            if 2 * tp + fp + fn else 0
        rows.append({"label": c, "tp": tp, "fp": fp, "fn": fn,
                     "prec_e6": prec, "rec_e6": rec, "f1_e6": f1})
    out = pd.DataFrame(rows)
    for c in ("tp", "fp", "fn", "prec_e6", "rec_e6", "f1_e6"):
        out[c] = out[c].astype("int64")
    return out
