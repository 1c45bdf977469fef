"""Single-node pandas/numpy reference implementations ("the oracle").

Every distributed operator in modlyn_spark is verified against these with
numpy.allclose per entity x timestamp (BASELINE.json north_rule). They mirror
the reference's semantics precisely:

- label encoding sorts classes lexicographically like sklearn.LabelEncoder
  (reference: modlyn/models/_simple_logreg_datamodule.py:85-88);
- features are float32 on input, accumulated in float64
  (reference densifies to float32: _simple_logreg_datamodule.py:94);
- the logreg trainer reproduces torch Adam + softmax cross-entropy exactly
  (reference: modlyn/models/_simple_logreg_model.py:70-83,105-108);
- the Jaccard evaluator mirrors modlyn/eval/_jaccard.py:25-82 including the
  pandas nlargest tie semantics and the analytic random baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# temporal operators
# ---------------------------------------------------------------------------


def oracle_asof(
    left: pd.DataFrame,
    right: pd.DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    allow_exact_matches: bool = True,
    tolerance: pd.Timedelta | None = None,
) -> pd.DataFrame:
    on = [on] if isinstance(on, str) else list(on)
    l = left.copy().reset_index(drop=True)
    l["__ord"] = np.arange(len(l))
    if right.empty:
        out = l.drop(columns=["__ord"])
        for c in payload:
            out[c] = None
        return out
    r = right[on + [right_ts] + payload].copy()
    rname = right_ts if right_ts not in l.columns else "__rts"
    r = r.rename(columns={right_ts: rname})
    l = l.sort_values(left_ts, kind="mergesort")
    r = r.sort_values(rname, kind="mergesort")
    merged = pd.merge_asof(
        l,
        r,
        left_on=left_ts,
        right_on=rname,
        by=on,
        direction="backward",
        allow_exact_matches=allow_exact_matches,
        tolerance=tolerance,
    )
    merged = merged.sort_values("__ord").drop(
        columns=["__ord"] + ([rname] if rname != left_ts else [])
    )
    return merged.reset_index(drop=True)


def oracle_lag_lead(
    df: pd.DataFrame, key: str, ts: str, col: str, k: int = 1
) -> pd.DataFrame:
    out = df.sort_values([key, ts], kind="mergesort").copy()
    g = out.groupby(key, sort=False)[col]
    out[f"{col}_lag{k}"] = g.shift(k)
    out[f"{col}_lead{k}"] = g.shift(-k)
    out[f"{col}_delta{k}"] = out[col] - out[f"{col}_lag{k}"]
    return out


def oracle_hamming(a: pd.Series, b: pd.Series) -> pd.Series:
    x = a.astype("Int64").astype(object)
    y = b.astype("Int64").astype(object)

    def ham(u, v):
        if pd.isna(u) or pd.isna(v):
            return None
        return bin((int(u) ^ int(v)) & 0xFFFFFFFFFFFFFFFF).count("1")

    return pd.Series([ham(u, v) for u, v in zip(x, y)], index=a.index)


def oracle_sessionize(
    df: pd.DataFrame, key: str, ts: str, gap_seconds: int
) -> pd.DataFrame:
    out = df.sort_values([key, ts], kind="mergesort").copy()
    prev = out.groupby(key, sort=False)[ts].shift(1)
    gap = (out[ts] - prev).dt.total_seconds()
    flag = (gap.isna() | (gap > gap_seconds)).astype(int)
    out["session_id"] = flag.groupby(out[key], sort=False).cumsum() - 1
    return out


def oracle_backfill(df: pd.DataFrame, key: str, ts: str, col: str) -> pd.DataFrame:
    out = df.sort_values([key, ts], kind="mergesort").copy()
    out[f"{col}_ffill"] = out.groupby(key, sort=False)[col].ffill()
    return out


def oracle_rolling_stats(
    df: pd.DataFrame, key: str, ts: str, col: str, n_rows: int
) -> pd.DataFrame:
    out = df.sort_values([key, ts], kind="mergesort").copy()
    g = out.groupby(key, sort=False)[col]
    r = g.rolling(n_rows, min_periods=1)
    out[f"{col}_roll_count"] = r.count().values
    out[f"{col}_roll_mean"] = r.mean().values
    out[f"{col}_roll_min"] = r.min().values
    out[f"{col}_roll_max"] = r.max().values
    out[f"{col}_roll_var"] = r.var(ddof=0).fillna(0.0).values
    return out


# ---------------------------------------------------------------------------
# scoring: per-class per-feature stats, F-statistic, logreg
# ---------------------------------------------------------------------------


def encode_labels(labels: pd.Series) -> tuple[list, np.ndarray]:
    """sklearn.LabelEncoder parity: classes sorted ascending, dense codes.

    (reference fits LabelEncoder on train labels:
    modlyn/models/_simple_logreg_datamodule.py:85-88; class order recovered
    via classes_ at _simple_logreg_model.py:175)
    """
    classes = sorted(pd.unique(labels))
    lut = {c: i for i, c in enumerate(classes)}
    return classes, labels.map(lut).to_numpy(dtype=np.int64)


def oracle_class_feature_stats(
    X: np.ndarray, labels: pd.Series
) -> pd.DataFrame:
    """Long-form (label, feature_pos, n, mean, var_pop) per class x feature."""
    classes, y = encode_labels(labels)
    X = X.astype(np.float64)
    rows = []
    for i, c in enumerate(classes):
        sub = X[y == i]
        rows.append(
            pd.DataFrame(
                {
                    "label": c,
                    "pos": np.arange(X.shape[1]),
                    "n": len(sub),
                    "mean": sub.mean(axis=0),
                    "var_pop": sub.var(axis=0),
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def oracle_f_statistic(X: np.ndarray, labels: pd.Series) -> pd.DataFrame:
    """One-way ANOVA F statistic per feature (scanpy rank_genes_groups-style
    mean/variance scoring — SURVEY.md N2). Between-group mean square over
    within-group mean square, ddof-corrected like scipy.stats.f_oneway."""
    classes, y = encode_labels(labels)
    X = X.astype(np.float64)
    n, d = X.shape
    k = len(classes)
    grand = X.mean(axis=0)
    ss_between = np.zeros(d)
    ss_within = np.zeros(d)
    for i in range(k):
        sub = X[y == i]
        m = sub.mean(axis=0)
        ss_between += len(sub) * (m - grand) ** 2
        ss_within += ((sub - m) ** 2).sum(axis=0)
    ms_between = ss_between / (k - 1)
    ms_within = ss_within / (n - k)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = np.where(ms_within > 0, ms_between / ms_within, np.inf)
    return pd.DataFrame({"pos": np.arange(d), "f_stat": f})


def softmax_xent_grad(
    W: np.ndarray, b: np.ndarray, X: np.ndarray, y: np.ndarray
) -> tuple[float, np.ndarray, np.ndarray]:
    """Mean softmax cross-entropy loss + gradients wrt W (k,d) and b (k)."""
    logits = X @ W.T + b
    logits -= logits.max(axis=1, keepdims=True)
    e = np.exp(logits)
    p = e / e.sum(axis=1, keepdims=True)
    n = len(X)
    loss = -np.log(np.clip(p[np.arange(n), y], 1e-30, None)).mean()
    p[np.arange(n), y] -= 1.0
    p /= n
    return loss, p.T @ X, p.sum(axis=0)


class AdamState:
    """torch.optim.Adam parity (L2 weight decay added to the gradient, not
    AdamW): m/v moments with bias correction, defaults beta=(0.9,0.999),
    eps=1e-8 (reference optimizer: modlyn/models/_simple_logreg_model.py:105-108)."""

    def __init__(self, shape, lr, weight_decay, betas=(0.9, 0.999), eps=1e-8):
        self.m = np.zeros(shape)
        self.v = np.zeros(shape)
        self.t = 0
        self.lr, self.wd, self.betas, self.eps = lr, weight_decay, betas, eps

    def step(self, param: np.ndarray, grad: np.ndarray) -> np.ndarray:
        self.t += 1
        g = grad + self.wd * param
        b1, b2 = self.betas
        self.m = b1 * self.m + (1 - b1) * g
        self.v = b2 * self.v + (1 - b2) * g * g
        mh = self.m / (1 - b1**self.t)
        vh = self.v / (1 - b2**self.t)
        return param - self.lr * mh / (np.sqrt(vh) + self.eps)


def oracle_logreg(
    X: np.ndarray,
    labels: pd.Series,
    batch_ids: np.ndarray,
    *,
    lr: float = 1e-2,
    weight_decay: float = 1e-2,
    max_steps: int = 50,
    n_epochs: int = 1,
) -> tuple[pd.DataFrame, list[float]]:
    """Deterministic mini-batch logistic regression (the reference scoring
    inner loop, modlyn/models/_simple_logreg_model.py:70-83): W,b init at 0,
    batches taken in increasing batch_id order, float64 math throughout.

    Returns (weights long-form DataFrame (label, pos, weight), losses).
    """
    classes, y = encode_labels(labels)
    X = X.astype(np.float64)
    d, k = X.shape[1], len(classes)
    W = np.zeros((k, d))
    b = np.zeros(k)
    optW = AdamState(W.shape, lr, weight_decay)
    optb = AdamState(b.shape, lr, weight_decay)
    losses: list[float] = []
    step = 0
    n_batches = int(batch_ids.max()) + 1
    for _ in range(n_epochs):
        for bid in range(n_batches):
            if step >= max_steps:
                break
            mask = batch_ids == bid
            if not mask.any():
                continue
            loss, gW, gb = softmax_xent_grad(W, b, X[mask], y[mask])
            W = optW.step(W, gW)
            b = optb.step(b, gb)
            losses.append(loss)
            step += 1
    rows = []
    for i, c in enumerate(classes):
        rows.append(pd.DataFrame({"label": c, "pos": np.arange(d), "weight": W[i]}))
    return pd.concat(rows, ignore_index=True), losses


# ---------------------------------------------------------------------------
# evaluation: top-N Jaccard (reference: modlyn/eval/_jaccard.py:25-82)
# ---------------------------------------------------------------------------


def oracle_jaccard(
    dataframes: list[pd.DataFrame], n_top_values: list[int] | None = None
) -> pd.DataFrame:
    """Pandas parity port of CompareScores.compute_jaccard_comparison semantics
    (wide score matrices in, long results out), without the plotting."""
    from itertools import combinations

    if n_top_values is None:
        n_top_values = [25, 50, 100, 200]
    method_names = [df.attrs["method_name"] for df in dataframes]
    common_genes = sorted(set.intersection(*[set(df.columns) for df in dataframes]))
    common_cells = sorted(set.intersection(*[set(df.index) for df in dataframes]))
    n_genes = len(common_genes)
    dfs = [df.loc[common_cells, common_genes] for df in dataframes]
    results = []
    for n_top in n_top_values:
        for cell in common_cells:
            tops = {
                name: set(df.loc[cell].abs().nlargest(n_top).index)
                for df, name in zip(dfs, method_names)
            }
            for m1, m2 in combinations(method_names, 2):
                inter = len(tops[m1] & tops[m2])
                union = len(tops[m1] | tops[m2])
                results.append(
                    {
                        "cell_line": cell,
                        "n_top": n_top,
                        "method_pair": f"{m1}<->{m2}",
                        "jaccard": inter / union if union else 0,
                    }
                )
    for n_top in n_top_values:
        rj = 1.0 if n_top >= n_genes else (2 * n_top) / (2 * n_genes - n_top)
        results.append(
            {"n_top": n_top, "method_pair": "Random baseline", "jaccard": rj}
        )
    return pd.DataFrame(results)


def oracle_wilcoxon(X: np.ndarray, labels: pd.Series) -> pd.DataFrame:
    """Wilcoxon rank-sum z-scores per (class, feature), class vs rest —
    average ranks for ties, tie-corrected variance, no continuity
    correction (scanpy rank_genes_groups(method="wilcoxon", tie_correct=
    True) semantics). Pure numpy; cross-checked against
    scipy.stats.mannwhitneyu in tests when scipy is importable."""
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    classes = sorted(pd.unique(labels))
    rows = []
    for j in range(d):
        v = X[:, j]
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(n, dtype=np.float64)
        ranks[order] = np.arange(1, n + 1)
        # average ranks over tie groups + tie term sum(t^3 - t)
        sv = v[order]
        tie_sum = 0.0
        i = 0
        while i < n:
            k = i
            while k + 1 < n and sv[k + 1] == sv[i]:
                k += 1
            t = k - i + 1
            if t > 1:
                avg = (i + 1 + k + 1) / 2.0
                ranks[order[i : k + 1]] = avg
                tie_sum += t**3 - t
            i = k + 1
        for c in classes:
            m = (labels == c).to_numpy()
            n1 = int(m.sum())
            n2 = n - n1
            r = float(ranks[m].sum())
            mu = n1 * (n + 1) / 2.0
            var = n1 * n2 / 12.0 * ((n + 1) - tie_sum / (n * (n - 1.0)))
            z = (r - mu) / np.sqrt(var) if var > 0 else 0.0
            rows.append({"label": str(c), "pos": j, "n1": n1,
                         "rank_sum": r, "z": z})
    return pd.DataFrame(rows)


def oracle_kmeans(
    X: np.ndarray,
    k: int,
    *,
    max_iter: int = 10,
    sample: int = 4096,
    seed: int = 42,
    tol: float = 1e-6,
    ids: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """Single-node Lloyd's twin of operators.clustering.kmeans_fit: same
    seeded init pool (with ``ids``: the ``sample`` rows with the smallest
    md5(str(id)), mirroring the engine's md5-ordered unbiased sample;
    without: first rows), same distance algebra, same stopping rule.
    Returns (centroids, assignments, inertia history)."""
    import hashlib

    X = np.asarray(X, dtype=np.float64)
    rng = np.random.default_rng(seed)
    if ids is not None:
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        order = np.argsort(np.array(keys), kind="stable")
        pool = X[order[:sample]]
    else:
        pool = X[:sample]
    C = pool[rng.choice(len(pool), size=min(k, len(pool)), replace=False)].copy()
    history: list[float] = []
    for _ in range(max_iter):
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        a = d.argmin(axis=1)
        inertia = float((d[np.arange(len(X)), a] + (X * X).sum(axis=1)).sum())
        history.append(inertia)
        newC = C.copy()
        for j in range(k):
            m = a == j
            if m.any():
                newC[j] = X[m].mean(axis=0)
        move = float(np.abs(newC - C).max())
        C = newC
        if move <= tol:
            break
    d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
    return C, d.argmin(axis=1), history


def oracle_pq_train(
    X: np.ndarray,
    m: int,
    k: int,
    *,
    max_iter: int = 10,
    sample: int = 4096,
    seed: int = 42,
    tol: float = 1e-6,
    ids: np.ndarray | None = None,
) -> np.ndarray:
    """Single-node twin of operators.pq.pq_train: same md5-ordered init
    pool, same per-subspace rng draw sequence, same distance algebra and
    stopping rule. Returns codebooks (m, k, dim//m)."""
    import hashlib

    X = np.asarray(X, dtype=np.float64)
    if ids is not None:
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        order = np.argsort(np.array(keys), kind="stable")
        pool = X[order[:sample]]
    else:
        pool = X[:sample]
    rng = np.random.default_rng(seed)
    k = min(k, len(pool))
    dim = X.shape[1]
    dsub = dim // m
    C = np.empty((m, k, dsub))
    for j in range(m):
        idx = rng.choice(len(pool), size=k, replace=False)
        C[j] = pool[idx, j * dsub : (j + 1) * dsub]
    Xs = X.reshape(len(X), m, dsub)
    for _ in range(max_iter):
        newC = C.copy()
        for j in range(m):
            d = -2.0 * (Xs[:, j] @ C[j].T) + (C[j] * C[j]).sum(axis=1)[None]
            a = d.argmin(axis=1)
            for c in range(k):
                msk = a == c
                if msk.any():
                    newC[j, c] = Xs[msk, j].mean(axis=0)
        move = float(np.abs(newC - C).max())
        C = newC
        if move <= tol:
            break
    return C


def oracle_isotonic(
    scores: np.ndarray, labels: np.ndarray, *, precision: int | None = None
) -> pd.DataFrame:
    """Independent twin of scoring.metrics.isotonic_fit: O(B^2)
    pool-first-violator PAV (a genuinely different pooling order — the
    isotonic solution is unique, so results agree) over the pandas
    distinct-score histogram. Returns (block, score_lo, score_hi,
    p_cal, n)."""
    s = np.asarray(scores, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    if precision is not None:
        s = np.round(s, precision)
    h = (
        pd.DataFrame({"s": s, "y": y})
        .groupby("s")
        .agg(n=("y", "size"), p=("y", "mean"))
        .reset_index()
        .sort_values("s")
    )
    blocks = [
        [i, i, float(p), float(n)]
        for i, (p, n) in enumerate(zip(h["p"], h["n"]))
    ]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][2] > blocks[i + 1][2]:
                lo, _, v1, w1 = blocks[i]
                _, hi, v2, w2 = blocks[i + 1]
                blocks[i : i + 2] = [
                    [lo, hi, (v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2]
                ]
                changed = True
                break
    sc = h["s"].to_numpy()
    return pd.DataFrame(
        {
            "block": np.arange(len(blocks), dtype=np.int64),
            "score_lo": [sc[b[0]] for b in blocks],
            "score_hi": [sc[b[1]] for b in blocks],
            "p_cal": [b[2] for b in blocks],
            "n": np.asarray([b[3] for b in blocks], dtype=np.int64),
        }
    )


def oracle_repetition(
    texts: list,
    line_delim: str = "\n",
    para_delim: str = "\n\n",
) -> pd.DataFrame:
    """Independent plain-Python twin of functions.repetition: dict/loop
    implementation (no numpy coding tricks) of the Gopher Table A1
    repetition signals, one row per input text."""
    from collections import Counter

    import re

    def dup_fracs(units: list[str]) -> tuple[float, float]:
        if not units:
            return 0.0, 0.0
        c = Counter(units)
        dups = [u for u in units if c[u] >= 2]
        total = sum(len(u) for u in units)
        return (
            len(dups) / len(units),
            (sum(len(u) for u in dups) / total) if total else 0.0,
        )

    rows = []
    for t in texts:
        t = "" if t is None or (isinstance(t, float) and pd.isna(t)) else str(t)
        lines = [l for l in t.split(line_delim) if l.strip()]
        paras = [p for p in t.split(para_delim) if p.strip()]
        dlf, dlcf = dup_fracs(lines)
        dpf, dpcf = dup_fracs(paras)
        words = [w for w in re.split(r"\s+", t.lower()) if w]
        total = sum(len(w) for w in words)
        row = {
            "dup_line_frac": dlf,
            "dup_line_char_frac": dlcf,
            "dup_para_frac": dpf,
            "dup_para_char_frac": dpcf,
        }
        for n in (2, 3, 4):
            key = f"top_{n}gram_char_frac"
            if total == 0 or len(words) < n:
                row[key] = 0.0
                continue
            grams = [tuple(words[i : i + n]) for i in range(len(words) - n + 1)]
            c = Counter(grams)
            best = min(g for g, k in c.items() if k == max(c.values()))
            row[key] = min(1.0, c[best] * sum(len(w) for w in best) / total)
        for n in (5, 6, 7, 8, 9, 10):
            key = f"dup_{n}gram_char_frac"
            if total == 0 or len(words) < n:
                row[key] = 0.0
                continue
            grams = [tuple(words[i : i + n]) for i in range(len(words) - n + 1)]
            c = Counter(grams)
            covered = set()
            for i, g in enumerate(grams):
                if c[g] >= 2:
                    covered.update(range(i, i + n))
            row[key] = sum(len(words[i]) for i in covered) / total
        rows.append(row)
    return pd.DataFrame(rows, dtype="float64")


def oracle_bpe(
    texts, num_merges: int, min_word_count: int = 1
) -> pd.DataFrame:
    """Single-node BPE-training twin of operators/bpe.py (reference
    algorithm: Sennrich, Haddow & Birch, ACL'16 — learn_bpe over word
    frequencies): plain dict/Counter implementation, same tokenizer
    ([a-z0-9]+ on lowercased text), same end-of-word marker, same
    deterministic tie-break (count DESC, then lexicographic pair).
    Returns (rank, left, right)."""
    import re
    from collections import Counter

    word_re = re.compile(r"[a-z0-9]+")
    wc: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        wc.update(word_re.findall(str(t).lower()))
    vocab = {
        tuple(list(w) + ["</w>"]): c
        for w, c in wc.items()
        if c >= min_word_count
    }
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return pd.DataFrame(
        {
            "rank": range(len(merges)),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
        }
    )


def oracle_hashed_features(
    texts: "pd.Series", dim: int, ngrams: tuple[int, ...] = (1, 2)
) -> np.ndarray:
    """Single-node twin of operators/quality_classifier.hashed_ngram_features:
    lowercase [a-z0-9]+ word tokens, space-joined n-grams, portable md5
    slot hash (first 15 hex digits % dim), tf = count / total grams."""
    import hashlib
    import re

    tok = re.compile(r"[a-z0-9]+")
    X = np.zeros((len(texts), dim), dtype=np.float64)
    for r, t in enumerate(texts):
        if not isinstance(t, str) or not t:
            continue
        toks = tok.findall(t.lower())
        total = 0
        for n in ngrams:
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                slot = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim
                X[r, slot] += 1.0
                total += 1
        if total:
            X[r] /= total
    return X


def oracle_image_features(px: "np.ndarray") -> dict:
    """Independent twin of functions.image_features.pixel_features:
    np.roll-based Laplacian, dot-product luma, np.unique entropy,
    moment-form variances — a different formulation of every feature
    (reference gate for the image_features fixture)."""
    a = np.asarray(px, dtype=np.float64)
    if a.ndim == 3:
        luma = a @ np.array([0.299, 0.587, 0.114])
    else:
        luma = a
    h, w = luma.shape
    n = luma.size
    mu = luma.sum() / n
    var = (luma * luma).sum() / n - mu * mu
    out = {"brightness": mu, "contrast": float(np.sqrt(max(var, 0.0)))}
    if h >= 3 and w >= 3:
        lap = 4.0 * luma - (
            np.roll(luma, 1, 0) + np.roll(luma, -1, 0)
            + np.roll(luma, 1, 1) + np.roll(luma, -1, 1)
        )
        inner = lap[1:-1, 1:-1]
        out["blur_var"] = float(inner.var())
    else:
        out["blur_var"] = None
    gx = np.abs(luma[:, 1:] - luma[:, :-1]).mean() if w >= 2 else 0.0
    gy = np.abs(luma[1:, :] - luma[:-1, :]).mean() if h >= 2 else 0.0
    out["grad_energy"] = float(gx + gy)
    if a.ndim == 3:
        i64 = np.asarray(px, dtype=np.int64)
        ibin = (i64 @ np.array([299, 587, 114], dtype=np.int64)) // 1000
    else:
        ibin = np.asarray(px, dtype=np.int64)
    vals, counts = np.unique(ibin, return_counts=True)
    p = counts.astype(np.float64) / n
    out["entropy_bits"] = float(-(p * np.log2(p)).sum())
    if a.ndim == 3:
        rg = a[..., 0] - a[..., 1]
        yb = (a[..., 0] + a[..., 1]) / 2.0 - a[..., 2]
        out["colorfulness"] = float(
            np.sqrt(rg.var() + yb.var())
            + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
        )
    else:
        out["colorfulness"] = 0.0
    return out


def oracle_patch_features(px: "np.ndarray", patch: int) -> list[dict]:
    """Independent twin of functions.patches.extract_patches
    (mode='features'): per-tile luma stats via EXPLICIT slicing loops and
    two-pass moments — no reshape/transpose tricks shared with the
    engine. Luma is the same exact-integer contract
    (299R + 587G + 114B) // 1000 (the one piece that MUST be shared for
    bit-identical binning). Returns [] when the image is smaller than
    one patch."""
    a = np.asarray(px, dtype=np.int64)
    if a.ndim == 3:
        luma = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
    else:
        luma = a
    h, w = luma.shape
    out: list[dict] = []
    for r in range(h // patch):
        for c in range(w // patch):
            tile = luma[
                r * patch : (r + 1) * patch, c * patch : (c + 1) * patch
            ].astype(np.float64)
            mu = float(tile.mean())
            out.append(
                {
                    "patch_row": r,
                    "patch_col": c,
                    "p_mean": mu,
                    "p_std": float(np.sqrt(((tile - mu) ** 2).mean())),
                    "p_min": float(tile.min()),
                    "p_max": float(tile.max()),
                }
            )
    return out
