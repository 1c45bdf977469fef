"""Generate DuckDB-readable oracle fixtures for the two driver queries whose
expected outputs are not directly SQL-expressible:

- ``logreg_weights``: iterative Adam training. The expected weights are
  recomputed from the sf0.01 embeddings table by the INDEPENDENT numpy
  implementation (modlyn_spark.oracle.pandas_oracle.oracle_logreg — torch-
  parity Adam, float64, deterministic md5 batching replicated with hashlib),
  NOT by the Spark engine under test.

- ``image_pipeline``: the synthetic image source is a pure function of
  (image_id, version), so the expected per-request features are recomputed
  single-node with pandas groupby/shift + pd.merge_asof (oracle_asof /
  oracle_hamming) — again independent of every Spark operator involved.

The driver's oracle_sql() entries read these parquet files via
read_parquet() and round exactly like the Spark queries do. Regenerate with:

    python scripts/make_oracle_fixtures.py

Fixtures change only when the input tables (sf0.01) or the query
definitions change; the script is deterministic.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures"
)
SF_GATE = "/root/testdata/sf0.01"  # the driver's correctness SF


def make_logreg_fixture() -> str:
    """Expected (label, pos, weight) for q_logreg_weights at sf0.01:
    8 steps over 4 md5 batches (2 epochs), lr/wd defaults."""
    from modlyn_spark.oracle.pandas_oracle import oracle_logreg
    from modlyn_spark.scoring.logreg import assign_batches_pandas

    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].astype(str)
    batch_ids = assign_batches_pandas(emb, ["vec_id"], 4)
    weights, _ = oracle_logreg(
        X, labels, batch_ids, max_steps=8, n_epochs=4
    )
    out = os.path.join(FIXTURE_DIR, "logreg_weights_sf001.parquet")
    weights.astype({"pos": "int64"}).to_parquet(out, index=False)
    return out


def make_logreg_steps5_fixture() -> str:
    """Expected weights for q_early_termination (reference M6,
    _simple_logreg_model.py:120-123,162-167): IDENTICAL config to the
    logreg_weights fixture except max_steps=5, so the run stops
    mid-epoch-2 — the gate proves the step bound actually binds (weights
    differ from the 8-step fixture) and matches the independent twin at
    the truncated step count."""
    from modlyn_spark.oracle.pandas_oracle import oracle_logreg
    from modlyn_spark.scoring.logreg import assign_batches_pandas

    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].astype(str)
    batch_ids = assign_batches_pandas(emb, ["vec_id"], 4)
    weights, _ = oracle_logreg(
        X, labels, batch_ids, max_steps=5, n_epochs=4
    )
    out = os.path.join(FIXTURE_DIR, "logreg_weights_steps5_sf001.parquet")
    weights.astype({"pos": "int64"}).to_parquet(out, index=False)
    return out


def make_regpath_fixture() -> str:
    """Expected (lam, label, pos, weight) for q_regpath_weights at sf0.01:
    the INDEPENDENT numpy twin run ONCE PER LAMBDA (L separate single-model
    trainings), concatenated — the engine under test trains all lambdas in
    one fused sweep, so equality here proves the fusion changes nothing."""
    from modlyn_spark.oracle.pandas_oracle import oracle_logreg
    from modlyn_spark.scoring.logreg import assign_batches_pandas

    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].astype(str)
    batch_ids = assign_batches_pandas(emb, ["vec_id"], 4)
    frames = []
    for lam in (0.001, 0.01, 0.1, 1.0):
        weights, _ = oracle_logreg(
            X, labels, batch_ids, weight_decay=lam, max_steps=8, n_epochs=4
        )
        frames.append(weights.assign(lam=float(lam)))
    out_pdf = pd.concat(frames, ignore_index=True)[
        ["lam", "label", "pos", "weight"]
    ].astype({"pos": "int64"})
    out = os.path.join(FIXTURE_DIR, "regpath_weights_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_ridge_fixture() -> str:
    """Expected (pos, beta, t_stat) for q_ridge_tstats at sf0.01: the
    direct single-node closed form — dense design matrix assembled in
    one numpy block (a different accumulation association than the
    engine's per-partition Gram partials), alpha=1.0, unpenalized
    intercept, sandwich covariance t-stats."""
    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet")
    emb = emb[emb["embedding"].notna() & emb["label"].notna()]
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    y = emb["label"].to_numpy(dtype=np.float64)
    A = np.hstack([np.ones((len(X), 1)), X])
    m = A.shape[1]
    G = A.T @ A
    c = A.T @ y
    Dm = np.eye(m)
    Dm[0, 0] = 0.0
    alpha = 1.0
    beta = np.linalg.solve(G + alpha * Dm, c)
    rss = float(y @ y - 2.0 * beta @ c + beta @ G @ beta)
    sigma2 = max(rss, 0.0) / (len(X) - m)
    Ainv = np.linalg.inv(G + alpha * Dm)
    cov = sigma2 * (Ainv @ G @ Ainv)
    t = beta / np.sqrt(np.diag(cov))
    out_pdf = pd.DataFrame(
        {
            "pos": np.arange(m, dtype=np.int64) - 1,
            "beta": np.round(beta, 6),
            "t_stat": np.round(t, 4),
        }
    )
    out = os.path.join(FIXTURE_DIR, "ridge_tstats_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_cv_fixture() -> str:
    """Expected (fold, label, pos, weight) for q_cv_weights at sf0.01:
    the INDEPENDENT numpy twin run once PER FOLD on the fold-filtered
    rows (salted-md5 folds, unsalted-md5 batches — both replicated with
    hashlib), concatenated. The engine trains all folds in one fused
    pass; equality proves the mask fusion reproduces F standalone runs."""
    from modlyn_spark.oracle.pandas_oracle import oracle_logreg
    from modlyn_spark.scoring.cv import assign_folds_pandas
    from modlyn_spark.scoring.logreg import assign_batches_pandas

    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].astype(str)
    batch_ids = assign_batches_pandas(emb, ["vec_id"], 4)
    fold_ids = assign_folds_pandas(emb, ["vec_id"], 3)
    frames = []
    for f in range(3):
        keep = fold_ids != f
        weights, _ = oracle_logreg(
            X[keep], labels[keep], batch_ids[keep], max_steps=8, n_epochs=4
        )
        frames.append(weights.assign(fold=np.int64(f)))
    out_pdf = pd.concat(frames, ignore_index=True)[
        ["fold", "label", "pos", "weight"]
    ].astype({"pos": "int64", "fold": "int64"})
    out = os.path.join(FIXTURE_DIR, "cv_weights_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_mrmr_fixture() -> str:
    """Expected (rank, pos, relevance, redundancy, score) for
    q_mrmr_selection at sf0.01: single-node twin — joint histograms
    accumulated per pair with bincount over the full table (one block,
    vs the engine's per-partition tensors), then the same greedy MID
    loop re-implemented inline."""
    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet")
    emb = emb[emb["embedding"].notna() & emb["label"].notna()]
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].astype(str).to_numpy()
    bins = 10
    n, d = X.shape
    mn, mx = X.min(axis=0), X.max(axis=0)
    w = np.where(mx > mn, (mx - mn) / bins, 1.0)
    B = np.clip(np.floor((X - mn) / w).astype(np.int64), 0, bins - 1)

    def mi_of(a_idx: np.ndarray, ka: int, b_idx: np.ndarray, kb: int) -> float:
        t = np.bincount(a_idx * kb + b_idx, minlength=ka * kb).reshape(ka, kb)
        p = t / n
        pi, pj = p.sum(axis=1), p.sum(axis=0)
        with np.errstate(invalid="ignore", divide="ignore"):
            terms = np.where(t > 0, p * np.log(p / np.outer(pi, pj)), 0.0)
        return max(float(terms.sum()), 0.0)

    classes = sorted(set(labels.tolist()))
    y = np.array([classes.index(v) for v in labels])
    rel = {j: mi_of(y, len(classes), B[:, j], bins) for j in range(d)}
    red = np.zeros((d, d))
    for i in range(d):
        for j in range(i + 1, d):
            red[i, j] = red[j, i] = mi_of(B[:, i], bins, B[:, j], bins)
    sel, rem, rows = [], list(range(d)), []
    for rank in range(10):
        scored = []
        for p in rem:
            r = float(np.mean([red[p, s] for s in sel])) if sel else 0.0
            scored.append((rel[p] - r, -p, p, r))
        sc, _, p, r = max(scored)
        rows.append(
            {
                "rank": rank,
                "pos": p,
                "relevance": round(rel[p], 6),
                "redundancy": round(r, 6),
                "score": round(sc, 6),
            }
        )
        sel.append(p)
        rem.remove(p)
    out_pdf = pd.DataFrame(rows).astype({"rank": "int64", "pos": "int64"})
    out = os.path.join(FIXTURE_DIR, "mrmr_selection_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_image_pipeline_fixture() -> str:
    """Expected (image_id, label, f_phash_hamming, f_version, f_age_sec)
    for q_image_pipeline (50 entities, hot_every=25, hot_factor=10)."""
    from modlyn_spark.oracle.pandas_oracle import oracle_asof, oracle_hamming
    from modlyn_spark.sources.images import (
        generate_images_pandas,
        synth_feature_requests,
    )

    images = generate_images_pandas(50, hot_every=25, hot_factor=10)
    requests = synth_feature_requests(images)

    st = images.sort_values(["image_id", "ts"], kind="mergesort").copy()
    # nullable Int64 BEFORE the shift: plain int64 shift() promotes to
    # float64 and silently corrupts 64-bit hashes (53-bit mantissa)
    ph = st["phash"].astype("Int64")
    lag = ph.groupby(st["image_id"], sort=False).shift(1)
    st["phash_hamming"] = (
        oracle_hamming(ph, lag).astype("float64").fillna(0.0)
    )
    st["state_ts"] = st["ts"]
    st["version_f"] = st["version"].astype("float64")

    joined = oracle_asof(
        requests,
        st[["image_id", "ts", "phash_hamming", "version_f", "state_ts"]],
        on="image_id",
        left_ts="feature_ts",
        right_ts="ts",
        payload=["phash_hamming", "version_f", "state_ts"],
    )
    age = (joined["feature_ts"] - joined["state_ts"]).dt.total_seconds()
    out_pdf = pd.DataFrame(
        {
            "image_id": joined["image_id"],
            "label": joined["label"],
            "f_phash_hamming": joined["phash_hamming"].fillna(-1.0),
            "f_version": joined["version_f"].fillna(-1.0),
            "f_age_sec": age.fillna(-1.0),
        }
    )
    out = os.path.join(FIXTURE_DIR, "image_pipeline_expected.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_kmeans_fixture() -> str:
    """Expected (vec_id, cluster, sq_dist) for q_kmeans_clusters at
    sf0.01: single-node Lloyd's twin (oracle_kmeans), k=4, max_iter=8."""
    from modlyn_spark.oracle.pandas_oracle import oracle_kmeans

    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C, a, _ = oracle_kmeans(X, 4, max_iter=8, ids=emb["vec_id"].to_numpy())
    d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
    sq = d[np.arange(len(X)), a] + (X * X).sum(axis=1)
    out_pdf = pd.DataFrame(
        {
            "vec_id": emb["vec_id"].to_numpy(),
            "cluster": a.astype("int32"),
            "sq_dist": sq,
        }
    )
    out = os.path.join(FIXTURE_DIR, "kmeans_clusters_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_pq_codebooks() -> str:
    """PQ codebook ARTIFACT (subspace, code, centroid) — an input
    constant for q_pq_encode / q_pq_topk (like the quality-classifier
    weights), so those queries are pure functions of (table, artifact)
    and hold at EVERY SF. Trained once by the single-node twin
    (oracle_pq_train) on the gate-SF embeddings: m=8, k=16, max_iter=8,
    seed 42, md5-ordered init pool."""
    from modlyn_spark.operators.pq import codebooks_to_df
    from modlyn_spark.oracle.pandas_oracle import oracle_pq_train

    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = oracle_pq_train(
        X, 8, 16, max_iter=8, ids=emb["vec_id"].to_numpy()
    )
    out = os.path.join(FIXTURE_DIR, "pq_codebooks.parquet")
    codebooks_to_df(C).to_parquet(out, index=False)
    return out


def make_isotonic_fixture() -> str:
    """Expected PAV block table for q_isotonic_fit at the gate SF:
    independent O(B^2) pool-first-violator twin (oracle_isotonic),
    score = round(embedding[0] + 0.5, 3), event = label 0."""
    from modlyn_spark.oracle.pandas_oracle import oracle_isotonic

    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet")
    emb = emb[emb["embedding"].notna() & emb["label"].notna()]
    s = np.stack(emb["embedding"].to_numpy())[:, 0].astype(np.float64) + 0.5
    y = (emb["label"].to_numpy() == 0).astype(np.int64)
    out_pdf = oracle_isotonic(s, y, precision=3)
    out = os.path.join(FIXTURE_DIR, "isotonic_blocks_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_maha_fixture() -> str:
    """Expected (vec_id, maha_sq) for q_maha_outliers at the gate SF:
    independent numpy twin of scoring.outliers.mahalanobis_scores
    (population moments, ridge 1e-9), rounded like the query."""
    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet")
    emb = emb[emb["embedding"].notna()].sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / len(X)
    P = np.linalg.inv(cov + 1e-9 * np.eye(X.shape[1]))
    Z = X - mu
    out_pdf = pd.DataFrame(
        {
            "vec_id": emb["vec_id"].to_numpy(),
            "maha_sq": np.round(((Z @ P) * Z).sum(axis=1), 3),
        }
    )
    out = os.path.join(FIXTURE_DIR, "maha_outliers_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_pca_fixture() -> str:
    """Expected (vec_id, p0..p3) projections for the retired pca_projection
    query at sf0.01: single-node numpy twin of operators/pca.py's moment
    path (same accumulation formula — xtx/sum in float64, cov =
    (xtx - n*outer(mean))/(n-1), symmetrized eigh, sign-fixed components;
    test_pca separately proves this equals the textbook np.cov twin to
    allclose). Engine-vs-fixture equality at round(3) is the gate."""
    emb = pd.read_parquet(f"{SF_GATE}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n = len(X)
    s = X.sum(axis=0)
    xtx = X.T @ X
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    comps = evecs[:, order].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    proj = (X - mean) @ comps.T
    out_pdf = pd.DataFrame(
        {
            "vec_id": emb["vec_id"].to_numpy(),
            **{f"p{i}": proj[:, i] for i in range(4)},
        }
    )
    out = os.path.join(FIXTURE_DIR, "pca_projection_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def make_bpe_fixture() -> str:
    """Expected (rank, left, right) merge table for the retired
    bpe_merges query at sf0.01: the single-node Sennrich twin
    (oracle_bpe) over the documents' texts, 40 merges. Integer counts +
    deterministic tie-break make the distributed trainer's table
    bit-identical."""
    from modlyn_spark.oracle.pandas_oracle import oracle_bpe

    docs = pd.read_parquet(f"{SF_GATE}/documents.parquet")
    merges = oracle_bpe(docs["text"].tolist(), 40)
    out = os.path.join(FIXTURE_DIR, "bpe_merges_sf001.parquet")
    merges.astype({"rank": "int64"}).to_parquet(out, index=False)
    return out


def make_quality_classifier_fixture() -> str:
    """Expected (label, pos, weight) for q_quality_classifier at sf0.01:
    hashed (1,2)-gram features (dim 256, portable md5 slots) -> the same
    independent numpy Adam twin as logreg_weights, predicting ``lang``."""
    from modlyn_spark.oracle.pandas_oracle import (
        oracle_hashed_features,
        oracle_logreg,
    )
    from modlyn_spark.scoring.logreg import assign_batches_pandas

    docs = pd.read_parquet(f"{SF_GATE}/documents.parquet")
    X = oracle_hashed_features(docs["text"], 256)
    labels = docs["lang"].astype(str)
    batch_ids = assign_batches_pandas(docs, ["doc_id"], 4)
    weights, _ = oracle_logreg(X, labels, batch_ids, max_steps=8, n_epochs=4)
    out = os.path.join(FIXTURE_DIR, "quality_classifier_sf001.parquet")
    weights.astype({"pos": "int64"}).to_parquet(out, index=False)
    return out


def make_images_curation_input() -> str:
    """Fixture INPUT table for the image-curation gate (not an expected
    output): the deterministic synthetic image-state table plus planted
    curation targets — exact-byte clones, phash near-twins within hamming
    4, and invalid rows for every gate. Both engines READ this same
    parquet (the pattern predictions/classification_report use for the
    weights fixture), so the row is valid at every SF and the oracle is
    real SQL, not a precomputed answer."""
    from modlyn_spark.sources.images import generate_images_pandas

    base = generate_images_pandas(60, hot_every=25, hot_factor=10)
    # the generator's average-hash phashes over tiny synthetic checkers are
    # heavily degenerate (130 exact-equal latest-state pairs at n=60) — a
    # radius-4 prune would eat most of the corpus and hide the planted
    # structure. The curation operator's contract takes phash as a
    # PRECOMPUTED upstream column, so the fixture re-keys it with a spread
    # 63-bit md5 hash per entity (expected pairwise distance ~31.5, no
    # natural pair within radius); the planted twins below then control
    # the entire near-dup structure.
    import hashlib

    def spread_phash(image_id: str) -> np.int64:
        h = int(hashlib.md5(f"{image_id}|ph".encode()).hexdigest()[:16], 16)
        return np.int64(h >> 1)

    base["phash"] = base["image_id"].map(spread_phash)
    latest = (
        base.sort_values(["image_id", "ts", "version"])
        .groupby("image_id", as_index=False)
        .tail(1)
        .reset_index(drop=True)
    )
    planted = []
    # exact-byte clones of 10 entities' latest state; ids sort AFTER all
    # base ids so the min-id keep rule retains the base row
    for j in range(10):
        r = latest.iloc[j].copy()
        r["image_id"] = f"zdup_{j:04d}"
        planted.append(r)
    # phash near-twins (distinct bytes, same declared w/h): popcount of
    # the planted flip mask cycles 1..4 — all within the radius-4 prune
    masks = [0x1, 0x3, 0x7, 0xF]
    for j in range(10):
        r = latest.iloc[10 + j].copy()
        r["image_id"] = f"zpht_{j:04d}"
        r["phash"] = np.int64(np.uint64(np.int64(r["phash"])) ^ np.uint64(masks[j % 4]))
        r["bytes"] = bytes(r["bytes"]) + b"\x00pad"
        planted.append(r)
    # invalid rows, one per gate
    bad = latest.iloc[30].copy()
    for j, (field, value) in enumerate(
        [
            ("w", 4),                      # side too small
            ("h", 100000),                 # side too large
            ("fmt", "bmp"),                # unsupported format
            ("caption", "x"),              # caption under 3 tokens
            ("caption", None),             # null caption
            ("bytes", None),               # null payload
        ]
    ):
        r = bad.copy()
        r["image_id"] = f"zbad_{j:04d}"
        r[field] = value
        if field != "bytes":
            # distinct payload so the exact-dedup stage doesn't eat it
            # before the gate under test gets to reject it
            r["bytes"] = bytes(r["bytes"]) + b"\x00bad" + bytes([j])
        planted.append(r)
    out_df = pd.concat([base, pd.DataFrame(planted)], ignore_index=True)
    out_df["w"] = out_df["w"].astype("int32")
    out_df["h"] = out_df["h"].astype("int32")
    out_df["version"] = out_df["version"].astype("int64")
    # Spark cannot read TIMESTAMP(NANOS) parquet — write microseconds
    out_df["ts"] = out_df["ts"].astype("datetime64[us]")
    out = os.path.join(FIXTURE_DIR, "images_curation_input.parquet")
    out_df.to_parquet(out, index=False)
    return out


def make_image_features_fixture() -> str:
    """Expected quality-feature rows for q_image_features: the
    INDEPENDENT twin (oracle_image_features — np.roll Laplacian,
    dot-product luma, np.unique entropy) over every row of the
    images_curation_input fixture. Decode failures (bad fmt / NULL or
    corrupt bytes) become decode_ok=False rows with NULL features,
    mirroring the engine's row-not-failure contract."""
    from modlyn_spark.functions.image import decode_bytes
    from modlyn_spark.oracle.pandas_oracle import oracle_image_features

    src = pd.read_parquet(
        os.path.join(FIXTURE_DIR, "images_curation_input.parquet")
    )
    feats = ["brightness", "contrast", "blur_var", "grad_energy",
             "entropy_bits", "colorfulness"]
    recs = []
    for _, r in src.iterrows():
        rec = {
            "image_id": r["image_id"],
            "version": int(r["version"]),
            "decode_ok": False,
            **{k: None for k in feats},
        }
        try:
            if r["bytes"] is not None:
                px = decode_bytes(bytes(r["bytes"]), r["fmt"])
                o = oracle_image_features(px)
                rec.update(
                    {k: (None if o[k] is None else round(o[k], 4))
                     for k in feats}
                )
                rec["decode_ok"] = True
        except Exception:  # noqa: BLE001
            pass
        recs.append(rec)
    out_df = pd.DataFrame(recs)
    for k in feats:
        out_df[k] = out_df[k].astype("float64")
    out = os.path.join(FIXTURE_DIR, "image_features_expected.parquet")
    out_df.to_parquet(out, index=False)
    return out


def make_channel_stats_fixture() -> str:
    """Expected corpus per-channel constants for q_channel_stats: an
    INDEPENDENT accumulation (per-image two-pass numpy moments summed
    in PYTHON floats, channel loop outside the image loop — a different
    association order and formulation from the engine's per-batch
    vectorized partials). Grayscale planes replicate to all three
    channels; undecodable payloads count into the channel = -1 row."""
    from modlyn_spark.functions.image import decode_bytes

    src_pdf = pd.read_parquet(
        os.path.join(FIXTURE_DIR, "images_curation_input.parquet")
    )
    images, failed = [], 0
    for _, r in src_pdf.iterrows():
        try:
            if r["bytes"] is None:
                raise ValueError("null payload")
            px = decode_bytes(bytes(r["bytes"]), r["fmt"])
        except Exception:  # noqa: BLE001
            failed += 1
            continue
        a = np.asarray(px, dtype=np.float64)
        if a.ndim == 2:
            a = np.stack([a, a, a], axis=2)
        images.append(a)
    recs = []
    for c in range(3):
        n = 0
        s = 0.0
        ss = 0.0
        for a in images:
            plane = a[:, :, c].ravel()
            n += plane.size
            s += float(np.add.reduce(plane))
            ss += float(np.dot(plane, plane))
        mean = s / n
        var = max(0.0, ss / n - mean * mean)
        recs.append(
            {"channel": c, "n_pixels": n,
             "mean": round(mean, 6), "std": round(var ** 0.5, 6)}
        )
    recs.append(
        {"channel": -1, "n_pixels": failed, "mean": None, "std": None}
    )
    out_df = pd.DataFrame(recs)
    out_df["mean"] = out_df["mean"].astype("float64")
    out_df["std"] = out_df["std"].astype("float64")
    out = os.path.join(FIXTURE_DIR, "channel_stats_expected.parquet")
    out_df.to_parquet(out, index=False)
    return out


def make_patch_features_fixture() -> str:
    """Expected per-patch rows for the image_patches query: the
    INDEPENDENT twin (oracle_patch_features — explicit slicing loops +
    two-pass moments) at patch=16 over every decodable row of the
    images_curation_input fixture. Undecodable / sub-patch payloads
    contribute zero rows, mirroring the engine contract."""
    from modlyn_spark.functions.image import decode_bytes
    from modlyn_spark.oracle.pandas_oracle import oracle_patch_features

    src = pd.read_parquet(
        os.path.join(FIXTURE_DIR, "images_curation_input.parquet")
    )
    recs = []
    for _, r in src.iterrows():
        if r["bytes"] is None or r["fmt"] is None:
            continue
        try:
            px = decode_bytes(bytes(r["bytes"]), r["fmt"])
        except Exception:  # noqa: BLE001
            continue
        for rec in oracle_patch_features(px, 16):
            recs.append(
                {
                    "image_id": r["image_id"],
                    "version": int(r["version"]),
                    "patch_row": rec["patch_row"],
                    "patch_col": rec["patch_col"],
                    # round at 8: every exact multiple of 2^-8 (patch
                    # means/stds over integer luma) has <= 8 decimal
                    # digits, so the boundary cases round as identity in
                    # BOTH python (banker's) and Spark (HALF_UP)
                    **{
                        k: round(rec[k], 8)
                        for k in ("p_mean", "p_std", "p_min", "p_max")
                    },
                }
            )
    out_df = pd.DataFrame(recs)
    for k in ("patch_row", "patch_col"):
        out_df[k] = out_df[k].astype("int64")
    for k in ("p_mean", "p_std", "p_min", "p_max"):
        out_df[k] = out_df[k].astype("float64")
    out = os.path.join(FIXTURE_DIR, "patch_features_expected.parquet")
    out_df.to_parquet(out, index=False)
    return out


def make_recurring_tiles_fixture() -> str:
    """Expected recurring-tile rows for the recurring_tiles query:
    hashlib md5 over each 8x8 exact-integer-luma tile (big-endian uint16
    serialization), counted per DISTINCT image in plain pandas — fully
    independent of the Spark operators. Latest image version only
    (matching the query), min_images=3."""
    import hashlib

    from modlyn_spark.functions.image import decode_bytes

    src = pd.read_parquet(
        os.path.join(FIXTURE_DIR, "images_curation_input.parquet")
    )
    src = src.sort_values("version").groupby("image_id", as_index=False).last()
    rows = []
    for _, r in src.iterrows():
        if r["bytes"] is None or r["fmt"] is None:
            continue
        try:
            px = decode_bytes(bytes(r["bytes"]), r["fmt"])
        except Exception:  # noqa: BLE001
            continue
        a = np.asarray(px, dtype=np.int64)
        lum = (
            (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
            if a.ndim == 3
            else a
        )
        h, w = lum.shape
        for pr in range(h // 8):
            for pc in range(w // 8):
                tile = lum[pr * 8:(pr + 1) * 8, pc * 8:(pc + 1) * 8]
                rows.append(
                    {
                        "image_id": r["image_id"],
                        "tile_fp": hashlib.md5(
                            tile.astype(">u2").tobytes()
                        ).hexdigest(),
                    }
                )
    t = pd.DataFrame(rows)
    agg = (
        t.groupby("tile_fp")
        .agg(
            n_images=("image_id", "nunique"),
            n_tiles=("image_id", "size"),
        )
        .reset_index()
    )
    agg = agg[agg["n_images"] >= 3].reset_index(drop=True)
    agg["n_images"] = agg["n_images"].astype("int64")
    agg["n_tiles"] = agg["n_tiles"].astype("int64")
    out = os.path.join(FIXTURE_DIR, "recurring_tiles_expected.parquet")
    agg.to_parquet(out, index=False)
    return out


def make_pagerank_fixture() -> str:
    """Expected (node, rank) for the retired pagerank_hosts query at the
    gate SF: dense float64 power iteration (independent of every Spark
    operator) over the deterministic slot-hash link graph — 3 out-links
    per doc, dst = md5(doc_id|j|'pr')[:15 hex] mod N, self-loops dropped,
    parallel edges deduped — 10 iterations, damping 0.85, uniform
    dangling redistribution, rounded like the query (round 6)."""
    import hashlib

    docs = pd.read_parquet(f"{SF_GATE}/documents.parquet")
    ids = np.sort(docs["doc_id"].to_numpy())
    n = len(ids)
    edges = set()
    for s in ids.tolist():
        for j in range(3):
            h = hashlib.md5(f"{s}|{j}|pr".encode()).hexdigest()
            d = int(h[:15], 16) % n
            if d != s:
                edges.add((s, d))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    deg = np.zeros(m)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.full(m, 1.0 / m)
    for _ in range(10):
        dm = r[deg == 0].sum()
        s = np.zeros(m)
        for u, v in edges:
            s[idx[v]] += r[idx[u]] / deg[idx[u]]
        r = 0.15 / m + 0.85 * (s + dm / m)
    out_pdf = pd.DataFrame({"node": nodes, "rank": np.round(r, 6)})
    out = os.path.join(FIXTURE_DIR, "pagerank_sf001.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


def main() -> int:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    p1 = make_logreg_fixture()
    print(f"wrote {p1}")
    p1b = make_logreg_steps5_fixture()
    print(f"wrote {p1b}")
    p1c = make_regpath_fixture()
    print(f"wrote {p1c}")
    p1d = make_ridge_fixture()
    print(f"wrote {p1d}")
    p1e = make_cv_fixture()
    print(f"wrote {p1e}")
    p1f = make_mrmr_fixture()
    print(f"wrote {p1f}")
    p2 = make_image_pipeline_fixture()
    print(f"wrote {p2} ({len(pd.read_parquet(p2))} rows)")
    p3 = make_kmeans_fixture()
    print(f"wrote {p3}")
    p4 = make_pca_fixture()
    print(f"wrote {p4}")
    p5 = make_bpe_fixture()
    print(f"wrote {p5}")
    p6 = make_images_curation_input()
    print(f"wrote {p6} ({len(pd.read_parquet(p6))} rows)")
    p7 = make_quality_classifier_fixture()
    print(f"wrote {p7}")
    p8 = make_image_features_fixture()
    print(f"wrote {p8} ({len(pd.read_parquet(p8))} rows)")
    p9 = make_pq_codebooks()
    print(f"wrote {p9} ({len(pd.read_parquet(p9))} rows)")
    p10 = make_isotonic_fixture()
    print(f"wrote {p10} ({len(pd.read_parquet(p10))} rows)")
    p11 = make_maha_fixture()
    print(f"wrote {p11} ({len(pd.read_parquet(p11))} rows)")
    p12 = make_pagerank_fixture()
    print(f"wrote {p12} ({len(pd.read_parquet(p12))} rows)")
    p13 = make_patch_features_fixture()
    print(f"wrote {p13} ({len(pd.read_parquet(p13))} rows)")
    p14 = make_recurring_tiles_fixture()
    print(f"wrote {p14} ({len(pd.read_parquet(p14))} rows)")
    p15 = make_channel_stats_fixture()
    print(f"wrote {p15} ({len(pd.read_parquet(p15))} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
