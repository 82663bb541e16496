"""Ordering experiment for block-sparse pooling: how much pooling mass do
different node orderings keep inside each row-block's top ``max_blocks``
column blocks?

Round-2 finding (.runs/pool59kAB.log): the feature-k-means ordering keeps
only ~64% of mass at 59k (dropped 0.36 >> the 0.05 fallback cap), so
pool_impl=block fell back to gather. Hypothesis: the mass leak is the
heavy-tailed popularity hubs — every row block needs the blockbuster
columns, which k-means scatters across genre clusters. This probe compares:

  feature   — cluster_permutation on content features (current impl)
  hub+feat  — top (hub_blocks*bs) columns by pooling mass first, k-means tail
  mass      — plain column-mass descending order (no clustering)
  identity  — no reordering (baseline)

Runs fully on CPU (jax_platforms=cpu): synthetic data -> real walk tables ->
host-side mass accounting only (no device pooling).

Usage: python scripts/block_order_probe.py [--movies 16000] [--ratings 2000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dropped_mass(nbrs, weights, perm, limit, bs=512, bmax=32,
                 hub_head: int = 0, cs: int | None = None):
    """Fraction of pooling weight outside each row-block's top-bmax column
    blocks under ordering ``perm`` (mirrors build_block_pool's accounting).
    ``hub_head``: that many leading blocks are force-kept for every row
    block (consuming hub_head of the bmax slots). ``cs``: column block size
    (defaults to bs — the current square tiling)."""
    n, k = nbrs.shape
    cs = cs or bs
    pos = np.empty(n, np.int64)
    pos[perm] = np.arange(n)
    valid = nbrs < limit
    w = np.where(valid, weights, 0.0)
    wsum = w.sum(axis=1, keepdims=True)
    w = np.where(wsum > 0, w / np.maximum(wsum, 1e-12), 0.0)
    r_blocks = -(-n // bs)
    ncb = -(-n // cs)
    bmax_eff = min(bmax, ncb)
    rb = (pos[np.arange(n)] // bs)[:, None].repeat(k, axis=1)
    cb = pos[np.clip(nbrs, 0, n - 1)] // cs
    mass = np.zeros((r_blocks, ncb), np.float32)
    np.add.at(mass, (rb.reshape(-1), cb.reshape(-1)), w.reshape(-1))
    if hub_head:
        # Hub blocks always kept: give them infinite selection priority.
        sel_mass = mass.copy()
        sel_mass[:, :hub_head] = np.inf
    else:
        sel_mass = mass
    if bmax_eff < ncb:
        top = np.argpartition(-sel_mass, bmax_eff - 1, axis=1)[:, :bmax_eff]
        kept = np.take_along_axis(mass, top, axis=1).sum()
    else:
        kept = mass.sum()
    total = mass.sum()
    return 1.0 - kept / max(total, 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--movies", type=int, default=16_000)
    ap.add_argument("--users", type=int, default=44_000)
    ap.add_argument("--ratings", type=int, default=2_000_000)
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--bmax", type=int, default=32)
    ap.add_argument("--hub-blocks", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--num-walks", type=int, default=100)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from movie_recommendation_engine_tpu import default_config
    from movie_recommendation_engine_tpu.graph import dataset
    from movie_recommendation_engine_tpu.sampling import random_walk as rw
    from movie_recommendation_engine_tpu.ops import block_sparse as bsp

    cfg = default_config()
    cfg.data.source = "synthetic"
    cfg.data.use_data_subset = False
    cfg.data.synthetic_num_movies = args.movies
    cfg.data.synthetic_num_users = args.users
    cfg.data.synthetic_num_ratings = args.ratings
    cfg.walk.num_walks = args.num_walks

    t0 = time.time()
    data = dataset.load(cfg)
    csr = data.build_bipartite_graph()
    g = rw.device_graph(csr)
    n_iters = rw.search_iters(csr)
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    tables = rw.all_node_neighborhood_tables(
        g, jax.random.PRNGKey(0), 1, cfg.walk.num_walks,
        cfg.walk.walk_length, cfg.walk.num_neighbors, n_iters,
        num_nodes=data.num_movies, restrict_below=data.num_movies)
    nbrs, weights = (np.asarray(tables[0][0]), np.asarray(tables[0][1]))
    print(f"walk tables {time.time()-t0:.1f}s", flush=True)

    from movie_recommendation_engine_tpu.graph import features as feat_mod

    n = data.num_movies
    feats = np.asarray(feat_mod.extract_movie_features(
        data.titles, data.genres, data.movie_tags,
        feature_dim=cfg.features.feature_dim,
        genre_weight=cfg.features.genre_weight,
        year_norm=cfg.features.year_norm,
        title_tfidf_max=cfg.features.title_tfidf_max_features,
        title_tfidf_min_df=cfg.features.title_tfidf_min_df,
        tag_tfidf_max=cfg.features.tag_tfidf_max_features,
        tag_tfidf_min_df=cfg.features.tag_tfidf_min_df,
        seed=cfg.train.seed,
        standardize=cfg.features.standardize,
    ))[:n]

    # Column pooling mass (the hub signal).
    valid = nbrs < n
    w = np.where(valid, weights, 0.0)
    wsum = w.sum(axis=1, keepdims=True)
    wn = np.where(wsum > 0, w / np.maximum(wsum, 1e-12), 0.0)
    col_mass = np.bincount(np.clip(nbrs, 0, n - 1).reshape(-1),
                           weights=wn.reshape(-1), minlength=n)

    results = {}
    results["identity"] = dropped_mass(nbrs, weights, np.arange(n), n,
                                       args.bs, args.bmax)
    mass_perm = np.argsort(-col_mass, kind="stable")
    results["mass"] = dropped_mass(nbrs, weights, mass_perm, n,
                                   args.bs, args.bmax)
    # Rectangular tiles: same kept area (bmax*cs constant), finer columns.
    for cs in (256, 128, 64):
        results[f"mass cs{cs}"] = dropped_mass(
            nbrs, weights, mass_perm, n, args.bs,
            args.bmax * (args.bs // cs), cs=cs)
    t0 = time.time()
    perm_f = bsp.cluster_permutation(feats, seed=0)
    results["feature"] = dropped_mass(nbrs, weights, perm_f, n,
                                      args.bs, args.bmax)
    print(f"feature k-means {time.time()-t0:.1f}s", flush=True)

    for hb in args.hub_blocks:
        hub_n = hb * args.bs
        hubs = np.argsort(-col_mass, kind="stable")[:hub_n]
        rest_mask = np.ones(n, bool)
        rest_mask[hubs] = False
        rest = np.flatnonzero(rest_mask)
        perm_rest = bsp.cluster_permutation(feats[rest], seed=0)
        perm = np.concatenate([hubs, rest[perm_rest]]).astype(np.int32)
        results[f"hub{hb}+feature"] = dropped_mass(
            nbrs, weights, perm, n, args.bs, args.bmax, hub_head=hb)

        # Hub-fingerprint tail clustering: represent each tail movie by its
        # pooling weight onto the top-F hubs (true co-visitation similarity,
        # no content features involved), k-means + greedy chain on that.
        F = min(128, hub_n)
        top_f = hubs[:F]
        colpos = np.full(n, -1, np.int64)
        colpos[top_f] = np.arange(F)
        fp = np.zeros((n, F), np.float32)
        hit = colpos[np.clip(nbrs, 0, n - 1)]
        ok = (hit >= 0) & valid
        np.add.at(fp, (np.repeat(np.arange(n), nbrs.shape[1])[ok.reshape(-1)],
                       hit[ok]), wn[ok])
        fp /= np.maximum(np.linalg.norm(fp, axis=1, keepdims=True), 1e-9)
        perm_rest2 = bsp.cluster_permutation(fp[rest], seed=0)
        perm2 = np.concatenate([hubs, rest[perm_rest2]]).astype(np.int32)
        results[f"hub{hb}+hubfp"] = dropped_mass(
            nbrs, weights, perm2, n, args.bs, args.bmax, hub_head=hb)

    # Dense-head + per-row sparse residual factorization: keep ALL entries
    # whose column is in the top-H mass head (dense [N, H] slab on the MXU)
    # plus each row's top-R heaviest non-head neighbors (gather form).
    order_cols = np.argsort(-col_mass, kind="stable")
    for H in (2048, 4096, 8192):
        head = np.zeros(n, bool)
        head[order_cols[:min(H, n)]] = True
        in_head = head[np.clip(nbrs, 0, n - 1)] & valid
        w_head = np.where(in_head, wn, 0.0).sum()
        w_tail = np.where(~in_head & valid, wn, 0.0)
        for R in (4, 8, 16):
            part = np.sort(w_tail, axis=1)[:, -R:].sum()
            kept = (w_head + part) / max(wn.sum(), 1e-12)
            results[f"head{H}+top{R}"] = 1.0 - kept

    for tag, d in results.items():
        print(f"{tag:>16}: dropped_mass={d:.4f}")


if __name__ == "__main__":
    main()
