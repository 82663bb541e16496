"""High-level library API: the CLI's capabilities as importable functions.

The reference is script-only (run.py / inference.py must be executed; nothing
is importable without side effects — its config module creates directories at
import, config.py:60-61). Here the whole engine is a library:

    from movie_recommendation_engine_tpu import api, default_config

    cfg = default_config()
    cfg.data.source = "synthetic"
    engine = api.train(cfg)                     # -> Engine (trained)
    emb = engine.embeddings()                   # [num_movies, embed_dim]
    engine.evaluate()                           # HR@k / MRR dict
    engine.recommend(movie_id=3, k=10)          # ranked (movieId, title, score)
    engine.recommend(history=[3, 15, 40], k=10) # user-as-centroid query
    server = engine.serve()                     # BatchingRecommender
"""

from __future__ import annotations

import numpy as np

from .config import Config, default_config
from .core.logging import MetricsLogger


class Engine:
    """A loaded dataset + (optionally trained) model, exposing the
    evaluate / embed / recommend / serve surfaces programmatically."""

    def __init__(self, cfg: Config | None = None, logger: MetricsLogger | None = None):
        from .graph import dataset
        from .train.trainer import Trainer

        self.cfg = cfg or default_config()
        self.log = logger or MetricsLogger(pretty=False)
        self.data = dataset.load(self.cfg)
        self.trainer = Trainer(self.cfg, self.data, self.log)
        self._emb: np.ndarray | None = None

    # -- training / checkpoints ----------------------------------------------

    def fit(self, resume_from: str | None = None) -> dict:
        out = self.trainer.fit(resume_from=resume_from)
        self._emb = None  # embeddings are stale after training
        return out

    def load_checkpoint(self, path: str) -> "Engine":
        """Accepts this framework's .npz checkpoints or the reference's
        .pt files (utils/torch_import.py)."""
        if path.endswith(".pt"):
            from .utils.torch_import import load_torch_checkpoint

            self.trainer.params, _ = load_torch_checkpoint(path)
        else:
            self.trainer.load_checkpoint(path)
        self._emb = None
        return self

    def save_checkpoint(self, path: str) -> None:
        self.trainer.save_checkpoint(path)

    # -- inference -------------------------------------------------------------

    def embeddings(self, refresh: bool = False) -> np.ndarray:
        """[num_movies, embed_dim] L2-normalized item embeddings (cached)."""
        if self._emb is None or refresh:
            self._emb = np.asarray(self.trainer.movie_embeddings())
        return self._emb

    def evaluate(self, pairs: np.ndarray | None = None) -> dict:
        return self.trainer.evaluate(pairs)

    def recommend(self, movie_id: int | None = None,
                  history: list[int] | None = None, k: int = 10,
                  by_index: bool = False) -> list[dict]:
        """Top-k similar items for one movieId or a watch history
        (external movieIds unless ``by_index``). Exact search; build a
        server via ``serve()`` for batched / ANN retrieval."""
        emb = self.embeddings()
        lut = self.data.movie_id_to_idx()

        def to_idx(mid):
            i = int(mid) if by_index else lut.get(int(mid), -1)
            if not 0 <= i < emb.shape[0]:
                raise KeyError(f"unknown movie {mid}")
            return i

        if history:
            idxs = [to_idx(m) for m in history]
            q = emb[idxs].mean(axis=0)
            q /= max(float(np.linalg.norm(q)), 1e-12)
            exclude = set(idxs)
        elif movie_id is not None:
            qi = to_idx(movie_id)
            q, exclude = emb[qi], {qi}
        else:
            raise ValueError("pass movie_id or history")

        sims = emb @ q
        order = np.argsort(-sims)
        out = []
        for i in order:
            if int(i) in exclude:
                continue
            out.append({
                "movieId": int(self.data.movie_ids[i]),
                "title": self.data.titles[i],
                "genres": self.data.genres[i],
                "score": float(sims[i]),
            })
            if len(out) == k:
                break
        return out

    def serve(self, method: str | None = None, **kw):
        """BatchingRecommender over the current embeddings
        (retrieval/server.py); caller owns close()."""
        from .retrieval.server import BatchingRecommender

        return BatchingRecommender(
            self.embeddings(), method=method or self.cfg.search.search_method,
            cfg=self.cfg, max_batch=self.cfg.serve.max_batch,
            max_wait_ms=self.cfg.serve.max_wait_ms,
            max_k=self.cfg.serve.max_k, **kw,
        )


def train(cfg: Config | None = None, resume_from: str | None = None) -> Engine:
    """Load data per ``cfg``, train to completion, return the Engine."""
    eng = Engine(cfg)
    eng.fit(resume_from=resume_from)
    return eng


def load(cfg: Config | None = None, checkpoint: str | None = None) -> Engine:
    """Engine without training (fresh params, or a checkpoint if given)."""
    eng = Engine(cfg)
    if checkpoint:
        eng.load_checkpoint(checkpoint)
    return eng
