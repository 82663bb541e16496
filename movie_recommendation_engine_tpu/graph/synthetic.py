"""Synthetic MovieLens-shaped workload generator.

The reference assumes the real ML-25M CSVs on disk (``download_dataset.py``).
This environment has no network egress, so the framework ships a deterministic
generator producing the same *shape* of data — movies with genre/title/year
metadata, users with power-law activity, timestamped ratings, and tags — so
every pipeline stage (features, graph build, split, training, retrieval) can be
exercised and benchmarked at any scale without the files.

The generated interaction distribution is power-law on both sides (a few
blockbuster movies / power users), matching the structural properties that
make graph sampling interesting.
"""

from __future__ import annotations

import numpy as np

GENRES = [
    "Action", "Adventure", "Animation", "Children", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "IMAX",
    "Musical", "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]

_TITLE_WORDS = [
    "Midnight", "Return", "Shadow", "Garden", "Last", "First", "Lost", "City",
    "Dream", "Storm", "River", "Golden", "Silent", "Broken", "Hidden", "Iron",
    "Crimson", "Winter", "Summer", "Star", "Moon", "Fire", "Stone", "Glass",
    "Echo", "Paper", "Velvet", "Electric", "Neon", "Savage",
]


def generate(
    num_movies: int = 2000,
    num_users: int = 5000,
    num_ratings: int = 100_000,
    seed: int = 0,
    with_tags: bool = True,
) -> dict[str, np.ndarray | list[str]]:
    """Returns a dict with the columns the CSV loaders would produce:

    - movie_ids [M], titles [M] (with "(YYYY)" suffixes), genres [M] ('|'-joined)
    - rating_user_ids [R], rating_movie_ids [R], rating_values [R],
      rating_timestamps [R]
    - tag_user_ids / tag_movie_ids / tag_values (if with_tags)

    Raw ids are deliberately non-contiguous (movie ids stride 3, user ids
    stride 7) to exercise the id->index mapping paths
    (reference data/dataset.py:77-89).
    """
    rng = np.random.default_rng(seed)

    movie_ids = np.arange(1, num_movies + 1) * 3
    user_ids = np.arange(1, num_users + 1) * 7

    years = rng.integers(1930, 2020, size=num_movies)
    titles = []
    for i in range(num_movies):
        w = rng.choice(len(_TITLE_WORDS), size=2, replace=False)
        titles.append(
            f"{_TITLE_WORDS[w[0]]} {_TITLE_WORDS[w[1]]} {i} ({years[i]})"
        )
    genre_strs = []
    for i in range(num_movies):
        k = int(rng.integers(1, 4))
        gs = rng.choice(len(GENRES), size=k, replace=False)
        genre_strs.append("|".join(GENRES[g] for g in sorted(gs)))

    # Power-law popularity / activity (Zipf-ish via Pareto).
    movie_pop = rng.pareto(1.2, size=num_movies) + 1.0
    movie_pop /= movie_pop.sum()
    user_act = rng.pareto(1.2, size=num_users) + 1.0
    user_act /= user_act.sum()

    r_movie = rng.choice(num_movies, size=num_ratings, p=movie_pop)
    r_user = rng.choice(num_users, size=num_ratings, p=user_act)
    # Ratings in {0.5, 1.0, ..., 5.0} skewed positive like MovieLens.
    base = np.clip(rng.normal(3.5, 1.0, size=num_ratings), 0.5, 5.0)
    r_value = np.round(base * 2.0) / 2.0
    r_ts = rng.integers(8.0e8, 1.6e9, size=num_ratings)

    # Deduplicate (user, movie) pairs keeping the first occurrence, like real
    # MovieLens which has at most one rating per (user, movie).
    key = r_user.astype(np.int64) * num_movies + r_movie
    _, first = np.unique(key, return_index=True)
    first.sort()
    r_user, r_movie, r_value, r_ts = (
        r_user[first], r_movie[first], r_value[first], r_ts[first]
    )

    out: dict[str, np.ndarray | list[str]] = {
        "movie_ids": movie_ids,
        "titles": titles,
        "genres": genre_strs,
        "rating_user_ids": user_ids[r_user],
        "rating_movie_ids": movie_ids[r_movie],
        "rating_values": r_value.astype(np.float32),
        "rating_timestamps": r_ts.astype(np.int64),
    }

    if with_tags:
        num_tags = max(1, len(first) // 20)
        t_sel = rng.choice(len(first), size=num_tags, replace=False)
        tag_vocab = [w.lower() for w in _TITLE_WORDS] + [g.lower() for g in GENRES]
        out["tag_user_ids"] = out["rating_user_ids"][t_sel]
        out["tag_movie_ids"] = out["rating_movie_ids"][t_sel]
        out["tag_values"] = np.array(
            [tag_vocab[i] for i in rng.integers(0, len(tag_vocab), size=num_tags)]
        )
    return out
