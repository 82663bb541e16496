"""Native CSV ingest extension tests (built with g++ on first use)."""

import numpy as np
import pytest

from movie_recommendation_engine_tpu.utils import ingest_native


@pytest.fixture(scope="module")
def ratings_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "ratings.csv"
    p.write_text(
        "userId,movieId,rating,timestamp\n"
        "1,296,5.0,1147880044\n"
        "1,306,3.5,1147868817\n"
        "2,5952,0.5,1141415528\n"
    )
    return str(p)


def test_parse_ratings(ratings_csv):
    try:
        u, m, r, t = ingest_native.read_ratings_csv(ratings_csv)
    except (FileNotFoundError, OSError, Exception) as e:
        pytest.skip(f"native toolchain unavailable: {e}")
    assert u.tolist() == [1, 1, 2]
    assert m.tolist() == [296, 306, 5952]
    np.testing.assert_allclose(r, [5.0, 3.5, 0.5])
    assert t.tolist() == [1147880044, 1147868817, 1141415528]


def test_parse_matches_pandas(ratings_csv):
    pd = pytest.importorskip("pandas")
    try:
        u, m, r, t = ingest_native.read_ratings_csv(ratings_csv)
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native toolchain unavailable: {e}")
    df = pd.read_csv(ratings_csv)
    np.testing.assert_array_equal(u, df["userId"].to_numpy(np.int32))
    np.testing.assert_array_equal(m, df["movieId"].to_numpy(np.int32))
    np.testing.assert_allclose(r, df["rating"].to_numpy(np.float32))
    np.testing.assert_array_equal(t, df["timestamp"].to_numpy(np.int64))


def test_no_trailing_newline(tmp_path):
    p = tmp_path / "r.csv"
    p.write_text("userId,movieId,rating,timestamp\n7,8,4.5,123")
    try:
        u, m, r, t = ingest_native.read_ratings_csv(str(p))
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native toolchain unavailable: {e}")
    assert u.tolist() == [7] and m.tolist() == [8]
    np.testing.assert_allclose(r, [4.5])
    assert t.tolist() == [123]


def test_multithreaded_parse_matches_serial(tmp_path):
    # >1MB so the MT path actually engages (below that it runs serially),
    # with malformed lines scattered to exercise count/write-pass agreement.
    rng = np.random.default_rng(0)
    n = 80_000
    rows = []
    for i in range(n):
        rows.append(f"{rng.integers(1, 10_000)},{rng.integers(1, 60_000)},"
                    f"{rng.integers(1, 10) * 0.5},{rng.integers(1e9, 2e9)}")
        if i % 997 == 0:
            rows.append("garbage line !!")
        if i % 1013 == 0:
            rows.append(f"{i},brokenrow")
    p = tmp_path / "big.csv"
    p.write_text("userId,movieId,rating,timestamp\n" + "\n".join(rows) + "\n")
    assert p.stat().st_size > (1 << 20)
    try:
        st = ingest_native.read_ratings_csv(str(p), num_threads=1)
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native toolchain unavailable: {e}")
    mt = ingest_native.read_ratings_csv(str(p), num_threads=7)
    assert st[0].shape[0] == n  # malformed rows skipped
    for a, b in zip(st, mt):
        np.testing.assert_array_equal(a, b)  # order preserved


def test_malformed_rows_skipped(tmp_path):
    """Rows with empty fields must be skipped (the pandas path yields NaN /
    errors; accepting them as zeros would silently diverge)."""
    p = tmp_path / "ratings.csv"
    p.write_text(
        "userId,movieId,rating,timestamp\n"
        "1,2,,123\n"          # empty rating
        "1,,3.5,123\n"        # empty movie
        "3,4,2.5,\n"          # empty timestamp
        "5,6,4.0,777\n"       # valid
    )
    try:
        u, m, r, t = ingest_native.read_ratings_csv(str(p))
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native toolchain unavailable: {e}")
    assert u.tolist() == [5]
    assert m.tolist() == [6]
    np.testing.assert_allclose(r, [4.0])
    assert t.tolist() == [777]


def test_mt_matches_serial(tmp_path):
    rng = np.random.default_rng(0)
    n = 60_000  # > 1 MiB of text, so num_threads=4 really splits the file
    rows = "\n".join(
        f"{rng.integers(1, 100)},{rng.integers(1, 500)},"
        f"{rng.integers(1, 10) * 0.5},{rng.integers(1, 10**9)}"
        for _ in range(n)
    )
    p = tmp_path / "ratings.csv"
    p.write_text("userId,movieId,rating,timestamp\n" + rows + "\n")
    try:
        serial = ingest_native.read_ratings_csv(str(p), num_threads=1)
        mt = ingest_native.read_ratings_csv(str(p), num_threads=4)
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native toolchain unavailable: {e}")
    for a, b in zip(serial, mt):
        np.testing.assert_array_equal(a, b)
