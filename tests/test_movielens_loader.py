"""Real-MovieLens file-format loader tests (synthetic files; the round-1
environment has no network access)."""

import numpy as np

from recommenders_tpu import data as data_lib


def test_load_ml100k_format(tmp_path):
    p = tmp_path / "u.data"
    p.write_text("1\t10\t4.0\t888\n2\t20\t3.0\t999\n1\t20\t5.0\t777\n")
    ds = data_lib.load_movielens(str(p))
    np.testing.assert_array_equal(ds.user_ids, [0, 1, 0])
    np.testing.assert_array_equal(ds.movie_ids, [9, 19, 19])
    np.testing.assert_allclose(ds.ratings, [4.0, 3.0, 5.0])
    assert ds.num_users == 2 and ds.num_movies == 20
    # Container interops with the rest of the stack.
    train, test = ds.split(0.67)
    assert len(train) + len(test) == 3


def test_load_ml1m_format(tmp_path):
    p = tmp_path / "ratings.dat"
    p.write_text("5::7::4::123\n6::8::2::456\n")
    ds = data_lib.load_movielens(str(p), num_users=100, num_movies=100)
    np.testing.assert_array_equal(ds.user_ids, [4, 5])
    np.testing.assert_array_equal(ds.movie_ids, [6, 7])
    assert ds.num_users == 100
