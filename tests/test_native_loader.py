"""Native (C++) input-pipeline tests: build, correctness vs the Python
batcher, shuffling, multi-epoch, ragged batches, and training integration."""

import numpy as np
import pytest

from recommenders_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.native_available(),
    reason="g++ toolchain unavailable",
)


def _data(n=1000, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "a": rng.randint(0, 100, size=n).astype(np.int32),
        "b": rng.normal(size=(n, 7)).astype(np.float32),
        "c": rng.randint(0, 2, size=(n, 3, 2)).astype(np.int64),
    }


def test_unshuffled_single_thread_matches_python():
    data = _data(257)
    batcher = native_loader.NativeBatcher(
        data, batch_size=64, shuffle=False, num_threads=1
    )
    batches = list(batcher())
    assert [b["a"].shape[0] for b in batches] == [64, 64, 64, 64, 1]
    recon = {
        k: np.concatenate([b[k] for b in batches]) for k in data
    }
    for k in data:
        np.testing.assert_array_equal(recon[k], data[k])


def test_multithreaded_covers_every_row_exactly_once():
    data = _data(10_000, seed=1)
    batcher = native_loader.NativeBatcher(
        data, batch_size=128, shuffle=True, seed=7, num_threads=4
    )
    seen = np.concatenate([b["a"] for b in batcher()])
    assert seen.shape[0] == 10_000
    np.testing.assert_array_equal(np.sort(seen), np.sort(data["a"]))


def test_rows_stay_aligned_across_columns():
    data = _data(5000, seed=2)
    # Make b a function of a so misaligned gathers are detectable.
    data["b"] = np.repeat(
        data["a"].astype(np.float32)[:, None], 7, axis=1
    )
    batcher = native_loader.NativeBatcher(
        data, batch_size=256, shuffle=True, seed=3, num_threads=4
    )
    for batch in batcher():
        np.testing.assert_array_equal(
            batch["b"][:, 0].astype(np.int32), batch["a"]
        )


def test_epochs_reshuffle():
    data = _data(512, seed=3)
    batcher = native_loader.NativeBatcher(
        data, batch_size=512, shuffle=True, seed=0, num_threads=1
    )
    e1 = next(iter(batcher()))["a"]
    e2 = next(iter(batcher()))["a"]
    assert not np.array_equal(e1, e2)
    np.testing.assert_array_equal(np.sort(e1), np.sort(e2))


def test_drop_remainder():
    data = _data(130)
    batcher = native_loader.NativeBatcher(
        data, batch_size=64, drop_remainder=True, num_threads=2
    )
    sizes = [b["a"].shape[0] for b in batcher()]
    assert sorted(sizes) == [64, 64]


def test_mismatched_rows_raises():
    with pytest.raises(ValueError, match="leading dimension"):
        native_loader.NativeBatcher(
            {"a": np.zeros(10), "b": np.zeros(11)}, batch_size=4
        )


def test_trains_a_model_end_to_end():
    import jax
    import optax

    from recommenders_tpu import data as data_lib
    from recommenders_tpu import models as models_lib

    ds = data_lib.synthetic_movielens(
        num_users=100, num_movies=150, num_interactions=8000, seed=4
    )
    model = models_lib.TwoTowerRetrieval(
        query_tower=lambda: models_lib.EmbeddingTower(100, 16),
        candidate_tower=lambda: models_lib.EmbeddingTower(150, 16),
        query_key="user_id",
        candidate_key="movie_id",
    )
    trainer = models_lib.Trainer(model, optax.adagrad(0.1))
    batcher = native_loader.NativeBatcher(
        ds.as_dict(), batch_size=256, shuffle=True, seed=5,
        drop_remainder=True,
    )
    sample = next(iter(batcher()))
    state = trainer.init(jax.random.PRNGKey(0), sample)
    state, history = trainer.fit(state, batcher, epochs=2, verbose=False)
    losses = [e["loss"] for e in history["epochs"]]
    assert losses[-1] < losses[0]
