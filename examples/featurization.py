"""Featurization: turning raw features into tower inputs.

Counterpart of `docs/examples/featurization.ipynb`: every preprocessing
technique the reference tutorial teaches, rebuilt TPU-native —

  * string ids -> dense ids        (`StringLookup`  -> data.vocab)
  * id hashing into buckets        (`Hashing`       -> ops.hashing)
  * continuous standardization     (`Normalization` -> preprocessing.Normalizer)
  * timestamp bucketing            (`Discretization`-> preprocessing.Discretizer)
  * title text -> pooled embedding (`TextVectorization` +
                                    `GlobalAveragePooling1D`
                                    -> preprocessing.TextVectorizer + masked_mean)

Adaptation runs on host (JAX has no strings); the Normalizer/Discretizer
transforms run *inside* the jitted towers. The assembled features feed a
two-tower retrieval model end to end.
"""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import data, models
from recommenders_tpu.data import preprocessing as pp
from recommenders_tpu.data import vocab as vocab_lib
from recommenders_tpu.ops import hashing

TITLE_WORDS = (
    "star galaxy night return empire dark knight lost city of the "
    "last great secret garden river king queen storm golden shadow "
    "summer winter dream stone fire ice crown legend journey"
).split()


def synthetic_titles(num_movies: int) -> list:
    """Deterministic 2-4 word 'titles', one per movie id."""
    rng = np.random.RandomState(99)
    titles = []
    for _ in range(num_movies):
        n = rng.randint(2, 5)
        words = rng.choice(TITLE_WORDS, size=n, replace=False)
        titles.append(" ".join(words).title() + "!")
    return titles


class QueryTower(nn.Module):
    """User id + device-side normalized/discretized timestamp."""

    num_users: int
    normalizer: pp.Normalizer
    discretizer: pp.Discretizer
    dim: int = 32

    @nn.compact
    def __call__(self, inputs):
        ts = inputs["timestamp"]
        x = jnp.concatenate(
            [
                nn.Embed(self.num_users, self.dim)(inputs["user_id"]),
                nn.Embed(self.discretizer.num_bins, self.dim // 2)(
                    self.discretizer(ts)
                ),
                self.normalizer(ts)[..., None],
            ],
            axis=-1,
        )
        return nn.Dense(self.dim)(nn.relu(nn.Dense(64)(x)))


class CandidateTower(nn.Module):
    """Hashed movie id + mean-pooled title-token embedding."""

    num_hash_bins: int
    title_vocab_size: int
    dim: int = 32

    @nn.compact
    def __call__(self, inputs):
        bucket = hashing.hash_bucket(
            inputs["movie_id"], self.num_hash_bins, salt=7
        )
        tokens = inputs["title_tokens"]
        token_emb = nn.Embed(self.title_vocab_size, self.dim)(tokens)
        x = jnp.concatenate(
            [
                nn.Embed(self.num_hash_bins, self.dim)(bucket),
                pp.masked_mean(token_emb, tokens),
            ],
            axis=-1,
        )
        return nn.Dense(self.dim)(nn.relu(nn.Dense(64)(x)))


def main(epochs: int = 3):
    train, _ = data.synthetic_movielens().split(0.8)

    # --- Host-side adaptation (the Keras `adapt()` step). ---
    user_vocab = vocab_lib.build_vocabulary(
        [f"user_{u}" for u in train.user_ids]
    )
    normalizer = pp.Normalizer.adapt(train.timestamps)
    discretizer = pp.Discretizer.adapt(train.timestamps, num_bins=100)
    titles = synthetic_titles(train.num_movies)
    vectorizer = pp.TextVectorizer.adapt(titles, max_tokens=64)
    title_tokens = vectorizer(titles, sequence_length=4)  # [M, 4]
    print(
        f"adapted: {user_vocab.size} users, "
        f"{discretizer.num_bins} time buckets, "
        f"{vectorizer.vocab_size} title tokens"
    )

    batch_inputs = {
        "user_id": user_vocab.encode(
            [f"user_{u}" for u in train.user_ids]
        ),
        "movie_id": train.movie_ids,
        "timestamp": train.timestamps,
        "title_tokens": title_tokens[train.movie_ids],  # [n, 4]
    }

    model = models.TwoTowerRetrieval(
        query_tower=lambda: QueryTower(
            num_users=user_vocab.size,
            normalizer=normalizer,
            discretizer=discretizer,
        ),
        candidate_tower=lambda: CandidateTower(
            num_hash_bins=2048,
            title_vocab_size=vectorizer.vocab_size,
        ),
        query_key=("user_id", "timestamp"),
        candidate_key=("movie_id", "title_tokens"),
        batch_metric_ks=(10, 100),
    )
    trainer = models.Trainer(model, optax.adagrad(0.3))
    batcher = data.batched(batch_inputs, 8192, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, history = trainer.fit(state, batcher, epochs=epochs)
    final = history["epochs"][-1]
    print(
        "batch top-100 accuracy with featurized towers: "
        f"{final['batch_top_100_categorical_accuracy']:.4f}"
    )


if __name__ == "__main__":
    main()
