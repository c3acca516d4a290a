"""The complete user journey, end to end, in one script.

Raw string-keyed interactions → vocabularies → native-threaded batching
→ two-tower training on a mesh → corpus-level FactorizedTopK evaluation
→ checkpoint save/restore → StableHLO serving export → standalone
serving queries decoded back to raw ids. Every subsystem a reference
(TFRS) user would touch, through this framework's public API.
"""

import tempfile

import numpy as np

import jax
import optax

from recommenders_tpu import data, metrics, models
from recommenders_tpu.data import vocab as vocab_lib
from recommenders_tpu.layers import factorized_top_k
from recommenders_tpu.utils import checkpoint as ckpt_lib
from recommenders_tpu.utils import export as export_lib


def main(epochs: int = 2):
    # 1. Raw data with string ids, as it would arrive from logs.
    ds = data.synthetic_movielens(num_interactions=60_000)
    raw = {
        "user": np.asarray([f"user_{u}" for u in ds.user_ids]),
        "movie": np.asarray([f"movie_{m}" for m in ds.movie_ids]),
    }

    # 2. Vocabularies (the Keras StringLookup adapt step).
    user_vocab = vocab_lib.build_vocabulary(raw["user"])
    movie_vocab = vocab_lib.build_vocabulary(raw["movie"])
    encoded = {
        "user_id": user_vocab.encode(raw["user"]).astype(np.int32),
        "movie_id": movie_vocab.encode(raw["movie"]).astype(np.int32),
    }
    print(
        f"vocabularies: {user_vocab.size} users, "
        f"{movie_vocab.size} movies"
    )

    # 3. Train with the native (C++) threaded batcher.
    model = models.TwoTowerRetrieval(
        query_tower=lambda: models.EmbeddingTower(user_vocab.size, 64),
        candidate_tower=lambda: models.EmbeddingTower(
            movie_vocab.size, 64
        ),
        query_key="user_id",
        candidate_key="movie_id",
    )
    trainer = models.Trainer(model, optax.adagrad(0.5))
    batcher = data.batched_native_or_python(
        encoded, 4096, shuffle=True, seed=0
    )
    state = trainer.init(jax.random.PRNGKey(0), next(iter(batcher())))
    state, _ = trainer.fit(state, batcher, epochs=epochs)

    # 4. Corpus-level evaluation.
    candidate_batch = {
        "movie_id": np.arange(movie_vocab.size, dtype=np.int32)
    }
    from recommenders_tpu.models import retrieval as retrieval_model

    results = retrieval_model.evaluate_with_corpus_metrics(
        trainer,
        state,
        data.batched(encoded, 4096),
        candidate_batch,
        ks=(10, 100),
    )
    for name, value in results.items():
        print(f"{name}: {value:.4f}")

    with tempfile.TemporaryDirectory() as tmp:
        # 5. Checkpoint round trip.
        ckpt_lib.save(f"{tmp}/ckpt", state)
        state = ckpt_lib.restore(f"{tmp}/ckpt", template=state)
        print("checkpoint restored")

        # 6. Serving export: index the corpus, serialize, reload, query.
        candidates = model.apply(
            {"params": state.params},
            candidate_batch,
            method="candidate_embeddings",
        )
        index = factorized_top_k.BruteForce(k=5).index(candidates)
        export_lib.export_index(
            f"{tmp}/serving", index,
            model.apply(
                {"params": state.params},
                {"user_id": np.asarray([1], np.int32)},
                method="query_embeddings",
            ),
            k=5,
        )
        serve = export_lib.load_index(f"{tmp}/serving")

        # 7. Standalone serving for a raw user id, decoded back.
        query_user = raw["user"][0]
        user_id = user_vocab.encode(np.asarray([query_user]))
        query_emb = model.apply(
            {"params": state.params},
            {"user_id": user_id.astype(np.int32)},
            method="query_embeddings",
        )
        scores, ids = serve(query_emb)
        recommended = movie_vocab.decode(np.asarray(ids)[0])
        print(f"recommendations for {query_user}: {list(recommended)}")


if __name__ == "__main__":
    main()
