"""AUC + unified-embedding quality head-to-head vs the actual reference.

Completes the ranking half of BASELINE.md's quality north star
("AUC/RMSE parity on ranking"), which `tools/reference_parity.py`
covers only for RMSE:

  1. **Prebuilt DLRM AUC** — the reference's
     `tfrs.experimental.models.Ranking` (with `PartialTPUEmbedding`,
     the exact configuration its own tests run on CPU,
     experimental/models/ranking_test.py:150-158) vs our prebuilt
     `models.ranking.Ranking`, trained on the SAME synthetic CTR
     interactions, compared on test AUC (the reference's default
     ranking metric, experimental/models/ranking.py:114-118).
  2. **Unified-embedding three-way study** — collisionless vs
     hash-trick vs UnifiedEmbedding, run in BOTH frameworks on shared
     data with heavy hash-collision pressure, reproducing the quality
     ORDERING the reference publishes (uet.ipynb: collisionless 0.797
     / unified 0.790 / hash 0.743 AUC): collisionless ≈ unified,
     both clearly above hash.

The reference implementation is imported from /root/reference and RUN
(TF/tf-keras CPU), not reimplemented.

Usage:
  python tools/reference_parity_ctr.py [--examples 120000] [--epochs 4]
      [--tolerance 0.03] [--out docs/PARITY_HEAD_TO_HEAD.md --append]

Exit code 1 on any failed comparison.
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

DLRM_VOCABS = {"cat_a": 2000, "cat_b": 800, "cat_c": 400}
DLRM_DIM = 16
UET_VOCABS = {"movie": 4000, "user": 1500, "occupation": 50, "zip": 300}
UET_BUCKETS = {"movie": 400, "user": 200, "occupation": 20, "zip": 50}
UET_DIM = 16


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _split(features, label, frac=0.8):
    n = label.shape[0]
    cut = int(n * frac)
    train = {k: v[:cut] for k, v in features.items()}
    test = {k: v[cut:] for k, v in features.items()}
    return (train, label[:cut]), (test, label[cut:])


def make_ctr(args):
    """CTR data with per-id latent weights + a dense signal: learnable
    structure in both the embedding and dense paths (the reference's
    own synthetic recipe, ranking_test.py:62-90, enriched with per-id
    weights so AUC has headroom above chance)."""
    rng = np.random.RandomState(args.seed)
    n = args.examples
    dense = rng.uniform(size=(n, 8)).astype(np.float32)
    ids = {
        name: rng.randint(0, v, n).astype(np.int32)
        for name, v in DLRM_VOCABS.items()
    }
    logit = 2.0 * (dense.mean(axis=1) - 0.5)
    for name, v in DLRM_VOCABS.items():
        w = rng.normal(scale=0.6, size=v).astype(np.float32)
        logit = logit + w[ids[name]]
    label = (rng.uniform(size=n) < _sigmoid(logit)).astype(np.float32)
    return _split({"dense": dense, **ids}, label)


def make_uet(args):
    """Per-id-signal data where hashing into small tables collides
    hard (vocab/bucket ratios 7.5-10x), the regime the unified
    embedding exists for."""
    rng = np.random.RandomState(args.seed + 1)
    n = args.examples
    ids = {
        name: rng.randint(0, v, n).astype(np.int32)
        for name, v in UET_VOCABS.items()
    }
    logit = np.zeros(n, np.float32)
    for name, v in UET_VOCABS.items():
        w = rng.normal(scale=0.7, size=v).astype(np.float32)
        logit = logit + w[ids[name]]
    label = (rng.uniform(size=n) < _sigmoid(logit)).astype(np.float32)
    return _split(ids, label)


# --- Reference (TFRS on TF/Keras CPU) --------------------------------------


def _tf_setup(args):
    import tensorflow as tf

    sys.path.insert(0, "/root/reference")
    tf.random.set_seed(getattr(args, 'model_seed', args.seed))
    return tf


def run_reference_dlrm(train, test, args):
    tf = _tf_setup(args)
    import tensorflow_recommenders as tfrs

    feature_config = {
        name: tf.tpu.experimental.embedding.FeatureConfig(
            table=tf.tpu.experimental.embedding.TableConfig(
                vocabulary_size=v,
                dim=DLRM_DIM,
                combiner="mean",
                initializer=tf.initializers.TruncatedNormal(
                    mean=0.0, stddev=1.0 / np.sqrt(DLRM_DIM)
                ),
                name=f"table_{name}",
            )
        )
        for name, v in DLRM_VOCABS.items()
    }
    optimizer = tf.keras.optimizers.legacy.Adam(args.lr)
    model = tfrs.experimental.models.Ranking(
        embedding_layer=tfrs.experimental.layers.embedding
        .PartialTPUEmbedding(
            feature_config=feature_config,
            optimizer=optimizer,
            size_threshold=500,
        ),
    )
    model.compile(optimizer=optimizer)

    def to_ds(split, shuffle):
        feats, label = split
        d = tf.data.Dataset.from_tensor_slices(
            (
                {
                    "dense_features": feats["dense"],
                    "sparse_features": {
                        name: feats[name].astype(np.int64)
                        for name in DLRM_VOCABS
                    },
                },
                label,
            )
        )
        if shuffle:
            d = d.shuffle(200_000, seed=args.seed)
        return d.batch(args.batch)

    model.fit(to_ds(train, True), epochs=args.epochs, verbose=0)
    metrics = model.evaluate(to_ds(test, False), return_dict=True,
                             verbose=0)
    auc_key = [k for k in metrics if "auc" in k.lower()][0]
    return {"auc": float(metrics[auc_key])}


def run_reference_uet(train, test, args):
    """The uet.ipynb three-way study, verbatim model recipes on integer
    features (Hashing/StringLookup accept ints)."""
    tf = _tf_setup(args)
    import tensorflow_recommenders as tfrs
    from tensorflow_recommenders.layers.feature_multiplexing import (
        unified_embedding,
    )
    from tensorflow_recommenders.layers.embedding import (
        tpu_embedding_layer,
    )

    def network():
        return tf.keras.Sequential([
            tf.keras.layers.Concatenate(axis=-1),
            tf.keras.layers.Dense(128, activation="relu"),
            tf.keras.layers.Dense(64, activation="relu"),
            tf.keras.layers.Dense(1, activation="sigmoid"),
        ])

    def task():
        return tfrs.tasks.Ranking(
            loss=tf.keras.losses.BinaryCrossentropy(
                reduction=tf.keras.losses.Reduction.SUM
            ),
            metrics=[tf.keras.metrics.AUC(name="AUC")],
        )

    class Base(tfrs.Model):
        def compute_loss(self, features, training=False):
            labels = features.pop("label")
            return self.task(labels=labels, predictions=self(features))

    class Collisionless(Base):
        def __init__(self):
            super().__init__()
            self._embs = {
                name: tf.keras.layers.Embedding(v, UET_DIM)
                for name, v in UET_VOCABS.items()
            }
            self._net = network()
            self.task = task()

        def call(self, features):
            return self._net(
                [self._embs[n](features[n]) for n in UET_VOCABS]
            )

    class Hashed(Base):
        def __init__(self):
            super().__init__()
            self._embs = {
                name: tf.keras.Sequential([
                    tf.keras.layers.Hashing(num_bins=b),
                    tf.keras.layers.Embedding(b, UET_DIM),
                ])
                for name, b in UET_BUCKETS.items()
            }
            self._net = network()
            self.task = task()

        def call(self, features):
            return self._net(
                [self._embs[n](features[n]) for n in UET_VOCABS]
            )

    class Unified(Base):
        def __init__(self):
            super().__init__()
            self._net = network()
            self.task = task()

        def compile(self, **kwargs):
            embed_opt = tpu_embedding_layer.translate_keras_optimizer(
                kwargs["optimizer"]
            )
            config = unified_embedding.UnifiedEmbeddingConfig(
                buckets_per_table=sum(UET_BUCKETS.values()),
                dim_per_table=UET_DIM // 2,
                num_tables=2,
                name="unified",
            )
            for name in UET_VOCABS:
                config.add_feature(name, 2)
            self._embedding = unified_embedding.UnifiedEmbedding(
                config, embed_opt
            )
            super().compile(**kwargs)

        def call(self, features):
            return self._net(self._embedding(features))

    def to_ds(split, shuffle):
        feats, label = split
        d = tf.data.Dataset.from_tensor_slices(
            {
                **{n: feats[n].astype(np.int64) for n in UET_VOCABS},
                "label": label,
            }
        )
        if shuffle:
            d = d.shuffle(200_000, seed=args.seed)
        return d.batch(args.batch)

    out = {}
    for name, cls in (
        ("collisionless", Collisionless),
        ("hash", Hashed),
        ("unified", Unified),
    ):
        model = cls()
        model.compile(
            optimizer=tf.keras.optimizers.legacy.Adam(args.uet_lr)
        )
        model.fit(to_ds(train, True), epochs=args.epochs, verbose=0)
        metrics = model.evaluate(
            to_ds(test, False), return_dict=True, verbose=0
        )
        out[name] = float(metrics["AUC"])
    return out


# --- Ours (recommenders_tpu on JAX CPU) -------------------------------------


def run_ours_dlrm(train, test, args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from recommenders_tpu import data as data_lib
    from recommenders_tpu import models as models_lib
    from recommenders_tpu.embedding import config as config_lib
    from recommenders_tpu.models import ranking as ranking_model

    import flax.linen as nn

    from recommenders_tpu.layers import blocks

    feature_configs = tuple(
        config_lib.FeatureConfig(
            table=config_lib.TableConfig(v, DLRM_DIM, name=f"t_{name}"),
            name=name,
        )
        for name, v in DLRM_VOCABS.items()
    )
    # Match the reference's framework defaults so the comparison
    # isolates framework behavior: Keras Dense initializes
    # glorot_uniform (flax: lecun_normal) and legacy-Keras Adam uses
    # epsilon 1e-7 (optax: 1e-8) — same discipline as
    # reference_parity.py's matched embedding init.
    glorot = nn.initializers.glorot_uniform()
    model = ranking_model.Ranking(
        feature_configs=feature_configs, size_threshold=500,
        bottom_stack=lambda: blocks.MLP(
            units=(256, 64, 16), final_activation="relu",
            kernel_init=glorot,
        ),
        top_stack=lambda: blocks.MLP(
            units=(512, 256, 1), final_activation="sigmoid",
            kernel_init=glorot,
        ),
    )
    trainer = models_lib.Trainer(model, optax.adam(args.lr, eps=1e-7))

    def to_batch(split):
        feats, label = split
        return {
            "dense_features": feats["dense"],
            **{n: feats[n] for n in DLRM_VOCABS},
            "clicked": label,
        }

    batches = data_lib.batched(
        to_batch(train), args.batch, shuffle=True,
        seed=getattr(args, 'model_seed', args.seed)
    )
    state = trainer.init(
        jax.random.PRNGKey(getattr(args, 'model_seed', args.seed)),
        next(batches()),
    )
    state, _ = trainer.fit(state, batches, epochs=args.epochs,
                           verbose=False)
    results = trainer.evaluate(
        state,
        data_lib.batched(
            to_batch(test), args.batch, drop_remainder=False
        ),
    )
    return {"auc": float(results["auc"])}


def run_ours_uet(train, test, args):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from recommenders_tpu import data as data_lib
    from recommenders_tpu import metrics as metrics_lib
    from recommenders_tpu import models as models_lib
    from recommenders_tpu import tasks as tasks_lib
    from recommenders_tpu.embedding import unified
    from recommenders_tpu.ops import hashing

    class Base(models_lib.Model):
        kind: str = "collisionless"

        def setup(self):
            if self.kind == "unified":
                config = unified.UnifiedEmbeddingConfig(
                    buckets_per_table=sum(UET_BUCKETS.values()),
                    dim_per_table=UET_DIM // 2,
                    num_tables=2,
                    name="unified",
                )
                for name in UET_VOCABS:
                    config.add_feature(name, 2)
                self.embedding = unified.UnifiedEmbedding(
                    config=config, shard_tables=False
                )
            else:
                self.embs = {
                    name: nn.Embed(
                        UET_BUCKETS[name]
                        if self.kind == "hash" else v,
                        UET_DIM,
                        name=f"emb_{name}",
                    )
                    for name, v in UET_VOCABS.items()
                }
            self.head = nn.Sequential([
                nn.Dense(128), nn.relu, nn.Dense(64), nn.relu,
                nn.Dense(1),
            ])
            self.task = tasks_lib.Ranking()

        def compute_loss(self, batch, training=False):
            if self.kind == "unified":
                parts = self.embedding(
                    {n: batch[n] for n in UET_VOCABS}
                )
            else:
                parts = []
                for i, name in enumerate(UET_VOCABS):
                    ids = batch[name]
                    if self.kind == "hash":
                        ids = hashing.hash_bucket(
                            ids, UET_BUCKETS[name], (i, 0)
                        )
                    parts.append(self.embs[name](ids))
            x = jnp.concatenate(parts, axis=-1)
            pred = jax.nn.sigmoid(self.head(x)[:, 0])
            out = self.task(batch["label"], pred)
            return out.loss, {
                "labels": out.labels, "predictions": out.predictions
            }

        def metrics(self):
            return {"auc": metrics_lib.AUC()}

        def update_metrics(self, states, batch, aux):
            return {
                "auc": metrics_lib.AUC().update(
                    states["auc"], aux["labels"], aux["predictions"]
                )
            }

    def to_batch(split):
        feats, label = split
        return {**feats, "label": label}

    out = {}
    for kind in ("collisionless", "hash", "unified"):
        model = Base(kind=kind)
        trainer = models_lib.Trainer(model, optax.adam(args.uet_lr))
        batches = data_lib.batched(
            to_batch(train), args.batch, shuffle=True,
        seed=getattr(args, 'model_seed', args.seed)
        )
        state = trainer.init(
            jax.random.PRNGKey(getattr(args, 'model_seed', args.seed)),
            next(batches()),
        )
        state, _ = trainer.fit(
            state, batches, epochs=args.epochs, verbose=False
        )
        results = trainer.evaluate(
            state,
            data_lib.batched(
                to_batch(test), args.batch, drop_remainder=False
            ),
        )
        out[kind] = float(results["auc"])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--examples", type=int, default=120_000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--uet-lr", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--tolerance", type=float, default=0.04,
        help="Cross-framework AUC tolerance. Single-seed runs with "
        "framework-native initializers jitter by ~0.01-0.03 at these "
        "scales; the ordering assertions carry the study's conclusion.",
    )
    p.add_argument(
        "--uet-margin", type=float, default=0.02,
        help="Required AUC gap between the (collisionless, unified) "
        "pair and the hash-trick baseline, in each framework.",
    )
    p.add_argument(
        "--seeds", type=int, default=1,
        help="model seeds per framework (same shared data); with > 1 "
        "the table reports mean ± std and tolerances/margins apply to "
        "the MEANS (the reference's uet.ipynb study publishes "
        "across-seed error bars)",
    )
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--append", action="store_true")
    args = p.parse_args()

    dlrm_train, dlrm_test = make_ctr(args)
    uet_train, uet_test = make_uet(args)

    runs = {"ref_dlrm": [], "ours_dlrm": [], "ref_uet": [],
            "ours_uet": []}
    for s in range(args.seeds):
        args.model_seed = args.seed + 1000 * s
        print(f"--- model seed {args.model_seed} ---")
        print("training reference prebuilt DLRM (TF/CPU)...")
        runs["ref_dlrm"].append(
            run_reference_dlrm(dlrm_train, dlrm_test, args)
        )
        print("  ", runs["ref_dlrm"][-1])
        print("training recommenders_tpu prebuilt DLRM (JAX/CPU)...")
        runs["ours_dlrm"].append(
            run_ours_dlrm(dlrm_train, dlrm_test, args)
        )
        print("  ", runs["ours_dlrm"][-1])
        print("reference unified-embedding three-way study (TF/CPU)...")
        runs["ref_uet"].append(
            run_reference_uet(uet_train, uet_test, args)
        )
        print("  ", runs["ref_uet"][-1])
        print("recommenders_tpu unified-embedding three-way study...")
        runs["ours_uet"].append(
            run_ours_uet(uet_train, uet_test, args)
        )
        print("  ", runs["ours_uet"][-1])

    def stats(key, metric):
        vals = np.asarray([r[metric] for r in runs[key]], np.float64)
        return float(vals.mean()), float(vals.std())

    def fmt(mean, std):
        return (
            f"{mean:.4f} ± {std:.4f}" if args.seeds > 1 else f"{mean:.4f}"
        )

    ok = True
    lines = [
        "## Prebuilt DLRM classification (shared synthetic CTR data)",
        "",
        "| metric | reference TFRS | recommenders_tpu | mean diff | ok |",
        "|---|---|---|---|---|",
    ]
    rm, rs = stats("ref_dlrm", "auc")
    om, os_ = stats("ours_dlrm", "auc")
    diff = abs(rm - om)
    good = diff <= args.tolerance
    ok = ok and good
    lines.append(
        f"| DLRM test AUC | {fmt(rm, rs)} | {fmt(om, os_)} | "
        f"{diff:.4f} | {'yes' if good else 'NO'} |"
    )
    lines += [
        "",
        "## Unified-embedding three-way study (uet.ipynb counterpart)",
        "",
        "Same data, heavy hash-collision pressure (vocab/bucket 7.5-10x).",
        "Pass = each framework reproduces the reference's published",
        "ordering (collisionless ≈ unified > hash; uet.ipynb: 0.797 /",
        "0.790 / 0.743).",
        "",
        "| variant | reference TFRS AUC | recommenders_tpu AUC |",
        "|---|---|---|",
    ]
    uet_stats = {
        (fw, name): stats(f"{fw}_uet", name)
        for fw in ("ref", "ours")
        for name in ("collisionless", "unified", "hash")
    }
    for name in ("collisionless", "unified", "hash"):
        lines.append(
            f"| {name} | {fmt(*uet_stats[('ref', name)])} | "
            f"{fmt(*uet_stats[('ours', name)])} |"
        )
    for fw, label in (("ref", "reference"), ("ours", "ours")):
        for better in ("collisionless", "unified"):
            gap = uet_stats[(fw, better)][0] - uet_stats[(fw, "hash")][0]
            good = gap >= args.uet_margin
            ok = ok and good
            lines.append(
                f"| {label}: {better} - hash | {gap:+.4f} | "
                f"{'yes' if good else 'NO'} |"
            )
    # The pair itself must agree across frameworks too.
    for name in ("collisionless", "unified", "hash"):
        diff = abs(
            uet_stats[("ref", name)][0] - uet_stats[("ours", name)][0]
        )
        good = diff <= args.tolerance
        ok = ok and good
        lines.append(
            f"| cross-framework {name} diff | {diff:.4f} | "
            f"{'yes' if good else 'NO'} |"
        )

    table = "\n".join(lines)
    print()
    print(table)
    if args.out:
        mode = "a" if args.append else "w"
        with open(args.out, mode) as f:
            f.write(
                ("\n" if args.append else "")
                + f"Command: `python tools/reference_parity_ctr.py "
                f"--examples {args.examples} --epochs {args.epochs} "
                f"--seeds {args.seeds} --tolerance {args.tolerance}`"
                + (
                    f" — {args.seeds} model seeds per framework on "
                    "shared data; mean ± std; tolerances on the means"
                    "\n\n" if args.seeds > 1 else "\n\n"
                )
                + table + "\n"
            )
        print(f"\nwrote {args.out}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
